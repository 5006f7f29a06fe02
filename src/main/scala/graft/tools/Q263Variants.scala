package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.storage.StorageLevel

/** Scratch A/B: q263 stage costs and persist strategies. */
object Q263Variants {
  def main(args: Array[String]): Unit = {
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val l = 20
    def docs = graft.Tables.documents(spark, d)
    def grams0 = docs
      .filter(length(col("text")) >= l)
      .select(col("doc_id"),
        explode(sequence(lit(0), length(col("text")) - l)).as("p"),
        col("text"))
      .select(col("doc_id"), col("p"),
        expr(s"substring(text, p + 1, $l)").as("gram"))
    def time(name: String)(mk: => DataFrame): Unit = {
      val ts = (0 until 3).map { _ =>
        spark.catalog.clearCache()
        val t0 = System.nanoTime()
        mk.write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"[q263] $name min=${ts.min}%.2f all=${ts.map(t => f"$t%.2f").mkString(",")}")
    }
    time("grams only")(grams0)
    time("dup agg only")(grams0.groupBy(col("gram"))
      .agg(count_distinct(col("doc_id")).as("nd")).filter(col("nd") >= 2))
    time("marked join")(grams0.join(
      grams0.groupBy(col("gram")).agg(count_distinct(col("doc_id")).as("nd"))
        .filter(col("nd") >= 2).select(col("gram")), "gram")
      .select(col("doc_id"), col("p")))
    time("full current")(graft.operators.Dedup.exactSubstrRemoval(docs, l))
    // persist variant
    time("full persist-grams") {
      val g = grams0.persist(StorageLevel.MEMORY_AND_DISK)
      val dup = g.groupBy(col("gram"))
        .agg(count_distinct(col("doc_id")).as("nd"))
        .filter(col("nd") >= 2).select(col("gram"))
      val w = Window.partitionBy(col("doc_id")).orderBy(col("p"))
      val spans = g.join(dup, "gram")
        .select(col("doc_id"), col("p"))
        .repartition(32, col("doc_id"))
        .withColumn("brk",
          when(col("p") - coalesce(lag(col("p"), 1).over(w),
            lit(Long.MinValue / 2)) >= l, lit(1L)).otherwise(lit(0L)))
        .withColumn("isl",
          sum(col("brk")).over(w.rowsBetween(Window.unboundedPreceding, 0)))
        .groupBy(col("doc_id"), col("isl"))
        .agg((max(col("p")) + l - min(col("p"))).as("chars"))
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_spans"), sum(col("chars")).as("dup_chars"))
      docs.select(col("doc_id"), length(col("text")).cast("long").as("n_chars"))
        .join(spans, Seq("doc_id"), "left")
        .select(col("doc_id"), col("n_chars"),
          coalesce(col("n_spans"), lit(0L)).as("n_spans"),
          coalesce(col("dup_chars"), lit(0L)).as("dup_chars"),
          (col("n_chars") - coalesce(col("dup_chars"), lit(0L))).as("keep_chars"))
        .orderBy(col("doc_id"))
    }
    def islands(marked: DataFrame): DataFrame = {
      val w = Window.partitionBy(col("doc_id")).orderBy(col("p"))
      val spans = marked
        .repartition(32, col("doc_id"))
        .withColumn("brk",
          when(col("p") - coalesce(lag(col("p"), 1).over(w),
            lit(Long.MinValue / 2)) >= l, lit(1L)).otherwise(lit(0L)))
        .withColumn("isl",
          sum(col("brk")).over(w.rowsBetween(Window.unboundedPreceding, 0)))
        .groupBy(col("doc_id"), col("isl"))
        .agg((max(col("p")) + l - min(col("p"))).as("chars"))
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_spans"), sum(col("chars")).as("dup_chars"))
      docs.select(col("doc_id"), length(col("text")).cast("long").as("n_chars"))
        .join(spans, Seq("doc_id"), "left")
        .select(col("doc_id"), col("n_chars"),
          coalesce(col("n_spans"), lit(0L)).as("n_spans"),
          coalesce(col("dup_chars"), lit(0L)).as("dup_chars"),
          (col("n_chars") - coalesce(col("dup_chars"), lit(0L))).as("keep_chars"))
        .orderBy(col("doc_id"))
    }
    time("minmax agg only")(grams0.groupBy(col("gram"))
      .agg(min(col("doc_id")).as("mn"), max(col("doc_id")).as("mx"))
      .filter(col("mn") =!= col("mx")))
    time("full persist+minmax") {
      val g = grams0.persist(StorageLevel.MEMORY_AND_DISK)
      val dup = g.groupBy(col("gram"))
        .agg(min(col("doc_id")).as("mn"), max(col("doc_id")).as("mx"))
        .filter(col("mn") =!= col("mx")).select(col("gram"))
      islands(g.join(dup, "gram").select(col("doc_id"), col("p")))
    }
    time("full window-minmax") {
      val wg = Window.partitionBy(col("gram"))
      islands(grams0
        .withColumn("mn", min(col("doc_id")).over(wg))
        .withColumn("mx", max(col("doc_id")).over(wg))
        .filter(col("mn") =!= col("mx"))
        .select(col("doc_id"), col("p")))
    }
    spark.stop()
  }
}
