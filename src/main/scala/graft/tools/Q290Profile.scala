package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Stage-level attribution for q290 (containmentPairsPrefix): times each
  * sub-frame of the pipeline with a noop sink so the expensive stage is
  * measured, not guessed (guide §1). Run:
  *   sbt "runMain graft.tools.Q290Profile"
  */
object Q290Profile {
  def main(args: Array[String]): Unit = {
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val minPpm = 500000L

    def time(name: String)(f: => DataFrame): DataFrame = {
      val t0 = System.nanoTime()
      val df = f
      df.write.format("noop").mode("overwrite").save()
      println(f"[q290prof] $name%-28s ${(System.nanoTime() - t0) / 1e9}%.2f s")
      df
    }

    (0 until 2).foreach { pass =>
      println(s"--- pass $pass ---")
      spark.catalog.clearCache()
      val docs = graft.Tables.documents(spark, d)
      val sh = graft.operators.Dedup.shingles(docs)
        .persist(StorageLevel.MEMORY_AND_DISK)
      time("shingles(persist)") { sh }
      val sizes = sh.groupBy(col("doc_id")).agg(count(lit(1)).as("sz"))
      val dfr = sh.groupBy(col("g")).agg(count(lit(1)).as("df"))
      val wDoc = Window.partitionBy(col("doc_id")).orderBy(col("df"), col("g"))
      val ranked = sh.join(dfr, Seq("g"))
        .withColumn("pos", row_number().over(wDoc))
        .join(sizes, Seq("doc_id"))
        .select(col("doc_id"), col("g"), col("pos"), col("sz"))
        .persist(StorageLevel.MEMORY_AND_DISK)
      time("ranked(persist)") { ranked }
      val probe = ranked
        .filter(col("pos") <=
          expr(s"sz - ((sz * $minPpm + 999999L) div 1000000L) + 1L"))
        .select(col("doc_id").as("doc_a"), col("g"), col("sz").as("sz_a"))
      val cand = probe
        .join(ranked.select(col("doc_id").as("doc_b"), col("g"),
          col("pos").as("pos_b"), col("sz").as("sz_b")), Seq("g"))
        .filter(col("doc_a") =!= col("doc_b"))
        .filter(col("pos_b") <=
          col("sz_b") - expr(s"(sz_a * $minPpm + 999999L) div 1000000L") + lit(1L))
        .select(col("doc_a"), col("doc_b"))
        .distinct()
        .persist(StorageLevel.MEMORY_AND_DISK)
      time("cand(persist)") { cand }
      println(s"[q290prof] cand rows = ${cand.count()}")
      val verify = cand
        .join(sh.select(col("doc_id").as("doc_a"), col("g")), Seq("doc_a"))
        .join(sh.select(col("doc_id").as("doc_b"), col("g")), Seq("doc_b", "g"))
        .groupBy(col("doc_a"), col("doc_b"))
        .agg(count(lit(1)).as("inter"))
        .join(sizes.select(col("doc_id").as("doc_a"), col("sz").as("size_a")),
          Seq("doc_a"))
        .withColumn("containment_ppm", expr("inter * 1000000 div size_a"))
        .filter(col("containment_ppm") >= minPpm)
      time("verify") { verify }
      spark.catalog.clearCache()
      time("FULL q290") {
        graft.SparkEntry.queries("q290_containment_prefix")(spark, d)
      }
    }
    spark.stop()
  }
}
