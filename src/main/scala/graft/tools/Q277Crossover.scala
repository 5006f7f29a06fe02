package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Measures the q271-contains vs q277-equi-join crossover in blocklist
  * size k (sf0.1, min of 3 passes per point). The contains form is
  * O(k · |text|) per document; the gram equi-join is O(tokens) per
  * document independent of k. Run:
  *   sbt "runMain graft.tools.Q277Crossover"
  */
object Q277Crossover {
  def main(args: Array[String]): Unit = {
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = graft.Tables.documents(spark, d)
    def block(k: Int) = graft.operators.Dedup.shingles(docs)
      .groupBy(col("g")).agg(count(lit(1)).as("df"))
      .orderBy(col("df").desc, col("g")).limit(k).select(col("g"))
      .localCheckpoint(true) // mining cost excluded — measure matching only
    def containsForm(b: org.apache.spark.sql.DataFrame) =
      docs.select(col("doc_id"), col("text"))
        .join(broadcast(b), col("text").contains(col("g")), "left")
        .groupBy(col("doc_id")).agg(count(col("g")).as("n_hits"))
    def minOf(n: Int)(f: => Unit): Double =
      (1 to n).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }.min
    Seq(5, 30, 100, 1000).foreach { k =>
      val b = block(k)
      val tc = minOf(3)(containsForm(b)
        .write.format("noop").mode("overwrite").save())
      val tj = minOf(3)(graft.operators.Curation.blocklistHitsLarge(docs, b)
        .write.format("noop").mode("overwrite").save())
      println(f"[q277x] k=$k%4d contains=$tc%.2f s equi-join=$tj%.2f s")
    }
    spark.stop()
  }
}
