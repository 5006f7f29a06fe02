package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** A/B micro-bench for the two shingle constructions (window-lead vs
  * arrays_zip of shifted slices) — decides which form Dedup.shingleRows
  * uses. Run: sbt "runMain graft.tools.ShingleBench"
  *
  * Verdict (sf0.1, local[32], min-of-3): identical shingle sets
  * (symmetric diff 0); window 0.54 s vs zip 0.66 s — the window form
  * wins (the zip form materializes three shifted array copies per row),
  * and the shingle stage is <10% of q28 anyway. Dedup keeps the window
  * form; this tool stays as the harness for re-testing on other data
  * shapes.
  */
object ShingleBench {
  /** The production construction — measured straight from Dedup so the
    * A/B cannot drift from the code it justifies.
    */
  def windowForm(s: SparkSession, d: String): DataFrame =
    graft.operators.Dedup.shingles(graft.Tables.documents(s, d))

  def zipForm(s: SparkSession, d: String): DataFrame = {
    val a = split(col("text"), " ")
    val len = greatest(size(a) - 2, lit(0))
    graft.Tables.documents(s, d)
      .select(col("doc_id"), explode(arrays_zip(
        slice(a, lit(1), len).as("t0"),
        slice(a, lit(2), len).as("t1"),
        slice(a, lit(3), len).as("t2"))).as("s"))
      .select(col("doc_id"),
        concat_ws(" ", col("s.t0"), col("s.t1"), col("s.t2")).as("g"))
      .distinct()
  }

  def main(args: Array[String]): Unit = {
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def time(name: String, f: => DataFrame): Unit = {
      val times = (0 until 3).map { _ =>
        val t0 = System.nanoTime()
        f.write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"[shingle] $name min=${times.min}%.2f all=${times.map(t => f"$t%.2f").mkString(",")}")
    }
    // equality first: identical shingle sets
    val a = windowForm(spark, d)
    val b = zipForm(spark, d)
    val diff = a.exceptAll(b).count() + b.exceptAll(a).count()
    println(s"[shingle] symmetric diff = $diff")
    time("window", windowForm(spark, d))
    time("zip", zipForm(spark, d))
    spark.stop()
  }
}
