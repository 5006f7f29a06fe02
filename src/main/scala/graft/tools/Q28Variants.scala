package graft.tools

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.storage.StorageLevel

/** Scratch A/B: q28 persist strategies. Uses the PRODUCTION shingle
  * construction (Dedup.shingles) so the measurement cannot drift from
  * the code it justifies.
  */
object Q28Variants {
  private def shingleRows(s: SparkSession, d: String): DataFrame =
    graft.operators.Dedup.shingles(graft.Tables.documents(s, d))

  def q28(s: SparkSession, d: String, persistTri: Boolean, persistBanded: Boolean): DataFrame = {
    val P = 2147483647L
    val nPerm = 64
    val bands = 32
    val r = nPerm / bands
    val rnd = new scala.util.Random(7)
    val aCoefs = Seq.fill(nPerm)(1L + rnd.nextLong(P - 1))
    val bCoefs = Seq.fill(nPerm)(rnd.nextLong(P))
    val tri0 = shingleRows(s, d)
    val tri = if (persistTri) tri0.persist(StorageLevel.MEMORY_AND_DISK) else tri0
    val hashed = tri.select(col("doc_id"), pmod(xxhash64(col("g")), lit(P)).as("h"))
    val minCols = (0 until nPerm).map(i =>
      min(pmod(lit(aCoefs(i)) * col("h") + lit(bCoefs(i)), lit(P))).as(s"m$i"))
    val sig = hashed.groupBy(col("doc_id"))
      .agg(minCols.head, minCols.tail: _*)
      .select(col("doc_id"),
        array((0 until nPerm).map(i => col(s"m$i")): _*).as("sig"))
    val banded0 = sig.select(col("doc_id"),
        posexplode(array((0 until bands).map(j =>
          xxhash64(slice(col("sig"), j * r + 1, r))): _*)))
      .withColumnRenamed("pos", "band").withColumnRenamed("col", "bsig")
    val banded = if (persistBanded) banded0.persist(StorageLevel.MEMORY_AND_DISK) else banded0
    val cand = banded.as("x").join(banded.as("y"),
        col("x.band") === col("y.band") && col("x.bsig") === col("y.bsig") &&
          col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"))
      .distinct()
    val sizes = tri.groupBy(col("doc_id")).agg(count(lit(1)).as("n"))
    val inter = cand
      .join(tri.select(col("doc_id").as("doc_a"), col("g")), "doc_a")
      .join(tri.select(col("doc_id").as("doc_b"), col("g").as("g2")), "doc_b")
      .filter(col("g") === col("g2"))
      .groupBy(col("doc_a"), col("doc_b")).agg(count(lit(1)).as("inter"))
    inter
      .join(sizes.select(col("doc_id").as("doc_a"), col("n").as("na")), "doc_a")
      .join(sizes.select(col("doc_id").as("doc_b"), col("n").as("nb")), "doc_b")
      .select(col("doc_a"), col("doc_b"),
        (col("inter").cast("double") / (col("na") + col("nb") - col("inter"))).as("jac"))
      .filter(col("jac") >= 0.5)
      .orderBy(col("doc_a"), col("doc_b"))
  }

  def main(args: Array[String]): Unit = {
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def time(name: String, persistTri: Boolean, persistBanded: Boolean): Unit = {
      val times = (0 until 3).map { _ =>
        spark.catalog.clearCache()
        val t0 = System.nanoTime()
        q28(spark, d, persistTri, persistBanded)
          .write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"[q28] $name min=${times.min}%.2f all=${times.map(t => f"$t%.2f").mkString(",")}")
    }
    time("tri+banded (current)", persistTri = true, persistBanded = true)
    time("tri only", persistTri = true, persistBanded = false)
    time("none (AQE reuse)", persistTri = false, persistBanded = false)
    spark.stop()
  }
}
