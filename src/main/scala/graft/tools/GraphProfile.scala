package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Phase profiler for the PageRank-family graph rows (guide §1):
  * times the trade-graph build (pairs → edges → deg/withDeg persists)
  * separately from each additional PageRank iteration by running the
  * operator at iterations = 0..3 and differencing. Noop sink, warm
  * passes in one JVM.
  *
  *   sbt "runMain graft.tools.GraphProfile"
  */
object GraphProfile {
  def main(args: Array[String]): Unit = {
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def load(): String =
      scala.util.Try(scala.io.Source.fromFile("/proc/loadavg").mkString
        .split(" ").head).getOrElse("?")
    def pairs(): DataFrame =
      graft.Tables.lineitem(spark, d)
        .join(graft.Tables.orders(spark, d),
          col("l_orderkey") === col("o_orderkey"))
        .select(col("o_custkey").as("c"), col("l_suppkey").as("sk"))
        .distinct()
    def edges(): DataFrame = {
      val p = pairs()
      val fwd = p.select((col("c").cast("long") * 2).as("src"),
        (col("sk").cast("long") * 2 + 1).as("dst"))
      val rev = p.select((col("sk").cast("long") * 2 + 1).as("src"),
        (col("c").cast("long") * 2).as("dst"))
      fwd.unionByName(rev)
    }
    def time(name: String)(f: => DataFrame): Unit = {
      spark.catalog.clearCache()
      val t0 = System.nanoTime()
      f.write.format("noop").mode("overwrite").save()
      println(f"[gprof] $name%-22s ${(System.nanoTime() - t0) / 1e9}%.2f s load ${load()}")
    }
    (0 until 3).foreach { pass =>
      println(s"--- pass $pass ---")
      time("pairs")(pairs())
      time("edges")(edges())
      time("pr-iter0")(graft.operators.Graph.pageRank(edges(), 0))
      time("pr-iter1")(graft.operators.Graph.pageRank(edges(), 1))
      time("pr-iter2")(graft.operators.Graph.pageRank(edges(), 2))
      time("pr-iter3")(graft.operators.Graph.pageRank(edges(), 3))
    }
    spark.stop()
  }
}
