package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val (sfDir, outDir) = (args(0), args(1))
    val only = args.drop(2).toSet // optional query-name filter for iteration
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    var dumped, failed = 0
    SparkEntry.queries
      .filter { case (name, _) => only.isEmpty || only(name) }
      .foreach { case (name, fn) =>
      try {
        fn(spark, sfDir).coalesce(1).write.mode("overwrite")
          .parquet(s"$outDir/$name")
        dumped += 1
      } catch { case e: Throwable =>
        failed += 1
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
      }
      spark.catalog.clearCache() // release per-query persist()ed frames
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    // One escaper for the whole repo (MiniJson.quote), not a local copy
    // that could drift from the wire-facing one.
    def q(s: String): String = graft.pipeline.MiniJson.quote(s)
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    // Catalog-size guard: a QueryDef silently dropped from a family's
    // `defs` list (the one failure mode the per-query oracle can't see —
    // an absent query is absent from the compare too) shows up here as
    // declared ≠ dumped. `declared` counts the whole catalog even under
    // an `only` filter; the run line records how much of it this
    // invocation actually exercised.
    val declared = SparkEntry.allDefs.size
    val oracles = SparkEntry.oracleSql.size
    val dupNames = SparkEntry.allDefs.groupBy(_.name).filter(_._2.size > 1).keys
    if (dupNames.nonEmpty)
      System.err.println(s"[verify] DUPLICATE query names (Map silently keeps one): ${dupNames.mkString(",")}")
    println(s"[verify] declared=$declared oracle_sql=$oracles rows_only=${declared - oracles} " +
      s"dumped=$dumped failed=$failed" +
      (if (only.nonEmpty) s" (filtered to ${only.size})" else ""))
    if (only.isEmpty && (failed > 0 || dumped != declared))
      System.err.println(s"[verify] GUARD: expected $declared dumps, got $dumped ok + $failed failed")
    spark.stop()
  }
}
