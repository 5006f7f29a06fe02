package graft.tools

import org.apache.spark.sql.SparkSession

/** Executes a catalog query and dumps the FINAL adaptive plan — the only
  * place runtime exchange reuse (AQE) is visible. `explain` on the lazy
  * frame shows the pre-execution plan, which over-counts recomputation.
  *
  *   sbt "runMain graft.tools.ExecutedPlanDump q28_dedup_minhash_lsh"
  */
object ExecutedPlanDump {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    args.foreach { name =>
      val df = graft.SparkEntry.queries(name)(spark, sfDir)
      df.collect() // finalize THIS frame's adaptive plan
      println(s"========== $name (executed) ==========")
      println(df.queryExecution.executedPlan.toString)
    }
    spark.stop()
  }
}
