package graft

import org.apache.spark.sql.SparkSession

/** Plan hygiene checker: prints `explain("formatted")` for selected
  * queries and greps for the properties that must hold at scale —
  * PushedFilters reaching the parquet scan, pruned ReadSchema, broadcast
  * joins on dim tables, TakeOrdered for top-k. Run:
  *
  *   sbt "runMain graft.PlanCheck [queryName ...]"
  */
object PlanCheck {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val spark = SparkSession.builder()
      .master("local[4]")
      .appName("graft-plan-check")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val names = if (args.nonEmpty) args.toSeq
      else Seq("q01_pricing_summary", "q02_filter_revenue", "q03_shipping_priority",
        "q07_broadcast_join", "q08_local_supplier_revenue", "q17_global_topk")
    names.foreach { n =>
      println(s"\n========== $n ==========")
      val plan = SparkEntry.queries(n)(spark, sfDir)
        .queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
      println(plan)
    }
    spark.stop()
  }
}
