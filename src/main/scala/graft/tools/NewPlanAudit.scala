package graft.tools
import org.apache.spark.sql.SparkSession
object NewPlanAudit {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = "/root/testdata/sf0.001"
    Seq("q59_tfidf_terms", "q60_temperature_mix", "q61_winnow_fingerprint",
        "q64_repetition_stats", "q66_sequence_pack").foreach { q =>
      val df = graft.SparkEntry.queries(q)(spark, d)
      val plan = df.queryExecution.executedPlan.toString
      val schemas = "ReadSchema: [^\n]*".r.findAllIn(plan).toSeq.distinct
      val joins = "(BroadcastHashJoin|SortMergeJoin|BroadcastNestedLoop|Cartesian)\\w*".r.findAllIn(plan).toSeq
        .groupBy(identity).map { case (k, v) => s"$k x${v.size}" }
      println(s"== $q")
      schemas.foreach(s => println(s"   $s"))
      println(s"   joins: ${joins.mkString(", ")}")
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
