package graft.tools
import org.apache.spark.sql.SparkSession
object NewPlanAudit {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = "/root/testdata/sf0.001"
    val targets = if (args.nonEmpty) args.toSeq else
      Seq("q83_block_dedup", "q84_corpus_divergence", "q86_perplexity_score",
        "q87_ngram_novelty", "q88_source_overlap", "q91_conversion_funnel",
        "q92_table_profile", "q93_cdc_merge")
    targets.foreach { q =>
      val df = graft.SparkEntry.queries(q)(spark, d)
      df.write.format("noop").mode("overwrite").save()
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
