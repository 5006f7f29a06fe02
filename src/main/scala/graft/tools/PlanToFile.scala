package graft.tools

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.ExplainMode

/** Dumps `.explain("formatted")` for named catalog queries to
  * `$GRAFT_PLAN_DIR/<query>_$GRAFT_PLAN_TAG.txt` (the round's
  * plans/rNN evidence files), plus the executed adaptive plan below it
  * (the only place AQE exchange reuse / runtime join rewrites show).
  *
  *   GRAFT_PLAN_DIR=plans/r15 GRAFT_PLAN_TAG=before \
  *     sbt "runMain graft.tools.PlanToFile q290_containment_prefix"
  */
object PlanToFile {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val dir = sys.env.getOrElse("GRAFT_PLAN_DIR", "plans/r15")
    val tag = sys.env.getOrElse("GRAFT_PLAN_TAG", "before")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    Files.createDirectories(Paths.get(dir))
    args.foreach { name =>
      val df = graft.SparkEntry.queries(name)(spark, sfDir)
      val formatted = df.queryExecution.explainString(
        ExplainMode.fromString("formatted"))
      df.write.format("noop").mode("overwrite").save()
      val executed = df.queryExecution.executedPlan.toString
      Files.writeString(Paths.get(s"$dir/${name}_$tag.txt"),
        s"== explain(formatted) ==\n$formatted\n" +
          s"== executed (final adaptive) plan ==\n$executed\n")
      println(s"[plan] wrote $dir/${name}_$tag.txt")
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
