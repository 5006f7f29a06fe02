package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}

/** Warm-min triage probe for over-pin letter rows (the q109 playbook,
  * generalized): runs each named query for N warm passes in ONE JVM —
  * the bench's min-measures-the-code convention — printing per-pass
  * wall, job count, and host load, then the min/median. Pass 0 pays
  * any memoized build (the bench's setup ledger); the warm min is the
  * number comparable to the pin. Run:
  *   java -cp <classes:spark jars> graft.tools.QTriage q94_... q144_...
  * env: GRAFT_TRIAGE_PASSES (default 6), SPARK_GRAFT_SF_DIR.
  */
object QTriage {
  def main(args: Array[String]): Unit = {
    val passes = sys.env.getOrElse("GRAFT_TRIAGE_PASSES", "6").toInt
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val starts = scala.collection.concurrent.TrieMap.empty[Int, Long]
    val jobs = scala.collection.mutable.ArrayBuffer.empty[(Int, Double)]
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit =
        starts(js.jobId) = js.time
      override def onJobEnd(je: SparkListenerJobEnd): Unit = jobs.synchronized {
        jobs += ((je.jobId, (je.time - starts.getOrElse(je.jobId, je.time)) / 1e3))
      }
    })
    def load(): String =
      scala.util.Try(scala.io.Source.fromFile("/proc/loadavg").mkString
        .split(" ").head).getOrElse("?")
    args.foreach { q =>
      val walls = (0 until passes).map { pass =>
        spark.catalog.clearCache()
        jobs.synchronized(jobs.clear())
        val l = load()
        val t0 = System.nanoTime()
        graft.SparkEntry.queries(q)(spark, d)
          .write.format("noop").mode("overwrite").save()
        val sec = (System.nanoTime() - t0) / 1e9
        Thread.sleep(150) // let listener events drain
        val nj = jobs.synchronized(jobs.size)
        println(f"[triage] $q pass $pass wall $sec%.3f s jobs $nj load $l")
        sec
      }
      // pass 0 may carry a memoized build; with a single pass it is
      // all we have
      val warm = if (walls.size > 1) walls.drop(1) else walls
      val sorted = warm.sorted
      println(f"[triage] $q WARM-MIN ${sorted.head}%.3f s " +
        f"median ${sorted(sorted.size / 2)}%.3f s (over ${warm.size} warm passes)")
    }
    spark.stop()
  }
}
