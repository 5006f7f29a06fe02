package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}

/** Job-level breakdown for q109 (A/B chi-square) — the only query >2x
  * its pin in BOTH the r11 and r12 driver benches (0.42/0.44 vs 0.19),
  * the documented level-shift signature. VERDICT r12 suspects one extra
  * fixed-latency job on the serving path (the q175 precedent). Run:
  *   sbt "runMain graft.tools.Q109Profile"
  * prints per-pass wall time, job count, and per-job durations.
  */
object Q109Profile {
  def main(args: Array[String]): Unit = {
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
    (0 until 5).foreach { pass =>
      spark.catalog.clearCache()
      jobs.synchronized(jobs.clear())
      val t0 = System.nanoTime()
      graft.SparkEntry.queries("q109_ab_chi_square")(spark, d)
        .write.format("noop").mode("overwrite").save()
      val sec = (System.nanoTime() - t0) / 1e9
      Thread.sleep(200) // let listener events drain
      val js = jobs.synchronized(jobs.toList).sortBy(_._1)
      println(f"[q109prof] pass $pass wall $sec%.3f s jobs ${js.size} " +
        js.map { case (id, s) => f"j$id=$s%.3fs" }.mkString(" "))
    }
    spark.stop()
  }
}
