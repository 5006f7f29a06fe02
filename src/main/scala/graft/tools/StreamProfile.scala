package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.StreamingQueryListener

/** Phase profiler for the streaming catalog rows (guide §1): runs a
  * named query twice and prints, from the StreamingQueryListener, each
  * micro-batch's durationMs breakdown (triggerExecution, queryPlanning,
  * getBatch, addBatch, walCommit, stateStore commit) — so the harness
  * overhead (planning, WAL, state commit) is separated from the actual
  * operator compute before anything is "optimized".
  *
  *   sbt "runMain graft.tools.StreamProfile q252_streaming_join_then_agg"
  */
object StreamProfile {
  def main(args: Array[String]): Unit = {
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.streaming.stateStore.maintenanceInterval", "3600s")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.streams.addListener(new StreamingQueryListener {
      override def onQueryStarted(
          e: StreamingQueryListener.QueryStartedEvent): Unit =
        println(s"[sprof] started ${e.name}")
      override def onQueryProgress(
          e: StreamingQueryListener.QueryProgressEvent): Unit = {
        val p = e.progress
        val dm = p.durationMs
        def g(k: String): Long =
          Option(dm.get(k)).map(_.longValue).getOrElse(-1L)
        println(s"[sprof] batch ${p.batchId} rows=${p.numInputRows} " +
          s"trigger=${g("triggerExecution")} plan=${g("queryPlanning")} " +
          s"getBatch=${g("getBatch")} addBatch=${g("addBatch")} " +
          s"wal=${g("walCommit")} offset=${g("latestOffset")} " +
          s"commit=${g("commitOffsets")}")
        p.stateOperators.foreach { so =>
          println(s"[sprof]   state op=${so.operatorName} " +
            s"rowsUpd=${so.numRowsUpdated} commitMs=${so.allUpdatesTimeMs}/" +
            s"${so.allRemovalsTimeMs}/${so.commitTimeMs} mem=${so.memoryUsedBytes}")
        }
      }
      override def onQueryTerminated(
          e: StreamingQueryListener.QueryTerminatedEvent): Unit = ()
    })
    args.foreach { q =>
      (0 until 2).foreach { pass =>
        spark.catalog.clearCache()
        val t0 = System.nanoTime()
        graft.SparkEntry.queries(q)(spark, d)
          .write.format("noop").mode("overwrite").save()
        println(f"[sprof] pass $pass $q TOTAL ${(System.nanoTime() - t0) / 1e9}%.2f s")
        Thread.sleep(300)
      }
    }
    spark.stop()
  }
}
