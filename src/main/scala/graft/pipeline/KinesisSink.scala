package graft.pipeline

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.streaming.{DataStreamWriter, StreamingQuery, Trigger}
import org.apache.spark.util.LongAccumulator

/** Kinesis-shaped sink built on `foreachBatch`/`foreachPartition`:
  * each partition task runs its own [[BatchProducer]] (K1–K7 semantics)
  * against a client built by the injectable `clientFactory` — the test
  * seam the reference keeps via `logProducer` (main.go:349-369).
  *
  * Scale design: the sink is embarrassingly parallel across partitions
  * (the reference's single-sender TODO batchproducer.go:283, solved by
  * executor parallelism). `repartitionByKey` optionally co-locates a
  * partition key's records into one task — same best-effort per-key
  * affinity Kinesis gives via MD5(key)→shard. Delivery is at-least-once
  * under task retry, the same class of semantics as the reference's
  * requeue-at-back; the streaming path upgrades source-side tracking to
  * exactly-once via checkpointing (SURVEY.md §3.3).
  *
  * Stats (A1/A3) surface through Spark accumulators → visible in the UI
  * and pollable by a StreamingQueryListener, standing in for the
  * reference's Prometheus counters (firehose_to_kinesis_*).
  */
object KinesisSink {

  final case class SinkMetrics(
      sent: LongAccumulator,
      dropped: LongAccumulator,
      requestErrors: LongAccumulator)

  def newMetrics(spark: SparkSession, prefix: String = "firehose_to_kinesis"): SinkMetrics =
    SinkMetrics(
      spark.sparkContext.longAccumulator(s"${prefix}_sent_count"),
      spark.sparkContext.longAccumulator(s"${prefix}_dropped_count"),
      spark.sparkContext.longAccumulator(s"${prefix}_errors_count"))

  /** Write one (batch) DataFrame of (data BINARY, partition_key STRING). */
  def writeBatch(
      df: Dataset[(Array[Byte], String)],
      clientFactory: () => KinesisClient,
      config: ProducerConfig = ProducerConfig(),
      metrics: Option[SinkMetrics] = None,
      repartitionByKey: Boolean = false): Unit = {
    val frame: DataFrame =
      if (repartitionByKey) df.repartition(col("_2")).toDF() else df.toDF()
    frame.foreachPartition { (it: Iterator[org.apache.spark.sql.Row]) =>
      val producer = new BatchProducer(clientFactory(), config)
      it.foreach(r => producer.add(r.getAs[Array[Byte]](0), r.getString(1)))
      // Bounded drain: undelivered records fail the task → Spark retry
      // replays the partition (at-least-once), instead of hanging forever
      // on a persistently failing client.
      val left = producer.flush(config.flushTimeoutMillis)
      if (left > 0)
        throw new java.io.IOException(
          s"KinesisSink: $left records undelivered after " +
            s"${config.flushTimeoutMillis} ms flush; failing task for retry")
      val s = producer.stats
      metrics.foreach { m =>
        m.sent.add(s.sent)
        m.dropped.add(s.droppedRecords)
        m.requestErrors.add(s.requestErrors)
      }
    }
  }

  /** Streaming writer: micro-batch trigger = the reference's 5s
    * FlushInterval (K2's time arm); within a micro-batch, BatchProducer
    * applies the 500-record size arm.
    */
  def writeStream(
      serialized: DataFrame,
      clientFactory: () => KinesisClient,
      checkpointDir: String,
      config: ProducerConfig = ProducerConfig(),
      metrics: Option[SinkMetrics] = None,
      triggerInterval: String = "5 seconds"): DataStreamWriter[org.apache.spark.sql.Row] =
    serialized.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.ProcessingTime(triggerInterval))
      .foreachBatch { (batchDf: DataFrame, _: Long) =>
        implicit val s: SparkSession = batchDf.sparkSession
        import s.implicits._
        writeBatch(
          batchDf.select(col("data"), col("partition_key"))
            .as[(Array[Byte], String)],
          clientFactory, config, metrics)
      }
}
