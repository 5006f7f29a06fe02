package graft.examples

import java.nio.file.{Files, StandardOpenOption}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import graft.pipeline._
import graft.functions.ProtoWire

/** End-to-end demo of the reference pipeline re-expressed on Spark: the
  * graft-tail DSv2 source follows growing log files, the envelope
  * projection + ProtoWire serialization run as streaming transforms, and
  * the Kinesis-shaped sink applies the K1–K7 producer semantics against
  * an injectable (here: fake) client. Run:
  *
  *   sbt "runMain graft.examples.TailPipelineDemo"
  */
object TailPipelineDemo {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .appName("graft-tail-demo")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.streaming.checkpoint.fileChecksum.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val watchRoot = Files.createTempDirectory("demo-logs")
    Files.createDirectories(watchRoot.resolve("svc"))
    val f1 = watchRoot.resolve("svc/app.log")
    Files.writeString(f1, "boot: engine up\nboot: sources registered\n")

    val metrics = KinesisSink.newMetrics(spark)
    val lines = spark.readStream.format("graft-tail")
      .option("path", watchRoot.toString)
      .option("glob", "*.log")
      .load()

    // P2/P3/P4 as streaming transforms (path column stands in for
    // input_file_name, which custom sources don't populate)
    val projected = lines.select(
      lit("demo-node").as("origin"),
      concat(col("value"), lit("\n")).cast("binary").as("message"),
      (unix_micros(current_timestamp()) * 1000).as("ingest_ns"),
      col("path").as("source_instance"))
    val serialized = projected.as[(String, Array[Byte], Long, String)]
      .map { case (origin, message, ns, path) =>
        val env = graft.model.Envelope.forLogLine(origin, message, ns, path)
        (ProtoWire.encode(env), path)
      }.toDF("data", "partition_key")

    val query = KinesisSink.writeStream(
      serialized,
      clientFactory = () => new FakeKinesisClient(),
      checkpointDir = Files.createTempDirectory("demo-ckpt").toString,
      metrics = Some(metrics),
      triggerInterval = "1 second").start()

    query.processAllAvailable()
    println(s"[demo] after batch 1: sent=${metrics.sent.value} dropped=${metrics.dropped.value}")

    // grow the file + add a late file: the tail source must pick both up
    Files.writeString(f1, "req: GET /healthz 200\n", StandardOpenOption.APPEND)
    Files.writeString(watchRoot.resolve("svc/late.log"), "late file line\n")
    query.processAllAvailable()
    println(s"[demo] after growth: sent=${metrics.sent.value} dropped=${metrics.dropped.value}")

    query.stop()
    val ok = metrics.sent.value == 4 && metrics.dropped.value == 0
    println(s"[demo] RESULT: ${if (ok) "OK" else "MISMATCH"} (expected 4 sent)")
    spark.stop()
    if (!ok) sys.exit(1)
  }
}
