package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins [[Tables.events]]' two-encoding contract: the TIMESTAMP(MICROS)
  * / TIMESTAMP_NTZ generation must yield the SAME epoch values as the
  * TIMESTAMP(NANOS) generation, independent of the session time zone —
  * the NTZ wall clock is UTC by data contract, and a session-zone CAST
  * would silently shift every derived epoch on any non-UTC session.
  */
class TablesSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("events NTZ/micros path derives session-zone-independent epochs") {
    val s = spark
    import s.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-ntz-ev").toString
    val wall = "2024-03-01 10:30:00.123456"
    Seq((1L, 7L, "click", 1.5))
      .toDF("event_id", "user_id", "event_type", "value")
      .withColumn("ts", expr(s"TIMESTAMP_NTZ '$wall'"))
      .withColumn("props", map(lit("k"), lit("v")))
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val inst = java.time.Instant.parse("2024-03-01T10:30:00.123456Z")
    val expectedNs = inst.getEpochSecond * 1000000000L + inst.getNano
    def readNs(): Long =
      Tables.events(s, dir).select(col("ts_ns")).head().getLong(0)
    val prev = s.conf.get("spark.sql.session.timeZone")
    try {
      s.conf.set("spark.sql.session.timeZone", "America/New_York")
      assert(readNs() === expectedNs,
        "NTZ epoch must not shift with the session zone")
    } finally s.conf.set("spark.sql.session.timeZone", prev)
    assert(readNs() === expectedNs)
    // the rebuilt ts column is a true instant equal to the micros
    val tsMicros = Tables.events(s, dir)
      .select(unix_micros(col("ts"))).head().getLong(0)
    assert(tsMicros === expectedNs / 1000L)
    graft.operators.Exact.rmTree(java.nio.file.Paths.get(dir))
  }
}
