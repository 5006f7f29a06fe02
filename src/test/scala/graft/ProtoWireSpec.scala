package graft

import graft.functions.ProtoWire
import graft.model._
import org.scalatest.funsuite.AnyFunSuite

class ProtoWireSpec extends AnyFunSuite {

  private def hex(b: Array[Byte]): String = b.map("%02x".format(_)).mkString

  test("golden wire bytes for the reference's produced envelope shape") {
    // Envelope{origin="o", eventType=LogMessage(5),
    //   logMessage{message="hi\n", OUT(1), ts=1, source_type="bosh",
    //              source_instance="/f"}}
    // field numbers: envelope.pb.go:100-112, log.pb.go:58-63
    val env = Envelope.forLogLine("o", "hi\n".getBytes, 1L, "/f")
    val expected =
      "0a016f" +          // f1 origin "o"
        "1005" +          // f2 eventType = 5
        "4213" +          // f8 logMessage, len 19
        "0a03" + "68690a" + // lm f1 message "hi\n"
        "1001" +          // lm f2 message_type OUT
        "1801" +          // lm f3 timestamp 1
        "2a04" + "626f7368" + // lm f5 source_type "bosh"
        "3202" + "2f66"   // lm f6 source_instance "/f"
    assert(hex(ProtoWire.encode(env)) === expected)
  }

  test("negative and large varints round-trip") {
    val e = Envelope.forLogLine("x", Array[Byte](0), -1L, "p")
    val back = ProtoWire.decode(ProtoWire.encode(e))
    assert(back.logMessage.get.timestamp === -1L)
    val e2 = Envelope.forLogLine("x", Array[Byte](0), Long.MaxValue, "p")
    assert(ProtoWire.decode(ProtoWire.encode(e2)).logMessage.get.timestamp === Long.MaxValue)
  }

  test("full envelope with all payload types round-trips") {
    val env = Envelope(
      origin = "org", eventType = "ValueMetric", timestamp = Some(42L),
      deployment = Some("dep"), job = Some("j"), index = Some("0"),
      ip = Some("10.0.0.1"), tags = Map("a" -> "1", "b" -> "2"),
      logMessage = None,
      valueMetric = Some(ValueMetric("m", 1.5, "ms")),
      counterEvent = Some(CounterEvent("c", 3L, Some(9L))),
      error = Some(ErrorEvent("s", -7, "boom")),
      containerMetric = Some(ContainerMetric("app", 2, 0.5, 100L, 200L, Some(1L), None)))
    assert(ProtoWire.decode(ProtoWire.encode(env)) === env)
  }

  test("property: arbitrary log lines round-trip byte-exactly (seeded fuzz)") {
    val rnd = new scala.util.Random(42)
    (0 until 500).foreach { _ =>
      val line = new Array[Byte](rnd.nextInt(2000))
      rnd.nextBytes(line)
      val ts = rnd.nextLong()
      val path = rnd.alphanumeric.take(rnd.nextInt(64)).mkString
      val env = Envelope.forLogLine("origin", line, ts, path)
      val back = ProtoWire.decode(ProtoWire.encode(env))
      assert(java.util.Arrays.equals(back.logMessage.get.message, line))
      assert(back.logMessage.get.timestamp === ts)
      assert(back.logMessage.get.source_instance === path)
      assert(back.copy(logMessage = None) === env.copy(logMessage = None))
    }
  }

  test("unknown fields are skipped, known fields still decode") {
    val base = ProtoWire.encode(Envelope.forLogLine("o", "x".getBytes, 5L, "/p"))
    // envelope leaves field numbers 3-5 unused: append an unknown varint
    // field 3 (tag 0x18) and an unknown length-delimited field 4 (tag 0x22)
    val withUnknown = base ++
      Array[Byte](0x18, 0x07) ++
      Array[Byte](0x22, 0x02, 0x01, 0x02) ++
      // multi-byte tag: field 300 wt 0 → tag 2400 → varint e0 12, value 1
      Array[Byte](0xe0.toByte, 0x12, 0x01)
    val back = ProtoWire.decode(withUnknown)
    assert(back.origin === "o")
    assert(back.logMessage.get.timestamp === 5L)
  }
}
