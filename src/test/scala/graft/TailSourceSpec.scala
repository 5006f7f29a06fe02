package graft

import java.nio.file.{Files, Path, StandardOpenOption}
import org.scalatest.funsuite.AnyFunSuite
import graft.sources.TailOffset

/** The tail-follow DSv2 source: growing files, partial lines held until
  * terminated, rotation/truncation reset, recursive basename glob, late
  * file creation (--retry semantics).
  */
class TailSourceSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def startTail(root: Path, glob: String = "*.log") = {
    val ckpt = Files.createTempDirectory("graft-tail-ckpt").toString
    val q = spark.readStream.format("graft-tail")
      .option("path", root.toString).option("glob", glob)
      .load()
      .writeStream.format("memory")
      .queryName("tailq")
      .option("checkpointLocation", ckpt)
      .start()
    q
  }

  private def rows(): Seq[(String, String)] =
    spark.sql("SELECT value, path FROM tailq ORDER BY value").collect()
      .map(r => (r.getString(0), r.getString(1))).toSeq

  test("offset json round-trips (incl. escaped paths)") {
    val o = TailOffset(Map("/a/b.log" -> 42L, "/weird \"name\"\n.log" -> 7L))
    assert(TailOffset.fromJson(o.json()) === o)
    assert(TailOffset.fromJson("{}") === TailOffset(Map.empty))
  }

  test("tails a growing file across micro-batches; partial line held back") {
    val root = Files.createTempDirectory("graft-tail")
    val f = root.resolve("app.log")
    Files.writeString(f, "one\ntwo\npart")
    val q = startTail(root)
    try {
      q.processAllAvailable()
      assert(rows().map(_._1) === Seq("one", "two")) // "part" not terminated yet
      Files.writeString(f, "ial\nthree\n", StandardOpenOption.APPEND)
      q.processAllAvailable()
      assert(rows().map(_._1).sorted === Seq("one", "partial", "three", "two"))
    } finally q.stop()
  }

  test("discovers files created after the stream starts (--retry)") {
    val root = Files.createTempDirectory("graft-tail")
    val q = startTail(root)
    try {
      q.processAllAvailable()
      assert(rows().isEmpty)
      Files.createDirectories(root.resolve("svc/deep"))
      Files.writeString(root.resolve("svc/deep/late.log"), "hello\n")
      Files.writeString(root.resolve("svc/skip.txt"), "no\n")
      q.processAllAvailable()
      val got = rows()
      assert(got.map(_._1) === Seq("hello"))
      assert(got.head._2.endsWith("late.log")) // basename glob, recursive, txt excluded
    } finally q.stop()
  }

  test("truncation rereads from the start (--follow=name after rotation)") {
    val root = Files.createTempDirectory("graft-tail")
    val f = root.resolve("rot.log")
    Files.writeString(f, "aaa\nbbb\n")
    val q = startTail(root)
    try {
      q.processAllAvailable()
      assert(rows().map(_._1) === Seq("aaa", "bbb"))
      Files.writeString(f, "ccc\n") // truncate + rewrite (rotation)
      q.processAllAvailable()
      assert(rows().map(_._1).sorted === Seq("aaa", "bbb", "ccc"))
    } finally q.stop()
  }
}
