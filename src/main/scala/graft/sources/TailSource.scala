package graft.sources

import java.io.RandomAccessFile
import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path, Paths}
import java.util
import scala.collection.mutable
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types.{StringType, StructField, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** `tail --follow=name --retry` as a DSv2 micro-batch source — the one
  * operator the reference has that Spark's file source genuinely lacks
  * (S1, SURVEY.md §2.1): Spark's `text` source tracks whole files
  * (immutable once seen); tailing a GROWING file needs per-file BYTE
  * offsets in the stream offset. This source:
  *
  *  - discovers files under `path` recursively, matching `glob` against
  *    basenames only (reference: filepath.Walk + filepath.Match,
  *    main.go:291-313) — every micro-batch, so new/late files appear
  *    exactly like `--retry` + the 60s dir rescan (main.go:279-322);
  *  - offsets are a JSON map file→byteOffset checkpointed by the engine
  *    (restart-safe, exactly-once per micro-batch);
  *  - emits only complete lines; the partial tail line stays unread until
  *    its newline arrives (a deliberate improvement over the reference,
  *    which can split a line in two envelopes on an EOF race,
  *    main.go:238-245 — documented delta);
  *  - survives truncation/rotation: size < committed offset → reread from
  *    0 (the `--follow=name` semantics).
  *
  * Scale: one input partition per (file, byte-range) → tailing N files
  * fans out across executors; a huge burst on one file is still one
  * partition per batch, bounded by `maxBytesPerFilePerBatch`.
  *
  * Usage:
  * {{{
  *   spark.readStream.format("graft-tail")
  *     .option("path", "/var/log").option("glob", "*.log").load()
  *   // → schema: value STRING, path STRING
  * }}}
  */
class TailTableProvider extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graft-tail"
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    TailSource.Schema
  override def getTable(
      schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new TailTable(new CaseInsensitiveStringMap(properties))
}

object TailSource {
  val Schema: StructType = StructType(Seq(
    StructField("value", StringType, nullable = false),
    StructField("path", StringType, nullable = false)))

  /** Recursive listing, basename glob (filepath.Match semantics). */
  def listFiles(root: String, glob: String): Seq[Path] = {
    val rootPath = Paths.get(root)
    if (!Files.exists(rootPath)) return Nil // --retry: root may appear later
    val matcher = rootPath.getFileSystem.getPathMatcher(s"glob:$glob")
    val out = mutable.ArrayBuffer[Path]()
    val stream = Files.walk(rootPath)
    try {
      stream.iterator().asScala.foreach { p =>
        if (Files.isRegularFile(p) && matcher.matches(p.getFileName)) out += p
      }
    } finally stream.close()
    out.sortBy(_.toString).toSeq
  }
}

private[sources] class TailTable(options: CaseInsensitiveStringMap)
    extends Table with SupportsRead {
  override def name(): String =
    s"graft-tail(${options.get("path")}, ${options.getOrDefault("glob", "*")})"
  override def schema(): StructType = TailSource.Schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.MICRO_BATCH_READ)
  override def newScanBuilder(caseInsensitiveOptions: CaseInsensitiveStringMap): ScanBuilder =
    () => new TailScan(options)
}

private[sources] class TailScan(options: CaseInsensitiveStringMap) extends Scan {
  override def readSchema(): StructType = TailSource.Schema
  override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
    new TailMicroBatchStream(
      root = Option(options.get("path")).getOrElse(
        throw new IllegalArgumentException("graft-tail requires option 'path'")),
      glob = options.getOrDefault("glob", "*"),
      maxBytesPerFilePerBatch = options.getOrDefault(
        "maxBytesPerFilePerBatch", (128L * 1024 * 1024).toString).toLong)
}

/** Offset = map(file path → bytes consumed). Hand-rolled JSON (flat
  * string→long object with escaped keys) to avoid coupling to a JSON
  * library version.
  */
case class TailOffset(offsets: Map[String, Long]) extends Offset {
  override def json(): String =
    offsets.toSeq.sortBy(_._1).map { case (k, v) =>
      "\"" + TailOffset.escape(k) + "\":" + v
    }.mkString("{", ",", "}")
}

object TailOffset {
  def escape(s: String): String = s.flatMap {
    case '"' => "\\\""
    case '\\' => "\\\\"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  }

  /** Parse the flat {"path":123,...} shape written by json(). */
  def fromJson(json: String): TailOffset = {
    val m = mutable.Map[String, Long]()
    var i = 0
    def expect(c: Char): Unit = { assert(json(i) == c, s"bad offset json at $i"); i += 1 }
    def skipWs(): Unit = while (i < json.length && json(i).isWhitespace) i += 1
    skipWs(); expect('{'); skipWs()
    if (i < json.length && json(i) == '}') return TailOffset(m.toMap)
    while (i < json.length) {
      skipWs(); expect('"')
      val sb = new StringBuilder
      while (json(i) != '"') {
        if (json(i) == '\\') {
          i += 1
          json(i) match {
            case 'u' => sb += Integer.parseInt(json.substring(i + 1, i + 5), 16).toChar; i += 4
            case c => sb += c
          }
        } else sb += json(i)
        i += 1
      }
      i += 1; skipWs(); expect(':'); skipWs()
      val start = i
      while (i < json.length && (json(i).isDigit || json(i) == '-')) i += 1
      m += (sb.toString -> json.substring(start, i).toLong)
      skipWs()
      if (json(i) == ',') { i += 1 } else { expect('}'); return TailOffset(m.toMap) }
    }
    TailOffset(m.toMap)
  }
}

private[sources] class TailMicroBatchStream(
    root: String, glob: String, maxBytesPerFilePerBatch: Long)
    extends MicroBatchStream {

  override def initialOffset(): Offset = TailOffset(Map.empty)

  override def latestOffset(): Offset = {
    val sizes = TailSource.listFiles(root, glob).map { p =>
      p.toString -> Files.size(p)
    }.toMap
    TailOffset(sizes)
  }

  override def deserializeOffset(json: String): Offset = TailOffset.fromJson(json)

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val s = start.asInstanceOf[TailOffset].offsets
    val e = end.asInstanceOf[TailOffset].offsets
    e.flatMap { case (path, endOff) =>
      val rawStart = s.getOrElse(path, 0L)
      // truncation/rotation: file shrank below committed offset → reread
      val startOff = if (endOff < rawStart) 0L else rawStart
      val cappedEnd = math.min(endOff, startOff + maxBytesPerFilePerBatch)
      if (cappedEnd > startOff) Some(TailInputPartition(path, startOff, cappedEnd))
      else None
    }.toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    (partition: InputPartition) => {
      val p = partition.asInstanceOf[TailInputPartition]
      new TailPartitionReader(p.path, p.start, p.end)
    }

  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()
}

private[sources] case class TailInputPartition(path: String, start: Long, end: Long)
  extends InputPartition

/** Reads one file's byte range, emitting complete `\n`-terminated lines
  * (newline stripped, like Spark's text source; the envelope projection
  * re-appends it).
  *
  * Line-fragment protocol: offsets advance to raw file sizes, so a batch
  * boundary can land mid-line. The rules that keep every line emitted
  * exactly once, unsplit:
  *  - a line is emitted by the batch whose range contains its TERMINATING
  *    newline;
  *  - the reader back-scans from `start` to the previous newline (or BOF)
  *    so a fragment begun in an earlier range is re-read and emitted whole
  *    here — the earlier reader dropped it (no newline in its range);
  *  - bytes after the last newline in this range are dropped here and
  *    re-read by the batch that sees their newline.
  * A file that ends without a trailing newline keeps its last fragment
  * unemitted until terminated — deliberate delta vs the reference, which
  * emits the EOF fragment immediately and can therefore split one logical
  * line into two envelopes on an EOF race (main.go:238-245).
  */
private[sources] class TailPartitionReader(path: String, start: Long, end: Long)
    extends PartitionReader[InternalRow] {

  private val pathUtf8 = UTF8String.fromString(path)
  private var lines: Iterator[Array[Byte]] = _
  private var current: Array[Byte] = _

  /** Last '\n' strictly before `pos`, or -1. Chunked backward scan. */
  private def lastNewlineBefore(f: RandomAccessFile, pos: Long): Long = {
    val chunk = 64 * 1024
    var hi = pos
    val buf = new Array[Byte](chunk)
    while (hi > 0) {
      val lo = math.max(0L, hi - chunk)
      f.seek(lo)
      val n = (hi - lo).toInt
      f.readFully(buf, 0, n)
      var i = n - 1
      while (i >= 0) {
        if (buf(i) == '\n') return lo + i
        i -= 1
      }
      hi = lo
    }
    -1L
  }

  private def readRange(): Iterator[Array[Byte]] = {
    val f = new RandomAccessFile(path, "r")
    try {
      val len = math.min(end, f.length())
      if (len <= start) return Iterator.empty
      // adopt the fragment left by the previous range (see protocol above)
      val effStart = if (start == 0L) 0L else lastNewlineBefore(f, start) + 1
      f.seek(effStart)
      val buf = new Array[Byte]((len - effStart).toInt)
      f.readFully(buf)
      val out = mutable.ArrayBuffer[Array[Byte]]()
      var lineStart = 0
      var i = 0
      while (i < buf.length) {
        if (buf(i) == '\n') {
          // only lines whose newline lies within [start, end) belong here;
          // earlier newlines were emitted by the previous range
          if (effStart + i >= start) {
            out += util.Arrays.copyOfRange(buf, lineStart, i)
          }
          lineStart = i + 1
        }
        i += 1
      }
      out.iterator
    } finally f.close()
  }

  override def next(): Boolean = {
    if (lines == null) lines = readRange()
    if (lines.hasNext) { current = lines.next(); true } else false
  }

  override def get(): InternalRow =
    InternalRow(UTF8String.fromBytes(current), pathUtf8)

  override def close(): Unit = ()
}
