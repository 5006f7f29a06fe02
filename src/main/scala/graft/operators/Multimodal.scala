package graft.operators

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** A multimodal record: opaque binary payload + typed metadata. The
  * container has no image/audio codecs, so `payload` is derived
  * deterministically from document text; the DECODE step is a stub (see
  * [[Multimodal.fakeDecode]]) — the Spark-side plumbing (schema, typed
  * Dataset, partition-batched decode, feature schema) is real and tested.
  */
final case class MediaRecord(
    doc_id: Long,
    media_type: String,
    payload: Array[Byte],
    meta: Map[String, String])

/** Decoded features for one media record (fixed-shape, columnar-friendly). */
final case class MediaFeatures(
    doc_id: Long,
    media_type: String,
    width: Int,
    height: Int,
    n_bytes: Long,
    feat: Array[Float],
    checksum: Long)

/** Multimodal-column operators: binary payloads with typed metadata,
  * decode/feature-extract as partition-batched typed transforms.
  *
  * Scale design: payloads stay opaque `BINARY` columns (parquet stores
  * them contiguously; column pruning means metadata-only queries never
  * read the bytes). Decode runs per-partition in fixed-size batches —
  * the same batch shape a Pandas-UDF/`mapInPandas` pipeline uses — so a
  * real codec (JNI/native) amortizes init cost per batch, not per row.
  */
object Multimodal {

  def defs: Seq[QueryDef] = Seq(q38, q39, q212)

  /** documents → typed multimodal dataset (payload = UTF-8 bytes of text;
    * media_type cycles image/audio/video by doc_id).
    */
  def mediaDataset(s: SparkSession, d: String): Dataset[MediaRecord] = {
    import s.implicits._
    Tables.documents(s, d)
      .select(col("doc_id"),
        element_at(typedLit(Seq("image", "audio", "video")),
          (col("doc_id") % 3 + 1).cast("int")).as("media_type"),
        col("text").cast("binary").as("payload"),
        map(lit("source"), col("source"),
          lit("n_chars"), col("n_chars").cast("string")).as("meta"))
      .as[MediaRecord]
  }

  /** STUB DECODER — deterministic fake standing in for an image/audio
    * decode (`???` boundary: a real deployment plugs a codec in here).
    * Produces fixed-shape features from the raw bytes so the pipeline is
    * end-to-end testable without codec libraries.
    */
  def fakeDecode(rec: MediaRecord): MediaFeatures = {
    val bytes = rec.payload
    val n = bytes.length
    // fake "dimensions" from payload size; a real decoder reads the header
    val width = 16 + (n % 64)
    val height = 16 + ((n / 64) % 64)
    // fake 8-dim "embedding": byte histogram moments, deterministic
    val feat = new Array[Float](8)
    var i = 0
    var acc = 1125899906842597L // FNV-ish rolling checksum
    while (i < n) {
      val b = bytes(i) & 0xff
      feat(b % 8) += 1.0f
      acc = acc * 31 + b
      i += 1
    }
    var j = 0
    while (j < 8) { feat(j) = if (n == 0) 0f else feat(j) / n; j += 1 }
    MediaFeatures(rec.doc_id, rec.media_type, width, height, n.toLong, feat, acc)
  }

  /** Metadata + payload framing checks (oracle-checked: byte length and
    * header bytes are engine-independent).
    */
  val q38: QueryDef = QueryDef.checked(
    "q38_binary_meta",
    """SELECT doc_id,
      | octet_length(encode(text)) AS n_bytes,
      | substring(hex(encode(text)), 1, 8) AS header_hex,
      | CASE CAST(doc_id % 3 AS INT) WHEN 0 THEN 'image' WHEN 1 THEN 'audio'
      |   ELSE 'video' END AS media_type
      |FROM documents ORDER BY doc_id""".stripMargin) { (s, d) =>
    mediaDataset(s, d).toDF()
      .select(col("doc_id"),
        octet_length(col("payload")).as("n_bytes"),
        substring(hex(col("payload")), 1, 8).as("header_hex"),
        col("media_type"))
      .orderBy(col("doc_id"))
  }

  /** q212: deterministic frame-sampling PLAN for the video rows — the
    * scheduling half of a frame-extraction pipeline, fully relational
    * (the decode of each planned frame is q39's stubbed batch step):
    * per video, synthetic metadata (fps 24, duration = n_chars ms)
    * yields a frame count, and the plan samples one frame per second
    * capped at 32 samples per video — explode(sequence(0, ub, fps)),
    * a row-local generate with zero shuffle. Every planned (frame_idx,
    * ts_ms) is integer arithmetic, so the plan itself is oracle-
    * checked; at 100 TB this is the manifest you hand to the decode
    * fleet, and column pruning means it never reads payload bytes.
    */
  val q212: QueryDef = QueryDef.checked(
    "q212_frame_sampling",
    """WITH v AS (
      |  SELECT doc_id, n_chars * 24 // 1000 AS n_frames
      |  FROM documents WHERE CAST(doc_id % 3 AS INT) = 2),
      |plan AS (
      |  SELECT doc_id,
      |    unnest(generate_series(0, LEAST(n_frames - 1, 31 * 24), 24))
      |      AS frame_idx
      |  FROM v WHERE n_frames > 0)
      |SELECT doc_id, frame_idx, frame_idx * 1000 // 24 AS ts_ms
      |FROM plan ORDER BY doc_id, frame_idx""".stripMargin) { (s, d) =>
    Tables.documents(s, d)
      .filter(expr("CAST(doc_id % 3 AS INT) = 2"))
      .select(col("doc_id"), expr("n_chars * 24 div 1000").as("n_frames"))
      .filter(col("n_frames") > 0)
      .select(col("doc_id"),
        explode(sequence(lit(0L),
          least(col("n_frames") - 1, lit(31L * 24L)), lit(24L))).as("frame_idx"))
      .select(col("doc_id"), col("frame_idx"),
        expr("frame_idx * 1000 div 24").as("ts_ms"))
      .orderBy(col("doc_id"), col("frame_idx"))
  }

  /** Partition-batched decode → features. `mapPartitions` with an
    * explicit batch loop (batch size 64) mirrors the Arrow-batch shape of
    * `mapInPandas`; the decode itself is the deterministic stub above.
    * Rows-only check (feature values depend on the stub); MultimodalSpec
    * pins exact values for known inputs.
    */
  val q39: QueryDef = QueryDef.rowsOnly("q39_media_features") { (s, d) =>
    import s.implicits._
    val feats = mediaDataset(s, d).mapPartitions { it =>
      it.grouped(64).flatMap { batch =>
        // batch boundary: a real decoder would init codec state here once
        batch.iterator.map(fakeDecode)
      }
    }
    feats.toDF()
      .select(col("doc_id"), col("media_type"), col("width"), col("height"),
        col("n_bytes"), round(element_at(col("feat"), 1), 6).as("feat0"),
        col("checksum"))
      .orderBy(col("doc_id"))
  }
}
