package graft.operators

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** A multimodal record: opaque binary payload + typed metadata.
  * For q38 (binary plumbing) the payload is the document's raw bytes;
  * for q39 (the codec boundary) payloads are REAL media containers —
  * BMP / WAV / BMP-frame streams built by [[graft.functions.MediaCodecs]]
  * — synthesized deterministically from document text, since the corpus
  * ships no media files.
  */
final case class MediaRecord(
    doc_id: Long,
    media_type: String,
    payload: Array[Byte],
    meta: Map[String, String])

/** Decoded container features (fixed-shape, columnar-friendly): the
  * header-derived fields are integer-exact and oracle-checkable; the
  * content features (mean level / amplitude) come from the decoded
  * pixel/sample data and are certified by MultimodalSpec goldens.
  */
final case class MediaFeatures(
    doc_id: Long,
    media_type: String,
    width: Int,
    height: Int,
    n_frames: Int,
    n_samples: Long,
    sample_rate: Int,
    n_bytes: Long,
    mean_level: Double)

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

  def defs: Seq[QueryDef] =
    Seq(q38, q39, q212, q282, q285, q287, q288, q289, q291)

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

  import graft.functions.MediaCodecs

  /** Container geometry derived from n_chars — the ONLY coupling the
    * oracle needs: dims/frame-count/sample-count are fixed by these
    * formulas at ENCODE time, written into real headers, and read BACK
    * from those headers at decode time, so a corrupted encoder or
    * parser breaks the q39 hash.
    */
  def bmpDims(nChars: Long): (Int, Int) =
    ((4 + nChars % 29).toInt, (4 + (nChars / 29) % 13).toInt)
  def videoFrames(nChars: Long): Int = (1 + nChars % 3).toInt
  def wavSamples(nChars: Long): Int = math.min(nChars, 4096L).toInt
  val WavRate = 8000

  /** ENCODE: documents row → a real media container. Pixel bytes cycle
    * through the document's text bytes (video frames phase-shift by
    * frame index); audio samples center the text bytes to 16-bit PCM.
    * Deterministic, so the pipeline is end-to-end testable without
    * media fixtures; the containers are format-valid (goldens in
    * MultimodalSpec decode them with the independent stream parsers).
    */
  def encodeContainer(docId: Long, nChars: Long,
      text: Array[Byte]): Array[Byte] = {
    val t = if (text.isEmpty) Array[Byte](0) else text
    (docId % 3) match {
      case 0 => // image: one 24 bpp BMP
        val (w, h) = bmpDims(nChars)
        MediaCodecs.encodeBmp(w, h, i => t(i % t.length))
      case 1 => // audio: mono PCM16 WAV
        encodeWavClip(nChars, t)
      case _ => // video: K BMP frames back to back
        val (w, h) = bmpDims(nChars)
        val k = videoFrames(nChars)
        val frames = (0 until k).map(f =>
          MediaCodecs.encodeBmp(w, h, i => t((i + f) % t.length)))
        val out = new Array[Byte](frames.map(_.length).sum)
        var off = 0
        frames.foreach { fr =>
          System.arraycopy(fr, 0, out, off, fr.length); off += fr.length
        }
        out
    }
  }

  /** The audio branch of [[encodeContainer]] as a standalone encoder —
    * any document rendered as its PCM16 WAV clip (samples center the
    * text bytes: (byte − 128)·256, capped at [[wavSamples]]): q291's
    * whole-corpus audio rendition uses it directly, so the planted
    * near-dup texts become genuinely byte-shifted sample streams.
    */
  def encodeWavClip(nChars: Long, text: Array[Byte]): Array[Byte] = {
    val t = if (text.isEmpty) Array[Byte](0) else text
    val n = wavSamples(nChars)
    val samples = new Array[Short](n)
    var i = 0
    while (i < n) {
      samples(i) = (((t(i % t.length) & 0xff) - 128) * 256).toShort
      i += 1
    }
    MediaCodecs.encodeWavPcm16Mono(WavRate, samples)
  }

  /** DECODE: parse the container through the real format parsers and
    * emit fixed-shape features. Every geometry field comes from the
    * parsed HEADERS (not from the generation formulas), which is what
    * makes the oracle check a round-trip certificate.
    */
  def decodeContainer(rec: MediaRecord): MediaFeatures = rec.media_type match {
    case "image" =>
      val f = MediaCodecs.decodeBmp(rec.payload, 0)
      MediaFeatures(rec.doc_id, rec.media_type, f.width, f.height,
        n_frames = 1, n_samples = 0L, sample_rate = 0,
        n_bytes = rec.payload.length.toLong, mean_level = f.meanLevel)
    case "audio" =>
      val a = MediaCodecs.decodeWav(rec.payload)
      MediaFeatures(rec.doc_id, rec.media_type, width = 0, height = 0,
        n_frames = 0, n_samples = a.nSamples, sample_rate = a.sampleRate,
        n_bytes = rec.payload.length.toLong, mean_level = a.meanAbs)
    case _ =>
      val frames = MediaCodecs.decodeBmpStream(rec.payload)
      // a descriptive failure naming the record, not a bare
      // NoSuchElementException from frames.head on an empty payload
      require(frames.nonEmpty,
        s"doc ${rec.doc_id}: ${rec.media_type} payload decodes to 0 frames")
      MediaFeatures(rec.doc_id, rec.media_type,
        frames.head.width, frames.head.height,
        n_frames = frames.size, n_samples = 0L, sample_rate = 0,
        n_bytes = rec.payload.length.toLong,
        mean_level = frames.map(_.meanLevel).sum / frames.size)
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

  /** q39: the CODEC boundary, end to end — encode every document into a
    * real container (BMP image / PCM WAV / BMP-frame stream by
    * doc_id % 3), then decode through the independent format parsers in
    * partition-sized batches (`mapPartitions` + explicit 64-row batch
    * loop — the Arrow-batch shape of `mapInPandas`; codec state inits
    * once per batch, which is where a JNI decoder amortizes setup).
    * ORACLE-CHECKED: the geometry the encoder writes into headers is a
    * pure function of n_chars, and every output field is read back from
    * the PARSED headers — so DuckDB replays the geometry arithmetic and
    * any encoder/parser defect (wrong stride, bad LE field, misplaced
    * chunk) breaks the hash. Content features (mean pixel level, mean
    * |amplitude|, zero crossings) come from the decoded pixel/sample
    * data and are certified against hand-built golden containers in
    * MultimodalSpec.
    */
  val q39: QueryDef = QueryDef.checked(
    "q39_media_features",
    """WITH g AS (
      |  SELECT doc_id, CAST(doc_id % 3 AS INT) AS mt,
      |    CAST(4 + n_chars % 29 AS INT) AS w,
      |    CAST(4 + (n_chars // 29) % 13 AS INT) AS h,
      |    CAST(1 + n_chars % 3 AS INT) AS k,
      |    LEAST(n_chars, 4096) AS ns
      |  FROM documents),
      |g2 AS (SELECT *, ((3 * w + 3) // 4) * 4 AS row_bytes FROM g)
      |SELECT doc_id,
      |  CASE mt WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END
      |    AS media_type,
      |  CAST(CASE WHEN mt = 1 THEN 0 ELSE w END AS INTEGER) AS width,
      |  CAST(CASE WHEN mt = 1 THEN 0 ELSE h END AS INTEGER) AS height,
      |  CAST(CASE mt WHEN 0 THEN 1 WHEN 1 THEN 0 ELSE k END AS INTEGER)
      |    AS n_frames,
      |  CAST(CASE WHEN mt = 1 THEN ns ELSE 0 END AS BIGINT) AS n_samples,
      |  CAST(CASE WHEN mt = 1 THEN 8000 ELSE 0 END AS INTEGER)
      |    AS sample_rate,
      |  CAST(CASE mt WHEN 0 THEN 54 + h * row_bytes
      |    WHEN 1 THEN 44 + 2 * ns
      |    ELSE k * (54 + h * row_bytes) END AS BIGINT) AS n_bytes
      |FROM g2 ORDER BY doc_id""".stripMargin) { (s, d) =>
    import s.implicits._
    val recs = Tables.documents(s, d)
      .select(col("doc_id"),
        element_at(typedLit(Seq("image", "audio", "video")),
          (col("doc_id") % 3 + 1).cast("int")).as("media_type"),
        col("text"), col("n_chars"))
      .as[(Long, String, String, Long)]
    val feats = recs.mapPartitions { it =>
      it.grouped(64).flatMap { batch =>
        // batch boundary: a real codec inits its state here once
        batch.iterator.map { case (id, mt, text, nChars) =>
          val payload = encodeContainer(id, nChars,
            text.getBytes(java.nio.charset.StandardCharsets.UTF_8))
          decodeContainer(MediaRecord(id, mt, payload, Map.empty))
        }
      }
    }
    feats.toDF()
      .select(col("doc_id"), col("media_type"), col("width"), col("height"),
        col("n_frames"), col("n_samples"), col("sample_rate"), col("n_bytes"))
      .orderBy(col("doc_id"))
  }

  /** ViT-style PATCH MANIFEST over a parsed-header image frame — the
    * scheduling half of a patch-extraction pipeline, the q212 pattern
    * applied to images: per image, one row per `patch`×`patch` tile
    * (edge tiles clipped) with the FILE BYTE OFFSET of the tile's
    * top-left pixel (BMP rows are bottom-up and 4-byte padded, so
    * byte_off = data_off + (h−1−pr·patch)·stride + 3·pc·patch). The
    * grid is a row-local nested `transform` + one explode — zero
    * shuffle — and the offsets make it a RANGE-READ plan: at 100 TB
    * the decode fleet fetches exactly the byte ranges of the patches
    * it owns instead of whole payloads, and nothing downstream of the
    * header parse ever moves a pixel. Input columns:
    * (doc_id, w, h, data_off).
    */
  def patchManifest(imgs: DataFrame, patch: Int = 4): DataFrame =
    imgs.select(col("doc_id"), col("w"), col("h"),
        explode(expr(
          s"""flatten(transform(sequence(0, (h + ${patch - 1}) div $patch - 1),
             |  pr -> transform(sequence(0, (w + ${patch - 1}) div $patch - 1),
             |    pc -> named_struct(
             |      'patch_row', CAST(pr AS INT), 'patch_col', CAST(pc AS INT),
             |      'patch_w', CAST(least($patch, w - pc * $patch) AS INT),
             |      'patch_h', CAST(least($patch, h - pr * $patch) AS INT),
             |      'byte_off', CAST(data_off
             |        + (h - 1 - pr * $patch) * (((3 * w + 3) div 4) * 4)
             |        + 3 * pc * $patch AS BIGINT)))))""".stripMargin)).as("p"))
      .select(col("doc_id"), col("w"), col("h"), col("p.patch_row"),
        col("p.patch_col"), col("p.patch_w"), col("p.patch_h"),
        col("p.byte_off"))
      .orderBy(col("doc_id"), col("patch_row"), col("patch_col"))

  /** q282: the 4×4 patch manifest of every image row, geometry taken
    * from the PARSED BMP headers (encode → header-only decode — the
    * q39 round-trip discipline: the oracle derives the same grid from
    * the generation formulas and a literal data_off 54, so a corrupted
    * encoder, header writer, or parser breaks the hash).
    */
  val q282: QueryDef = QueryDef.checked(
    "q282_patch_manifest",
    """WITH img AS (
      |  SELECT doc_id, CAST(4 + n_chars % 29 AS INT) AS w,
      |         CAST(4 + (n_chars // 29) % 13 AS INT) AS h
      |  FROM documents WHERE doc_id % 3 = 0),
      |g AS (
      |  SELECT doc_id, w, h, CAST(pr AS INT) AS patch_row,
      |         CAST(pc AS INT) AS patch_col
      |  FROM img,
      |    unnest(generate_series(0, (h + 3) // 4 - 1)) AS r(pr),
      |    unnest(generate_series(0, (w + 3) // 4 - 1)) AS c(pc))
      |SELECT doc_id, w, h, patch_row, patch_col,
      |  CAST(LEAST(4, w - patch_col * 4) AS INT) AS patch_w,
      |  CAST(LEAST(4, h - patch_row * 4) AS INT) AS patch_h,
      |  CAST(54 + (h - 1 - patch_row * 4) * (((3 * w + 3) // 4) * 4)
      |    + 3 * patch_col * 4 AS BIGINT) AS byte_off
      |FROM g ORDER BY doc_id, patch_row, patch_col""".stripMargin) { (s, d) =>
    import s.implicits._
    val imgs = Tables.documents(s, d)
      .filter(col("doc_id") % 3 === 0)
      .select(col("doc_id"), col("text"), col("n_chars"))
      .as[(Long, String, Long)]
      .mapPartitions(_.map { case (id, text, nChars) =>
        val payload = encodeContainer(id, nChars,
          text.getBytes(java.nio.charset.StandardCharsets.UTF_8))
        val hd = MediaCodecs.decodeBmpHeader(payload, 0)
        (id, hd.width, hd.height, hd.dataOff)
      }).toDF("doc_id", "w", "h", "data_off")
    patchManifest(imgs)
  }

  /** Perceptual-hash near-duplicate detection over an image corpus —
    * the image analogue of q28's MinHash/LSH text dedup, connecting the
    * codec surface to the dedup machinery. Input: one (doc_id, phash)
    * row per image ([[graft.functions.MediaCodecs.dHash56]] over the
    * decoded pixel grid — row-local, computed inside the same
    * partition-batched decode pass as every other codec op). Candidate
    * generation is BANDED, never all-pairs: the 56-bit hash splits into
    * 4 bands of 14 bits, images equi-join on (band index, band value),
    * and only band-colliding pairs pay the Hamming verify
    * (bit_count(h₁ XOR h₂) ≤ `maxHamming`). Pigeonhole guarantee: any
    * pair within Hamming distance 3 shares at least one intact band and
    * is always found; distances 4..maxHamming are found unless the
    * flips spread across all four bands (the standard LSH recall trade,
    * replayed identically by the oracle). At 100 TB the band join
    * shuffles 4 rows of 20 bytes per image — the hash exchange is
    * narrower than any pixel move, and the verify touches only
    * colliding pairs. Output: one row per image with its hash and its
    * verified near-duplicate partner count.
    */
  /** The shared banded-Hamming candidate/verify core behind all three
    * modality dedups: split each 56-bit hash into 4 bands of 14 bits,
    * equi-join hash rows on (band index, band value), and keep the
    * (da < db) pairs within `maxHamming` — one implementation, so a
    * band-geometry or verify change can never silently diverge between
    * the image ([[phashDedup]]) and video ([[frameDedup]]) paths.
    * Input needs (doc_id, h); output is the distinct verified
    * (da, db) pair set.
    */
  /** Band rows of a (doc_id, h) hash frame — the exchange/index unit
    * of the banded dedup: one (doc_id, h, band_i, band_v) row per
    * 14-bit band. This is also the PERSISTED shape of the q289 media
    * fingerprint index.
    */
  private def phashBands(hashed: DataFrame): DataFrame =
    hashed.select(col("doc_id"), col("h"),
        explode(expr(
          """transform(sequence(0, 3), i -> named_struct(
            |  'band_i', CAST(i AS INT),
            |  'band_v', shiftright(h, CAST(14 * i AS INT)) & 16383L))"""
            .stripMargin)).as("b"))
      .select(col("doc_id"), col("h"), col("b.band_i"), col("b.band_v"))

  private def bandedHammingPairs(hashed: DataFrame,
      maxHamming: Int): DataFrame = {
    val bands = phashBands(hashed)
    bands.select(col("band_i"), col("band_v"),
        col("doc_id").as("da"), col("h").as("ha"))
      .join(bands.select(col("band_i"), col("band_v"),
        col("doc_id").as("db"), col("h").as("hb")),
        Seq("band_i", "band_v"))
      .filter(col("da") < col("db"))
      .select(col("da"), col("db"), col("ha"), col("hb")).distinct()
      .filter(expr(s"bit_count(ha ^ hb) <= $maxHamming"))
      .select(col("da"), col("db"))
  }

  def phashDedup(imgs: DataFrame, maxHamming: Int = 6): DataFrame = {
    val ph = imgs
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val ver = bandedHammingPairs(ph.select(col("doc_id"),
      col("phash").as("h")), maxHamming)
    val partners = ver.select(col("da").as("doc_id"))
      .unionByName(ver.select(col("db").as("doc_id")))
      .groupBy(col("doc_id")).agg(count(lit(1)).as("n_partners"))
    ph.join(partners, Seq("doc_id"), "left")
      .select(col("doc_id"), col("phash"),
        coalesce(col("n_partners"), lit(0L)).as("n_partners"))
      .orderBy(col("doc_id"))
  }

  /** q285: dHash near-dup detection over the image rows — encode each
    * image document into its real BMP, hash the DECODED pixel grid
    * (header-parsed geometry — the q39/q282 round-trip discipline), and
    * run the banded Hamming dedup. The oracle replays the hash from the
    * generation formulas (pixel bytes cycle the text bytes) and the
    * identical banding/verify pipeline, so a corrupted encoder, header
    * parser, sampler, or band split breaks the hash check.
    */
  val q285: QueryDef = QueryDef.checked(
    "q285_phash_dedup",
    """WITH img AS (
      |  SELECT doc_id, GREATEST(octet_length(encode(text)), 1) AS tl,
      |    COALESCE(NULLIF(hex(encode(text)), ''), '00') AS hx,
      |    CAST(4 + n_chars % 29 AS INT) AS w,
      |    CAST(4 + (n_chars // 29) % 13 AS INT) AS h,
      |    CAST(((3 * (4 + n_chars % 29) + 3) // 4) * 4 AS INT) AS stride
      |  FROM documents WHERE doc_id % 3 = 0),
      |bits AS (
      |  SELECT doc_id, CAST(r AS INT) AS r, CAST(c AS INT) AS c,
      |    (('0x' || substr(hx, 2 * CAST(((r * h // 8) * stride + 3 * (c * w // 8)) % tl AS INT) + 1, 2))::INT
      |     + ('0x' || substr(hx, 2 * CAST((((r * h // 8) * stride + 3 * (c * w // 8)) + 1) % tl AS INT) + 1, 2))::INT
      |     + ('0x' || substr(hx, 2 * CAST((((r * h // 8) * stride + 3 * (c * w // 8)) + 2) % tl AS INT) + 1, 2))::INT) // 3 AS g1,
      |    (('0x' || substr(hx, 2 * CAST(((r * h // 8) * stride + 3 * ((c + 1) * w // 8)) % tl AS INT) + 1, 2))::INT
      |     + ('0x' || substr(hx, 2 * CAST((((r * h // 8) * stride + 3 * ((c + 1) * w // 8)) + 1) % tl AS INT) + 1, 2))::INT
      |     + ('0x' || substr(hx, 2 * CAST((((r * h // 8) * stride + 3 * ((c + 1) * w // 8)) + 2) % tl AS INT) + 1, 2))::INT) // 3 AS g2
      |  FROM img,
      |    unnest(generate_series(0, 7)) AS rr(r),
      |    unnest(generate_series(0, 6)) AS cc(c)),
      |ph AS (
      |  SELECT doc_id,
      |    CAST(SUM(CASE WHEN g2 > g1
      |      THEN 1::BIGINT << CAST(r * 7 + c AS INT) ELSE 0 END) AS BIGINT)
      |      AS phash
      |  FROM bits GROUP BY doc_id),
      |bands AS (
      |  SELECT doc_id, phash, CAST(i AS INT) AS band_i,
      |    CAST((phash >> CAST(14 * i AS INT)) & 16383 AS BIGINT) AS band_v
      |  FROM ph, unnest(generate_series(0, 3)) AS bi(i)),
      |cand AS (
      |  SELECT DISTINCT a.doc_id AS da, b.doc_id AS db,
      |    a.phash AS ha, b.phash AS hb
      |  FROM bands a JOIN bands b
      |    ON a.band_i = b.band_i AND a.band_v = b.band_v
      |    AND a.doc_id < b.doc_id),
      |ver AS (SELECT da, db FROM cand WHERE bit_count(xor(ha, hb)) <= 6),
      |partners AS (
      |  SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_partners FROM (
      |    SELECT da AS doc_id FROM ver UNION ALL SELECT db FROM ver)
      |  GROUP BY doc_id)
      |SELECT ph.doc_id, ph.phash, COALESCE(p.n_partners, 0) AS n_partners
      |FROM ph LEFT JOIN partners p USING (doc_id)
      |ORDER BY ph.doc_id""".stripMargin) { (s, d) =>
    import s.implicits._
    val imgs = Tables.documents(s, d)
      .filter(col("doc_id") % 3 === 0)
      .select(col("doc_id"), col("text"), col("n_chars"))
      .as[(Long, String, Long)]
      .mapPartitions(_.map { case (id, text, nChars) =>
        val payload = encodeContainer(id, nChars,
          text.getBytes(java.nio.charset.StandardCharsets.UTF_8))
        (id, MediaCodecs.dHash56(payload))
      }).toDF("doc_id", "phash")
    phashDedup(imgs)
  }

  /** q287: energy-fingerprint near-dup detection over the AUDIO rows —
    * encode each audio document into its real PCM WAV, fingerprint the
    * DECODED sample stream ([[graft.functions.MediaCodecs.aHash56Wav]]
    * — all-integer window energies through the real chunk walk), and
    * run the SAME banded Hamming dedup as q285 (the fingerprint was
    * shaped to reuse it — one dedup operator serves both modalities).
    * The oracle replays the energies from the generation formulas
    * (sample i = (text byte − 128)·256 cycling), so a corrupted
    * encoder, chunk walker, window assignment, or band split breaks
    * the hash. Honest corpus note: this corpus plants NEAR-dup TEXTS,
    * not near-dup audio — a one-token edit shifts every subsequent
    * sample byte and re-divides the windows, so (unlike q285's sparse
    * pixel sampling) no catalog pair survives within Hamming 6 and the
    * catalog partner counts are all 0; the dedup path itself is proven
    * by MultimodalSpec's planted identical/near-identical clips and by
    * q285 sharing the identical banding code. The SHIFT-TOLERANT
    * recall path is q291 ([[audioAnchorDedup]]): content-anchored
    * windows that survive exactly the edits these index-proportional
    * windows cannot.
    */
  val q287: QueryDef = QueryDef.checked(
    "q287_audio_fp_dedup",
    """WITH aud AS (
      |  SELECT doc_id, GREATEST(octet_length(encode(text)), 1) AS tl,
      |    COALESCE(NULLIF(hex(encode(text)), ''), '00') AS hx,
      |    CAST(LEAST(n_chars, 4096) AS BIGINT) AS n
      |  FROM documents WHERE doc_id % 3 = 1),
      |samp AS (
      |  SELECT doc_id,
      |    ABS((('0x' || substr(hx, 2 * CAST(i % tl AS INT) + 1, 2))::INT - 128) * 256) AS a,
      |    CAST(i * 57 // n AS INT) AS k
      |  FROM aud, unnest(generate_series(0, n - 1)) AS u(i)
      |  WHERE n > 0),
      |en AS (SELECT doc_id, k, CAST(SUM(a) AS BIGINT) AS e
      |  FROM samp GROUP BY doc_id, k),
      |grid AS (
      |  SELECT doc_id, CAST(k AS INT) AS k
      |  FROM aud, unnest(generate_series(0, 56)) AS g(k)),
      |ee AS (
      |  SELECT grid.doc_id, grid.k, COALESCE(en.e, 0) AS e
      |  FROM grid LEFT JOIN en USING (doc_id, k)),
      |ph AS (
      |  SELECT doc_id,
      |    CAST(SUM(CASE WHEN e_next > e THEN 1::BIGINT << k ELSE 0 END)
      |      AS BIGINT) AS phash
      |  FROM (SELECT doc_id, k, e,
      |          lead(e) OVER (PARTITION BY doc_id ORDER BY k) AS e_next
      |        FROM ee)
      |  WHERE k <= 55 GROUP BY doc_id),
      |bands AS (
      |  SELECT doc_id, phash, CAST(i AS INT) AS band_i,
      |    CAST((phash >> CAST(14 * i AS INT)) & 16383 AS BIGINT) AS band_v
      |  FROM ph, unnest(generate_series(0, 3)) AS bi(i)),
      |cand AS (
      |  SELECT DISTINCT a.doc_id AS da, b.doc_id AS db,
      |    a.phash AS ha, b.phash AS hb
      |  FROM bands a JOIN bands b
      |    ON a.band_i = b.band_i AND a.band_v = b.band_v
      |    AND a.doc_id < b.doc_id),
      |ver AS (SELECT da, db FROM cand WHERE bit_count(xor(ha, hb)) <= 6),
      |partners AS (
      |  SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_partners FROM (
      |    SELECT da AS doc_id FROM ver UNION ALL SELECT db FROM ver)
      |  GROUP BY doc_id)
      |SELECT ph.doc_id, ph.phash, COALESCE(p.n_partners, 0) AS n_partners
      |FROM ph LEFT JOIN partners p USING (doc_id)
      |ORDER BY ph.doc_id""".stripMargin) { (s, d) =>
    import s.implicits._
    val clips = Tables.documents(s, d)
      .filter(col("doc_id") % 3 === 1)
      .select(col("doc_id"), col("text"), col("n_chars"))
      .as[(Long, String, Long)]
      .mapPartitions(_.map { case (id, text, nChars) =>
        val payload = encodeContainer(id, nChars,
          text.getBytes(java.nio.charset.StandardCharsets.UTF_8))
        (id, MediaCodecs.aHash56Wav(payload))
      }).toDF("doc_id", "phash")
    phashDedup(clips)
  }

  /** SHARED-FRAME video near-dup detection — the third modality on the
    * same banding machinery: every frame of every video is dHash-ed
    * ([[graft.functions.MediaCodecs.dHash56]] over each frame of the
    * decoded stream), frame hashes band exactly like q285's image
    * hashes, and two VIDEOS pair up when ANY of their frame pairs
    * band-collides within the Hamming budget — the natural
    * clip-reuse/re-edit semantics (a shared scene links the videos;
    * frame order and count need not match). Input: one
    * (doc_id, f, fhash) row per frame. The band join exchanges
    * 4 rows × 20 bytes per FRAME; pair verification de-dups to the
    * video level before counting. Output: one row per video with its
    * frame count, min frame hash (a stable video-level fingerprint),
    * and verified partner count.
    */
  def frameDedup(frames: DataFrame, maxHamming: Int = 6): DataFrame = {
    val fh = frames
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val ver = bandedHammingPairs(fh.select(col("doc_id"),
        col("fhash").as("h")), maxHamming)
      .distinct() // frame pairs -> video pairs
    val partners = ver.select(col("da").as("doc_id"))
      .unionByName(ver.select(col("db").as("doc_id")))
      .groupBy(col("doc_id")).agg(count(lit(1)).as("n_partners"))
    fh.groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_frames"), min(col("fhash")).as("min_fhash"))
      .join(partners, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_frames"), col("min_fhash"),
        coalesce(col("n_partners"), lit(0L)).as("n_partners"))
      .orderBy(col("doc_id"))
  }

  /** q288: shared-frame near-dup detection over the VIDEO rows —
    * encode each video document into its real BMP-frame stream, dHash
    * every DECODED frame (the stream parser walks the concatenation by
    * each header's own size field — the q39 discipline), and run the
    * frame-level banded Hamming dedup. The oracle replays every frame
    * hash from the generation formulas (frame f's pixel bytes cycle
    * the text with phase +f) and the identical banding, so a corrupted
    * encoder, stream splitter, sampler, or band split breaks the hash.
    */
  val q288: QueryDef = QueryDef.checked(
    "q288_video_frame_dedup",
    """WITH vid AS (
      |  SELECT doc_id, GREATEST(octet_length(encode(text)), 1) AS tl,
      |    COALESCE(NULLIF(hex(encode(text)), ''), '00') AS hx,
      |    CAST(4 + n_chars % 29 AS INT) AS w,
      |    CAST(4 + (n_chars // 29) % 13 AS INT) AS h,
      |    CAST(((3 * (4 + n_chars % 29) + 3) // 4) * 4 AS INT) AS stride,
      |    CAST(1 + n_chars % 3 AS INT) AS k
      |  FROM documents WHERE doc_id % 3 = 2),
      |fr AS (
      |  SELECT vid.*, CAST(f AS INT) AS f
      |  FROM vid, unnest(generate_series(0, k - 1)) AS ff(f)),
      |bits AS (
      |  SELECT doc_id, f, CAST(r AS INT) AS r, CAST(c AS INT) AS c,
      |    (('0x' || substr(hx, 2 * CAST((((r * h // 8) * stride + 3 * (c * w // 8)) + f) % tl AS INT) + 1, 2))::INT
      |     + ('0x' || substr(hx, 2 * CAST((((r * h // 8) * stride + 3 * (c * w // 8)) + 1 + f) % tl AS INT) + 1, 2))::INT
      |     + ('0x' || substr(hx, 2 * CAST((((r * h // 8) * stride + 3 * (c * w // 8)) + 2 + f) % tl AS INT) + 1, 2))::INT) // 3 AS g1,
      |    (('0x' || substr(hx, 2 * CAST((((r * h // 8) * stride + 3 * ((c + 1) * w // 8)) + f) % tl AS INT) + 1, 2))::INT
      |     + ('0x' || substr(hx, 2 * CAST((((r * h // 8) * stride + 3 * ((c + 1) * w // 8)) + 1 + f) % tl AS INT) + 1, 2))::INT
      |     + ('0x' || substr(hx, 2 * CAST((((r * h // 8) * stride + 3 * ((c + 1) * w // 8)) + 2 + f) % tl AS INT) + 1, 2))::INT) // 3 AS g2
      |  FROM fr,
      |    unnest(generate_series(0, 7)) AS rr(r),
      |    unnest(generate_series(0, 6)) AS cc(c)),
      |fh AS (
      |  SELECT doc_id, f,
      |    CAST(SUM(CASE WHEN g2 > g1
      |      THEN 1::BIGINT << CAST(r * 7 + c AS INT) ELSE 0 END) AS BIGINT)
      |      AS fhash
      |  FROM bits GROUP BY doc_id, f),
      |bands AS (
      |  SELECT doc_id, f, fhash, CAST(i AS INT) AS band_i,
      |    CAST((fhash >> CAST(14 * i AS INT)) & 16383 AS BIGINT) AS band_v
      |  FROM fh, unnest(generate_series(0, 3)) AS bi(i)),
      |cand AS (
      |  SELECT DISTINCT a.doc_id AS da, b.doc_id AS db,
      |    a.fhash AS ha, b.fhash AS hb
      |  FROM bands a JOIN bands b
      |    ON a.band_i = b.band_i AND a.band_v = b.band_v
      |    AND a.doc_id < b.doc_id),
      |ver AS (
      |  SELECT DISTINCT da, db FROM cand WHERE bit_count(xor(ha, hb)) <= 6),
      |partners AS (
      |  SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_partners FROM (
      |    SELECT da AS doc_id FROM ver UNION ALL SELECT db FROM ver)
      |  GROUP BY doc_id),
      |vh AS (
      |  SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_frames,
      |    MIN(fhash) AS min_fhash
      |  FROM fh GROUP BY doc_id)
      |SELECT vh.doc_id, vh.n_frames, vh.min_fhash,
      |  COALESCE(p.n_partners, 0) AS n_partners
      |FROM vh LEFT JOIN partners p USING (doc_id)
      |ORDER BY vh.doc_id""".stripMargin) { (s, d) =>
    import s.implicits._
    val frames = Tables.documents(s, d)
      .filter(col("doc_id") % 3 === 2)
      .select(col("doc_id"), col("text"), col("n_chars"))
      .as[(Long, String, Long)]
      .mapPartitions(_.flatMap { case (id, text, nChars) =>
        val payload = encodeContainer(id, nChars,
          text.getBytes(java.nio.charset.StandardCharsets.UTF_8))
        // walk the stream by each frame header's own size field
        // (geometry-validated) and dHash every frame at its offset —
        // no per-frame copies
        MediaCodecs.bmpStreamOffsets(payload).zipWithIndex.map {
          case (o, f) => (id, f, MediaCodecs.dHash56At(payload, o))
        }
      }).toDF("doc_id", "f", "fhash")
    frameDedup(frames)
  }

  /** Incremental media dedup against a PERSISTENT fingerprint index —
    * the q65/q78 daily-ingest shape for images (and, unchanged, any
    * other 56-bit fingerprint): the corpus's band rows
    * ([[phashBands]]) are built once and stored; each ingest batch
    * hashes ONLY its own images, computes its own band rows, and
    * joins increment-side bands against index ∪ increment —
    * index×increment and increment×increment candidates, NEVER
    * index×index. Pair orientation comes from a SIDE TAG, not from
    * doc_id ordering (ADVICE r14: the former da < db orientation
    * silently dropped index-vs-increment pairs whenever an index id
    * exceeded an increment id — a precondition only q289's cut
    * happened to satisfy): an index-side row pairs with every
    * colliding increment row (it can never appear on the right, so
    * each such pair exists exactly once), while increment-side rows
    * keep da < db to emit each within-increment pair once. No id
    * ordering between index and increment is assumed. Hamming verify
    * as everywhere; output is one row per INCREMENT image with its
    * hash and its verified partner count over the whole corpus.
    */
  def phashIndexDedup(indexBands: DataFrame, incHashes: DataFrame,
      maxHamming: Int = 6): DataFrame = {
    val inc = incHashes
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val incBands = phashBands(inc.select(col("doc_id"), col("phash").as("h")))
    val ver = indexBands.withColumn("a_inc", lit(0))
      .unionByName(incBands.withColumn("a_inc", lit(1)))
      .select(col("band_i"), col("band_v"),
        col("doc_id").as("da"), col("h").as("ha"), col("a_inc"))
      .join(incBands.select(col("band_i"), col("band_v"),
        col("doc_id").as("db"), col("h").as("hb")),
        Seq("band_i", "band_v"))
      .filter(col("a_inc") === 0 || col("da") < col("db"))
      .select(col("da"), col("db"), col("ha"), col("hb")).distinct()
      .filter(expr(s"bit_count(ha ^ hb) <= $maxHamming"))
      .select(col("da"), col("db"))
    // partner counts for increment docs only — an increment doc can sit
    // on the da side of an increment×increment pair, so count both
    // directions, da restricted to increment membership
    val partners = ver.select(col("da").as("doc_id"))
      .join(inc.select(col("doc_id")), Seq("doc_id"), "left_semi")
      .unionByName(ver.select(col("db").as("doc_id")))
      .groupBy(col("doc_id")).agg(count(lit(1)).as("n_partners"))
    inc.join(partners, Seq("doc_id"), "left")
      .select(col("doc_id"), col("phash"),
        coalesce(col("n_partners"), lit(0L)).as("n_partners"))
      .orderBy(col("doc_id"))
  }

  /** Closes the q289 ingest loop (VERDICT r14 item 3): the increment's
    * own band rows appended to the persistent index after matching, so
    * the NEXT day's batch matches against everything ingested so far —
    * day N+1's `phashIndexDedup(append(index, dayN), dayN+1)` is
    * certified ≡ a fresh full index build by MultimodalSpec (the q175
    * incremental-IVF precedent). The appended frame has exactly the
    * persisted index shape ([[phashBands]] rows), so the caller
    * parquets it back over the old index; nothing is re-hashed — the
    * increment's bands are the same 4 rows × 20 bytes per image the
    * match step already computed.
    */
  def phashIndexAppend(indexBands: DataFrame, incHashes: DataFrame): DataFrame =
    indexBands.unionByName(
      phashBands(incHashes.select(col("doc_id"), col("phash").as("h"))))

  /** Per-JVM memo of persistent-index locations keyed by (corpus dir,
    * cut) — the q78 accounting: a persistent index is built once
    * (charged to the setup ledger) and queried per increment; the
    * hashes are deterministic, so the memoized index is bit-identical
    * to a fresh build.
    */
  private val phashIndexMemo =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  /** q289: the image-ingest path end to end — band rows of the
    * existing image corpus persisted to parquet (build memoized, the
    * q78 discipline), the newest-10% batch hashed fresh and matched
    * increment-vs-index + within-increment. The oracle replays the
    * full hash/band/verify pipeline with pairs restricted to
    * max-side-in-increment, so the persisted index must reproduce the
    * one-shot answer exactly or the gate fails (the q78 certificate).
    */
  val q289: QueryDef = QueryDef.checked(
    "q289_phash_index_dedup",
    """WITH img AS (
      |  SELECT doc_id, GREATEST(octet_length(encode(text)), 1) AS tl,
      |    COALESCE(NULLIF(hex(encode(text)), ''), '00') AS hx,
      |    CAST(4 + n_chars % 29 AS INT) AS w,
      |    CAST(4 + (n_chars // 29) % 13 AS INT) AS h,
      |    CAST(((3 * (4 + n_chars % 29) + 3) // 4) * 4 AS INT) AS stride
      |  FROM documents WHERE doc_id % 3 = 0),
      |cut AS (SELECT (MAX(doc_id) + 1) * 9 // 10 AS c FROM img),
      |bits AS (
      |  SELECT doc_id, CAST(r AS INT) AS r, CAST(c AS INT) AS c,
      |    (('0x' || substr(hx, 2 * CAST(((r * h // 8) * stride + 3 * (c * w // 8)) % tl AS INT) + 1, 2))::INT
      |     + ('0x' || substr(hx, 2 * CAST((((r * h // 8) * stride + 3 * (c * w // 8)) + 1) % tl AS INT) + 1, 2))::INT
      |     + ('0x' || substr(hx, 2 * CAST((((r * h // 8) * stride + 3 * (c * w // 8)) + 2) % tl AS INT) + 1, 2))::INT) // 3 AS g1,
      |    (('0x' || substr(hx, 2 * CAST(((r * h // 8) * stride + 3 * ((c + 1) * w // 8)) % tl AS INT) + 1, 2))::INT
      |     + ('0x' || substr(hx, 2 * CAST((((r * h // 8) * stride + 3 * ((c + 1) * w // 8)) + 1) % tl AS INT) + 1, 2))::INT
      |     + ('0x' || substr(hx, 2 * CAST((((r * h // 8) * stride + 3 * ((c + 1) * w // 8)) + 2) % tl AS INT) + 1, 2))::INT) // 3 AS g2
      |  FROM img,
      |    unnest(generate_series(0, 7)) AS rr(r),
      |    unnest(generate_series(0, 6)) AS cc(c)),
      |ph AS (
      |  SELECT doc_id,
      |    CAST(SUM(CASE WHEN g2 > g1
      |      THEN 1::BIGINT << CAST(r * 7 + c AS INT) ELSE 0 END) AS BIGINT)
      |      AS phash
      |  FROM bits GROUP BY doc_id),
      |bands AS (
      |  SELECT doc_id, phash, CAST(i AS INT) AS band_i,
      |    CAST((phash >> CAST(14 * i AS INT)) & 16383 AS BIGINT) AS band_v
      |  FROM ph, unnest(generate_series(0, 3)) AS bi(i)),
      |cand AS (
      |  SELECT DISTINCT a.doc_id AS da, b.doc_id AS db,
      |    a.phash AS ha, b.phash AS hb
      |  FROM bands a JOIN bands b
      |    ON a.band_i = b.band_i AND a.band_v = b.band_v
      |    AND a.doc_id < b.doc_id
      |  WHERE b.doc_id >= (SELECT c FROM cut)),
      |ver AS (SELECT da, db FROM cand WHERE bit_count(xor(ha, hb)) <= 6),
      |partners AS (
      |  SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_partners FROM (
      |    SELECT da AS doc_id FROM ver WHERE da >= (SELECT c FROM cut)
      |    UNION ALL SELECT db FROM ver)
      |  GROUP BY doc_id)
      |SELECT ph.doc_id, ph.phash, COALESCE(p.n_partners, 0) AS n_partners
      |FROM ph LEFT JOIN partners p USING (doc_id)
      |WHERE ph.doc_id >= (SELECT c FROM cut)
      |ORDER BY ph.doc_id""".stripMargin) { (s, d) =>
    import s.implicits._
    val imgDocs = Tables.documents(s, d)
      .filter(col("doc_id") % 3 === 0)
      .select(col("doc_id"), col("text"), col("n_chars"))
    // null-guarded (ADVICE r14): an empty image slice makes max() NULL;
    // cut 0 then routes everything (i.e. nothing) to the increment side,
    // mirroring the oracle's empty-img-CTE behavior instead of an NPE —
    // the q221/normalizeCharsCols empty-source discipline.
    val maxRow = imgDocs.agg(max(col("doc_id"))).head()
    val cut =
      if (maxRow.isNullAt(0)) 0L else (maxRow.getLong(0) + 1L) * 9L / 10L
    def hashed(df: DataFrame): DataFrame = df
      .as[(Long, String, Long)]
      .mapPartitions(_.map { case (id, text, nChars) =>
        val payload = encodeContainer(id, nChars,
          text.getBytes(java.nio.charset.StandardCharsets.UTF_8))
        (id, MediaCodecs.dHash56(payload))
      }).toDF("doc_id", "phash")
    val idxPath = phashIndexMemo.computeIfAbsent(s"$d#$cut",
      k => graft.operators.Exact.memoBuild(s"phidx#$k") {
        val tmp = java.nio.file.Files
          .createTempDirectory(graft.operators.Exact.fmtRoot, "phidx_")
          .toAbsolutePath.toString
        phashBands(hashed(imgDocs.filter(col("doc_id") < cut))
            .select(col("doc_id"), col("phash").as("h")))
          .write.mode("overwrite").parquet(s"$tmp/bands")
        s"$tmp/bands"
      })
    phashIndexDedup(s.read.parquet(idxPath),
      hashed(imgDocs.filter(col("doc_id") >= cut)))
  }

  /** SHIFT-TOLERANT audio near-dup detection — content-anchored
    * fingerprints ([[graft.functions.MediaCodecs.anchorHashes56Wav]]:
    * md5-CDC anchor placement + 57-energy comparator windows) run
    * through the UNCHANGED banded-Hamming operator with q288's
    * any-frame-pair semantics: two clips pair when ANY of their
    * anchored windows collide within the Hamming budget. This is the
    * recall path q287's whole-clip fingerprint cannot provide (its
    * index-proportional windows make one inserted sample flip every
    * downstream window — documented there): anchors move WITH the
    * content, so byte-shifted duplicates collide at Hamming 0 and an
    * edit loses only the anchors it touches.
    *
    * Input: `frames` = (doc_id, i, fhash) anchor rows; `clips` = the
    * full clip list (anchor-less clips still get an output row).
    * Output: one row per clip with its anchor count and verified
    * partner count.
    *
    * Scale shape: hashing is partition-local inside the decode pass;
    * the band join exchanges 4 rows × 20 bytes per ANCHOR (density
    * 1/32 of samples — ~n/8 bytes per clip, narrower than the clip
    * itself); verify touches only band-colliding pairs; anchor pairs
    * de-dup to clip pairs before counting. Never all-pairs.
    */
  def audioAnchorDedup(frames: DataFrame, clips: DataFrame,
      maxHamming: Int = 6): DataFrame = {
    val fh = frames
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val ver = bandedHammingPairs(fh.select(col("doc_id"),
        col("fhash").as("h")), maxHamming)
      .distinct() // anchor pairs -> clip pairs
    val partners = ver.select(col("da").as("doc_id"))
      .unionByName(ver.select(col("db").as("doc_id")))
      .groupBy(col("doc_id")).agg(count(lit(1)).as("n_partners"))
    clips.select(col("doc_id"))
      .join(fh.groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_anchors")), Seq("doc_id"), "left")
      .join(partners, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_anchors"), lit(0L)).as("n_anchors"),
        coalesce(col("n_partners"), lit(0L)).as("n_partners"))
      .orderBy(col("doc_id"))
  }

  /** q291: shift-tolerant audio dedup over the WHOLE corpus rendered
    * as PCM clips ([[encodeWavClip]] — every document, not just the
    * doc_id%3 audio slice, so the corpus's planted near-dup texts
    * become genuinely byte-shifted/edited sample streams and the
    * operator's recall is demonstrated on real data at both sfs:
    * unlike q287, partner counts here are NONZERO). The oracle
    * replays anchor placement (md5 over the |sample| key string),
    * window energies, and the identical banding from the generation
    * formulas, so a corrupted chunk walker, anchor scan, energy
    * comparator, or band split breaks the hash.
    */
  val q291: QueryDef = QueryDef.checked(
    "q291_audio_anchor_dedup",
    """WITH aud AS (
      |  SELECT doc_id, GREATEST(octet_length(encode(text)), 1) AS tl,
      |    COALESCE(NULLIF(hex(encode(text)), ''), '00') AS hx,
      |    CAST(LEAST(n_chars, 4096) AS BIGINT) AS n
      |  FROM documents),
      |samp AS (
      |  SELECT doc_id, CAST(i AS BIGINT) AS i,
      |    ABS((('0x' || substr(hx, 2 * CAST(i % tl AS INT) + 1, 2))::INT - 128) * 256) AS a
      |  FROM aud, unnest(generate_series(0, n - 1)) AS u(i)
      |  WHERE n > 0),
      |keyed AS (
      |  SELECT doc_id, i, a,
      |    lag(a, 3) OVER w AS a3, lag(a, 2) OVER w AS a2, lag(a, 1) OVER w AS a1
      |  FROM samp WINDOW w AS (PARTITION BY doc_id ORDER BY i)),
      |anch AS (
      |  SELECT k.doc_id, k.i
      |  FROM keyed k JOIN aud ON aud.doc_id = k.doc_id
      |  WHERE k.a3 IS NOT NULL AND k.i + 114 < aud.n
      |    AND ('0x' || substr(md5(k.a3 || ',' || k.a2 || ',' || k.a1 || ',' || k.a), 1, 8))::BIGINT % 32 = 0),
      |en AS (
      |  SELECT an.doc_id, an.i, CAST(k AS INT) AS k,
      |    ABS((('0x' || substr(hx, 2 * CAST((an.i + 1 + 2*k) % tl AS INT) + 1, 2))::INT - 128) * 256)
      |    + ABS((('0x' || substr(hx, 2 * CAST((an.i + 2 + 2*k) % tl AS INT) + 1, 2))::INT - 128) * 256) AS e
      |  FROM anch an JOIN aud USING (doc_id), unnest(generate_series(0, 56)) AS g(k)),
      |fh AS (
      |  SELECT doc_id, i,
      |    CAST(SUM(CASE WHEN e_next > e THEN 1::BIGINT << k ELSE 0 END) AS BIGINT) AS fhash
      |  FROM (SELECT doc_id, i, k, e,
      |          lead(e) OVER (PARTITION BY doc_id, i ORDER BY k) AS e_next FROM en)
      |  WHERE k <= 55 GROUP BY doc_id, i),
      |bands AS (
      |  SELECT doc_id, fhash, CAST(bi AS INT) AS band_i,
      |    CAST((fhash >> CAST(14 * bi AS INT)) & 16383 AS BIGINT) AS band_v
      |  FROM fh, unnest(generate_series(0, 3)) AS b(bi)),
      |cand AS (
      |  SELECT DISTINCT a.doc_id AS da, b.doc_id AS db, a.fhash AS ha, b.fhash AS hb
      |  FROM bands a JOIN bands b
      |    ON a.band_i = b.band_i AND a.band_v = b.band_v AND a.doc_id < b.doc_id),
      |ver AS (SELECT DISTINCT da, db FROM cand WHERE bit_count(xor(ha, hb)) <= 6),
      |partners AS (
      |  SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_partners FROM (
      |    SELECT da AS doc_id FROM ver UNION ALL SELECT db FROM ver)
      |  GROUP BY doc_id),
      |na AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_anchors FROM anch GROUP BY doc_id)
      |SELECT aud.doc_id, COALESCE(na.n_anchors, 0) AS n_anchors,
      |  COALESCE(p.n_partners, 0) AS n_partners
      |FROM aud LEFT JOIN na USING (doc_id) LEFT JOIN partners p USING (doc_id)
      |ORDER BY aud.doc_id""".stripMargin) { (s, d) =>
    import s.implicits._
    val docs = Tables.documents(s, d)
      .select(col("doc_id"), col("text"), col("n_chars"))
    val frames = docs
      .as[(Long, String, Long)]
      .mapPartitions(_.flatMap { case (id, text, nChars) =>
        val payload = encodeWavClip(nChars,
          text.getBytes(java.nio.charset.StandardCharsets.UTF_8))
        MediaCodecs.anchorHashes56Wav(payload).map {
          case (i, h) => (id, i, h)
        }
      }).toDF("doc_id", "i", "fhash")
    audioAnchorDedup(frames, docs.select(col("doc_id")))
  }
}
