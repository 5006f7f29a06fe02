package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.functions.MediaCodecs
import graft.operators.{Multimodal, MediaRecord}

/** Golden tests for the real media codecs behind q39: hand-built
  * containers with known bytes, decoded through the independent parsers.
  * These certify the CONTENT features (mean pixel level, mean amplitude,
  * zero crossings) that the q39 oracle cannot replay (the oracle checks
  * the header geometry round-trip).
  */
class MultimodalSpec extends AnyFunSuite {

  test("BMP round-trip: header fields and pixel mean, padding excluded") {
    // width 2 → rowBytes = 8: 6 pixel bytes + 2 padding bytes per row.
    // Pixel bytes all 10; padding positions get 0xFF via the generator —
    // a decoder that forgets the stride would average them in.
    val w = 2; val h = 2
    val rowBytes = MediaCodecs.bmpRowBytes(w)
    assert(rowBytes === 8)
    val bmp = MediaCodecs.encodeBmp(w, h,
      i => if (i % rowBytes < 3 * w) 10.toByte else 0xFF.toByte)
    assert(bmp.length === MediaCodecs.bmpFileSize(w, h))
    val f = MediaCodecs.decodeBmp(bmp, 0)
    assert(f.width === 2 && f.height === 2 && f.bpp === 24)
    assert(f.fileSize === bmp.length)
    assert(f.meanLevel === 10.0) // padding 0xFF excluded
  }

  test("BMP stream splits on each header's own size field") {
    val a = MediaCodecs.encodeBmp(2, 2, _ => 1.toByte)
    val b = MediaCodecs.encodeBmp(3, 1, _ => 2.toByte)
    val c = MediaCodecs.encodeBmp(1, 4, _ => 3.toByte)
    val frames = MediaCodecs.decodeBmpStream(a ++ b ++ c)
    assert(frames.map(fr => (fr.width, fr.height)) ===
      Seq((2, 2), (3, 1), (1, 4)))
    assert(frames.map(_.meanLevel) === Seq(1.0, 2.0, 3.0))
  }

  test("BMP parser rejects bad magic and foreign profiles") {
    val ok = MediaCodecs.encodeBmp(2, 2, _ => 0.toByte)
    val badMagic = ok.clone(); badMagic(0) = 'X'.toByte
    intercept[IllegalArgumentException](MediaCodecs.decodeBmp(badMagic, 0))
    val badBpp = ok.clone(); badBpp(28) = 8.toByte // 8 bpp: not our profile
    intercept[IllegalArgumentException](MediaCodecs.decodeBmp(badBpp, 0))
    intercept[IllegalArgumentException](
      MediaCodecs.decodeBmp(ok.take(20), 0)) // truncated header
  }

  test("BMP parser rejects dims whose byte extent overflows Long") {
    // width = height = 2^31 - 1: rowBytes*height ≈ 1.38e19 wraps past
    // Long.MaxValue, so a product-form bound would pass and the pixel
    // walk would index out of bounds; the division-form bound must
    // reject it as a header error instead.
    val ok = MediaCodecs.encodeBmp(2, 2, _ => 0.toByte)
    val evil = ok.clone()
    def putLe32(b: Array[Byte], off: Int, v: Int): Unit = {
      b(off) = v.toByte; b(off + 1) = (v >>> 8).toByte
      b(off + 2) = (v >>> 16).toByte; b(off + 3) = (v >>> 24).toByte
    }
    putLe32(evil, 18, Int.MaxValue) // width
    putLe32(evil, 22, Int.MaxValue) // height
    val e = intercept[IllegalArgumentException](MediaCodecs.decodeBmp(evil, 0))
    assert(e.getMessage.contains("past frame end"))
  }

  test("WAV round-trip: format fields, meanAbs, zero crossings") {
    val samples = Array[Short](100, -200, 300, 0, -1)
    val wav = MediaCodecs.encodeWavPcm16Mono(8000, samples)
    assert(wav.length === 44 + 10)
    val a = MediaCodecs.decodeWav(wav)
    assert(a.channels === 1 && a.sampleRate === 8000 && a.bitsPerSample === 16)
    assert(a.nSamples === 5L)
    assert(a.meanAbs === (100 + 200 + 300 + 0 + 1) / 5.0)
    // sign path +,-,+,(0 skipped),- → three crossings
    assert(a.zeroCrossings === 3L)
  }

  test("WAV chunk walk skips unknown chunks in any position") {
    val base = MediaCodecs.encodeWavPcm16Mono(8000, Array[Short](5, -5))
    // splice an unknown 6-byte 'LIST' chunk between fmt and data
    // (RIFF grammar: readers skip unrecognized chunks by declared size)
    val head = base.take(36) // RIFF..fmt chunk end
    val tail = base.drop(36) // data chunk
    val junk = Array[Byte]('L', 'I', 'S', 'T', 6, 0, 0, 0, 1, 2, 3, 4, 5, 6)
    val spliced = head ++ junk ++ tail
    // fix the RIFF size field for the inserted bytes
    val riffSize = spliced.length - 8
    spliced(4) = riffSize.toByte; spliced(5) = (riffSize >>> 8).toByte
    spliced(6) = (riffSize >>> 16).toByte; spliced(7) = (riffSize >>> 24).toByte
    val a = MediaCodecs.decodeWav(spliced)
    assert(a.nSamples === 2L && a.meanAbs === 5.0 && a.zeroCrossings === 1L)
  }

  test("encodeContainer/decodeContainer geometry matches the q39 formulas") {
    val text = "abc".getBytes("UTF-8")
    for (nChars <- Seq(0L, 48L, 100L, 553L, 5000L)) {
      val (w, h) = Multimodal.bmpDims(nChars)
      // image (doc_id % 3 == 0)
      val img = Multimodal.decodeContainer(MediaRecord(0L, "image",
        Multimodal.encodeContainer(0L, nChars, text), Map.empty))
      assert((img.width, img.height, img.n_frames) === ((w, h, 1)))
      assert(img.n_bytes === MediaCodecs.bmpFileSize(w, h).toLong)
      // audio (doc_id % 3 == 1)
      val aud = Multimodal.decodeContainer(MediaRecord(1L, "audio",
        Multimodal.encodeContainer(1L, nChars, text), Map.empty))
      assert(aud.n_samples === Multimodal.wavSamples(nChars).toLong)
      assert(aud.sample_rate === Multimodal.WavRate)
      assert(aud.n_bytes === 44L + 2L * Multimodal.wavSamples(nChars))
      // video (doc_id % 3 == 2)
      val vid = Multimodal.decodeContainer(MediaRecord(2L, "video",
        Multimodal.encodeContainer(2L, nChars, text), Map.empty))
      assert(vid.n_frames === Multimodal.videoFrames(nChars))
      assert(vid.n_bytes ===
        Multimodal.videoFrames(nChars).toLong * MediaCodecs.bmpFileSize(w, h))
    }
  }

  test("image content feature: pixel mean equals the text-byte cycle mean") {
    // nChars = 0 → 4×4 BMP, rowBytes = ((12+3)/4)*4 = 12: no padding, so
    // all 48 data bytes cycle over "ab" (97, 98) → exact mean 97.5
    val feats = Multimodal.decodeContainer(MediaRecord(0L, "image",
      Multimodal.encodeContainer(0L, 0L, "ab".getBytes("UTF-8")), Map.empty))
    assert((feats.width, feats.height) === ((4, 4)))
    assert(feats.mean_level === 97.5)
  }

  // ---- cross-implementation fuzz: JDK encoders → our parsers --------
  // The golden tests above certify the parsers against bytes THIS repo
  // wrote; these certify them against an INDEPENDENT implementation of
  // the same published formats (javax.imageio's BMP writer,
  // javax.sound.sampled's WAVE writer — JDK builtins, no new deps), so
  // a shared misreading of the spec can't hide in a self-round-trip.

  test("fuzz: ImageIO-encoded BMPs decode with exact geometry and pixel mean") {
    val rnd = new scala.util.Random(1789)
    (0 until 12).foreach { trial =>
      val w = 1 + rnd.nextInt(40)
      val h = 1 + rnd.nextInt(30)
      val img = new java.awt.image.BufferedImage(
        w, h, java.awt.image.BufferedImage.TYPE_3BYTE_BGR)
      var sum = 0L
      (0 until h).foreach { y =>
        (0 until w).foreach { x =>
          val (r, g, b) = (rnd.nextInt(256), rnd.nextInt(256), rnd.nextInt(256))
          sum += r + g + b
          img.setRGB(x, y, (r << 16) | (g << 8) | b)
        }
      }
      val baos = new java.io.ByteArrayOutputStream()
      assert(javax.imageio.ImageIO.write(img, "bmp", baos),
        "JDK has no BMP writer?")
      val bytes = baos.toByteArray
      val f = MediaCodecs.decodeBmp(bytes, 0)
      assert(f.width === w && f.height === h && f.bpp === 24,
        s"trial $trial: geometry ${f.width}x${f.height}@${f.bpp} != ${w}x$h@24")
      // mean over pixel COMPONENT bytes is row-order-invariant, so
      // bottom-up storage and BGR channel order cannot mask a stride bug
      val expected = sum.toDouble / (3L * w * h)
      assert(math.abs(f.meanLevel - expected) < 1e-9,
        s"trial $trial: meanLevel ${f.meanLevel} != $expected")
    }
  }

  test("patchManifest: edge clipping and bottom-up byte offsets, hand-computed") {
    val spark = TestSpark.spark
    import spark.implicits._
    // 6x5 image, 4x4 patches -> 2x2 grid with clipped edges
    // (patch_w: 4,2; patch_h: 4,1). stride = ((3*6+3) div 4)*4 = 20.
    // byte_off(pr,pc) = 54 + (5-1-pr*4)*20 + 3*pc*4:
    //   (0,0): 54+4*20= 134   (0,1): 134+12 = 146
    //   (1,0): 54+0*20 = 54   (1,1): 66
    val imgs = Seq((7L, 6, 5, 54)).toDF("doc_id", "w", "h", "data_off")
    val out = Multimodal.patchManifest(imgs).collect()
      .map(r => (r.getInt(3), r.getInt(4), r.getInt(5), r.getInt(6),
        r.getLong(7)))
    assert(out === Array(
      (0, 0, 4, 4, 134L), (0, 1, 2, 4, 146L),
      (1, 0, 4, 1, 54L), (1, 1, 2, 1, 66L)))
    // header-parse certificate: the geometry q282 feeds comes from the
    // real header bytes, not the generation formulas
    val payload = MediaCodecs.encodeBmp(6, 5, _ => 1)
    val hd = MediaCodecs.decodeBmpHeader(payload, 0)
    assert((hd.width, hd.height, hd.dataOff) === ((6, 5, 54)))
  }

  test("dHash56: hand-computed bits on engineered gradients") {
    // constant image: every sampled gray equal -> no comparison fires
    assert(MediaCodecs.dHash56(MediaCodecs.encodeBmp(8, 8, _ => 7)) === 0L)
    // 8x8, stride 24 (3*8 pixel bytes, no padding). One bright pixel at
    // array row 0, x=7: gray(7,0)=90 > gray(x,0)=30 elsewhere. Sampled
    // row r=0 maps to array row 0 only for r=0 (r*8/8 = r). Column
    // samples x_c = c. Only comparison (r=0, c=6): g(7) > g(6) -> bit
    // r*7+c = 6. All other rows constant.
    val bmp = MediaCodecs.encodeBmp(8, 8, i =>
      if (i < 24 && i / 3 == 7) 90.toByte else 30.toByte)
    assert(MediaCodecs.dHash56(bmp) === (1L << 6))
    // descending gradient on row 0: g decreasing -> no g2 > g1 bit; and
    // ascending -> all 7 bits of row 0
    val asc = MediaCodecs.encodeBmp(8, 8, i =>
      if (i < 24) (10 * (i / 3)).toByte else 5.toByte)
    assert(MediaCodecs.dHash56(asc) === 0x7fL)
  }

  test("phashDedup: planted duplicates found, banding bounds honest") {
    val spark = TestSpark.spark
    import spark.implicits._
    // literal hashes exercise the band/verify logic directly:
    //  - 10 and 11: identical (hamming 0) -> partners
    //  - 20 and 21: 3 flips, all in band 0 -> >=1 intact band, found
    //  - 30 and 31: 4 flips spread one per band -> NO shared band, the
    //    documented pigeonhole miss (recall trade, mirrored by oracle)
    //  - 40 and 41: share bands 1..3 but hamming 14 (> 6) -> candidate
    //    generated, verify filters it
    val h10 = 0x31415926535897L
    val h20 = 0x123456789abcL
    val h21 = h20 ^ 0x7L // 3 flips in band 0
    val h30 = 0x0fedcba98765L
    val h31 = h30 ^ ((1L << 0) | (1L << 14) | (1L << 28) | (1L << 42))
    val h40 = 0x0deadbeef135L
    val h41 = h40 ^ 0x3fffL // 14 flips, all in band 0
    val imgs = Seq(
      (10L, h10), (11L, h10), (20L, h20), (21L, h21),
      (30L, h30), (31L, h31), (40L, h40), (41L, h41)
    ).toDF("doc_id", "phash")
    val out = Multimodal.phashDedup(imgs).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(out === Map(10L -> 1L, 11L -> 1L, 20L -> 1L, 21L -> 1L,
      30L -> 0L, 31L -> 0L, 40L -> 0L, 41L -> 0L))
    spark.catalog.clearCache()
  }

  test("phashDedup end-to-end: identical texts yield identical images and pair up") {
    val spark = TestSpark.spark
    import spark.implicits._
    val text = "the quick brown fox jumps over the lazy dog"
    val other = "a completely different document body with other bytes"
    val imgs = Seq((0L, text), (3L, text), (6L, other))
      .toDF("doc_id", "text")
      .withColumn("n_chars", org.apache.spark.sql.functions
        .length(org.apache.spark.sql.functions.col("text")).cast("long"))
      .as[(Long, String, Long)]
      .mapPartitions(_.map { case (id, t, n) =>
        val payload = Multimodal.encodeContainer(id, n,
          t.getBytes(java.nio.charset.StandardCharsets.UTF_8))
        (id, MediaCodecs.dHash56(payload))
      }).toDF("doc_id", "phash")
    val out = Multimodal.phashDedup(imgs).collect()
      .map(r => (r.getLong(0), r.getLong(2)))
    assert(out === Array((0L, 1L), (3L, 1L), (6L, 0L)))
    spark.catalog.clearCache()
  }

  test("aHash56Wav: hand-computed energy-difference bits") {
    // 57 samples -> window k = i (one sample per window), E_k = |s_k|
    def wav(f: Int => Short) =
      MediaCodecs.encodeWavPcm16Mono(8000, Array.tabulate(57)(f))
    // constant energies: no comparison fires
    assert(MediaCodecs.aHash56Wav(wav(_ => 100)) === 0L)
    // strictly increasing energies: all 56 bits
    assert(MediaCodecs.aHash56Wav(wav(i => ((i + 1) * 100).toShort)) ===
      (1L << 56) - 1L)
    // one spike at window 7: only E(7) > E(6) fires (bit 6); E(8) < E(7)
    // clears bit 7; everything else equal
    assert(MediaCodecs.aHash56Wav(
      wav(i => if (i == 7) 1000 else 100)) === (1L << 6))
    // sign-insensitivity: energies use |s|
    assert(MediaCodecs.aHash56Wav(
      wav(i => if (i == 7) -1000 else 100)) === (1L << 6))
    // empty data chunk: fingerprint 0
    assert(MediaCodecs.aHash56Wav(
      MediaCodecs.encodeWavPcm16Mono(8000, Array.empty[Short])) === 0L)
  }

  test("audio fingerprint dedup: planted identical clips pair up") {
    val spark = TestSpark.spark
    import spark.implicits._
    val text = "repeated audio clip body with some words"
    val other = "an entirely different clip whose energies differ"
    val clips = Seq((1L, text), (4L, text), (7L, other))
      .toDF("doc_id", "text")
      .withColumn("n_chars", org.apache.spark.sql.functions
        .length(org.apache.spark.sql.functions.col("text")).cast("long"))
      .as[(Long, String, Long)]
      .mapPartitions(_.map { case (id, t, n) =>
        val payload = Multimodal.encodeContainer(id, n,
          t.getBytes(java.nio.charset.StandardCharsets.UTF_8))
        (id, MediaCodecs.aHash56Wav(payload))
      }).toDF("doc_id", "phash")
    val out = Multimodal.phashDedup(clips).collect()
      .map(r => (r.getLong(0), r.getLong(2)))
    assert(out === Array((1L, 1L), (4L, 1L), (7L, 0L)))
    spark.catalog.clearCache()
  }

  test("dHash56At: in-place frame hashing equals standalone hashing") {
    val a = MediaCodecs.encodeBmp(8, 8, i =>
      if (i < 24 && i / 3 == 7) 90.toByte else 30.toByte)
    val b = MediaCodecs.encodeBmp(8, 8, i =>
      if (i < 24) (10 * (i / 3)).toByte else 5.toByte)
    val stream = a ++ b
    assert(MediaCodecs.dHash56At(stream, 0) === MediaCodecs.dHash56(a))
    assert(MediaCodecs.dHash56At(stream, a.length) === MediaCodecs.dHash56(b))
  }

  test("frameDedup: shared frame links videos, multi-frame matches count once") {
    val spark = TestSpark.spark
    import spark.implicits._
    val h1 = 0x31415926535897L
    val h2 = 0x123456789abcL
    val hX = 0x0fedcba98765L
    val hY = h1 ^ ((1L << 0) | (1L << 14) | (1L << 28) | (1L << 42)) // no shared band with h1
    // A{h1,h2} and B{h1,h2}: TWO matching frame pairs -> ONE video pair.
    // C{hY}: 4 flips spread one per band vs h1 -> no candidate.
    val frames = Seq(
      (10L, 0, h1), (10L, 1, h2),
      (20L, 0, h2), (20L, 1, h1),
      (30L, 0, hY), (31L, 0, hX)
    ).toDF("doc_id", "f", "fhash")
    val out = Multimodal.frameDedup(frames).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(3)))
    assert(out === Array((10L, 2L, 1L), (20L, 2L, 1L), (30L, 1L, 0L),
      (31L, 1L, 0L)))
    spark.catalog.clearCache()
  }

  test("video frame dedup end-to-end: identical texts pair, frame order ignored") {
    val spark = TestSpark.spark
    import spark.implicits._
    val text = "two videos rendered from the same document body"
    val other = "a different video source document with other frames"
    val frames = Seq((2L, text), (5L, text), (8L, other))
      .toDF("doc_id", "text")
      .withColumn("n_chars", org.apache.spark.sql.functions
        .length(org.apache.spark.sql.functions.col("text")).cast("long"))
      .as[(Long, String, Long)]
      .mapPartitions(_.flatMap { case (id, t, n) =>
        val payload = Multimodal.encodeContainer(id, n,
          t.getBytes(java.nio.charset.StandardCharsets.UTF_8))
        MediaCodecs.bmpStreamOffsets(payload).zipWithIndex.map {
          case (o, f) => (id, f, MediaCodecs.dHash56At(payload, o))
        }
      }).toDF("doc_id", "f", "fhash")
    val out = Multimodal.frameDedup(frames).collect()
      .map(r => (r.getLong(0), r.getLong(3)))
    assert(out === Array((2L, 1L), (5L, 1L), (8L, 0L)))
    spark.catalog.clearCache()
  }

  test("phashIndexDedup: index matches, within-increment matches, never index x index") {
    val spark = TestSpark.spark
    import spark.implicits._
    val hA = 0x31415926535897L
    val hB = hA ^ ((1L << 0) | (1L << 14) | (1L << 28) | (1L << 42)) // no shared band with hA
    def bandsOf(rows: (Long, Long)*) = rows.flatMap { case (id, h) =>
      (0 until 4).map(i => (id, h, i, (h >> (14 * i)) & 16383L))
    }.toDF("doc_id", "h", "band_i", "band_v")
    // index hit: increment doc 100 matches index doc 1; 101 matches nothing
    val out1 = Multimodal.phashIndexDedup(bandsOf((1L, hA)),
        Seq((100L, hA), (101L, hB)).toDF("doc_id", "phash")).collect()
      .map(r => (r.getLong(0), r.getLong(2)))
    assert(out1 === Array((100L, 1L), (101L, 0L)))
    // within-increment hit with an EMPTY index
    val out2 = Multimodal.phashIndexDedup(bandsOf(),
        Seq((100L, hA), (101L, hA)).toDF("doc_id", "phash")).collect()
      .map(r => (r.getLong(0), r.getLong(2)))
    assert(out2 === Array((100L, 1L), (101L, 1L)))
    // index x index pairs never surface: two identical INDEX docs, an
    // unrelated increment -> one output row, zero partners
    val out3 = Multimodal.phashIndexDedup(bandsOf((1L, hA), (2L, hA)),
        Seq((100L, hB)).toDF("doc_id", "phash")).collect()
      .map(r => (r.getLong(0), r.getLong(2)))
    assert(out3 === Array((100L, 0L)))
    // ADVICE-r14 orientation fix: index ids ABOVE increment ids — the
    // old da<db orientation silently dropped this pair; the side tag
    // must find it regardless of id order
    val out4 = Multimodal.phashIndexDedup(bandsOf((500L, hA)),
        Seq((7L, hA)).toDF("doc_id", "phash")).collect()
      .map(r => (r.getLong(0), r.getLong(2)))
    assert(out4 === Array((7L, 1L)))
    spark.catalog.clearCache()
  }

  test("ingest loop closes: append-then-match equals a fresh index rebuild") {
    val spark = TestSpark.spark
    import spark.implicits._
    // hand-built 56-bit hashes: hA/hA2 within Hamming 2 (share 3 bands),
    // hB shares no band with hA, hC is a third independent value
    val hA = 0x31415926535897L
    val hA2 = hA ^ 3L
    val hB = hA ^ ((1L << 0) | (1L << 14) | (1L << 28) | (1L << 42))
    val hC = 0x2718281828459L
    def bandsOf(rows: (Long, Long)*) = rows.flatMap { case (id, h) =>
      (0 until 4).map(i => (id, h, i, (h >> (14 * i)) & 16383L))
    }.toDF("doc_id", "h", "band_i", "band_v")
    def hashes(rows: (Long, Long)*) = rows.toDF("doc_id", "phash")
    val idx0 = bandsOf((1L, hA), (2L, hB))
    val day1 = hashes((10L, hA2), (11L, hC)) // 10 matches index doc 1
    val day2 = hashes((20L, hA), (21L, hC), (22L, hC))
    // day-1 match, then APPEND day 1's bands to the index
    val r1 = Multimodal.phashIndexDedup(idx0, day1).collect()
      .map(r => (r.getLong(0), r.getLong(2)))
    assert(r1 === Array((10L, 1L), (11L, 0L)))
    val idx1 = Multimodal.phashIndexAppend(idx0, day1)
    // day-2 against the appended index: 20 pairs with index 1 AND
    // day-1's 10 (Hamming 2); 21/22 pair with day-1's 11 and each other
    val viaAppend = Multimodal.phashIndexDedup(idx1, day2).collect()
      .map(r => (r.getLong(0), r.getLong(2)))
    assert(viaAppend === Array((20L, 2L), (21L, 2L), (22L, 2L)))
    // the q175 certificate: the appended index is indistinguishable
    // from a fresh full rebuild over everything ingested so far
    val rebuilt = bandsOf((1L, hA), (2L, hB), (10L, hA2), (11L, hC))
    val viaRebuild = Multimodal.phashIndexDedup(rebuilt, day2).collect()
      .map(r => (r.getLong(0), r.getLong(2)))
    assert(viaAppend === viaRebuild)
    // and appending is idempotent in shape: another append composes
    val idx2 = Multimodal.phashIndexAppend(idx1, day2)
    assert(idx2.count() === (2 + 2 + 3) * 4L)
    spark.catalog.clearCache()
  }

  test("anchorHashes56Wav: anchors shift with the content, hashes unchanged") {
    val rnd = new scala.util.Random(291)
    val body = Array.fill(1200)((rnd.nextInt(65536) - 32768).toShort)
    val junk = Array.fill(50)((rnd.nextInt(65536) - 32768).toShort)
    val a = MediaCodecs.encodeWavPcm16Mono(8000, body)
    val b = MediaCodecs.encodeWavPcm16Mono(8000, junk ++ body)
    val ha = MediaCodecs.anchorHashes56Wav(a)
    val hb = MediaCodecs.anchorHashes56Wav(b)
    assert(ha.nonEmpty, "1200 random samples should yield ~37 anchors")
    // every anchor of A whose window fits reappears in B at +50 with the
    // identical fingerprint — the shift-invariance contract
    val hbMap = hb.toMap
    ha.foreach { case (i, h) =>
      assert(hbMap.get(i + 50).contains(h),
        s"anchor at $i (hash $h) must reappear at ${i + 50} in the shifted clip")
    }
    // and the index-proportional whole-clip fingerprint is NOT shift
    // tolerant here (the q287 fragility q291 exists to fix)
    assert(MediaCodecs.aHash56Wav(a) !== MediaCodecs.aHash56Wav(b))
  }

  test("audioAnchorDedup: byte-shifted planted clips pair; q287 path misses them") {
    val spark = TestSpark.spark
    import spark.implicits._
    val rnd = new scala.util.Random(1291)
    val body = Array.fill(1000)((rnd.nextInt(65536) - 32768).toShort)
    val shift = Array.fill(37)((rnd.nextInt(65536) - 32768).toShort)
    def wav(s: Array[Short]) = MediaCodecs.encodeWavPcm16Mono(8000, s)
    val clips: Seq[(Long, Array[Byte])] = Seq(
      0L -> wav(body),
      1L -> wav(shift ++ body), // byte-shifted duplicate of 0
      2L -> wav(Array.fill(1000)((rnd.nextInt(65536) - 32768).toShort)),
      3L -> wav(Array.fill(1000)((rnd.nextInt(65536) - 32768).toShort)))
    val frames = clips.flatMap { case (id, p) =>
      MediaCodecs.anchorHashes56Wav(p).map { case (i, h) => (id, i, h) }
    }.toDF("doc_id", "i", "fhash")
    val clipIds = clips.map(_._1).toDF("doc_id")
    val out = operators.Multimodal.audioAnchorDedup(frames, clipIds)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toMap
    assert(out(0L) === 1L && out(1L) === 1L,
      s"shifted pair must be found: $out")
    assert(out(2L) === 0L && out(3L) === 0L)
    // the whole-clip q287 fingerprints of the pair differ beyond the
    // Hamming budget — the documented miss this operator fixes
    val d = java.lang.Long.bitCount(
      MediaCodecs.aHash56Wav(clips(0)._2) ^ MediaCodecs.aHash56Wav(clips(1)._2))
    assert(d > 6, s"whole-clip fingerprints should diverge (hamming $d)")
    spark.catalog.clearCache()
  }

  test("anchorHashes56Wav: single-sample edit loses only the anchors it touches") {
    val rnd = new scala.util.Random(2291)
    val body = Array.fill(1500)((rnd.nextInt(65536) - 32768).toShort)
    val edited = body.clone()
    edited(700) = (edited(700) ^ 0x5a5a).toShort
    val ha = MediaCodecs.anchorHashes56Wav(
      MediaCodecs.encodeWavPcm16Mono(8000, body))
    val hb = MediaCodecs.anchorHashes56Wav(
      MediaCodecs.encodeWavPcm16Mono(8000, edited)).toMap
    assert(ha.nonEmpty)
    // anchors whose key window and energy window both avoid sample 700
    // must survive byte-for-byte; the edit can only touch i in
    // [700-114, 700+3]
    val untouched = ha.filter { case (i, _) => i + 114 < 700 || i - 3 > 700 }
    assert(untouched.nonEmpty)
    untouched.foreach { case (i, h) =>
      assert(hb.get(i).contains(h), s"anchor at $i should survive the edit")
    }
  }

  test("fuzz: AudioSystem-encoded WAVs decode with exact sample statistics") {
    val rnd = new scala.util.Random(1848)
    (0 until 12).foreach { trial =>
      val n = 1 + rnd.nextInt(2000)
      val rate = Seq(8000, 16000, 44100)(rnd.nextInt(3))
      val samples = Array.fill(n)((rnd.nextInt(65536) - 32768).toShort)
      val pcm = new Array[Byte](2 * n)
      samples.zipWithIndex.foreach { case (s, i) =>
        pcm(2 * i) = s.toByte; pcm(2 * i + 1) = (s >> 8).toByte
      }
      val fmt = new javax.sound.sampled.AudioFormat(
        javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED,
        rate.toFloat, 16, 1, 2, rate.toFloat, false) // little-endian mono
      val ais = new javax.sound.sampled.AudioInputStream(
        new java.io.ByteArrayInputStream(pcm), fmt, n.toLong)
      val baos = new java.io.ByteArrayOutputStream()
      javax.sound.sampled.AudioSystem.write(ais,
        javax.sound.sampled.AudioFileFormat.Type.WAVE, baos)
      val a = MediaCodecs.decodeWav(baos.toByteArray)
      assert(a.channels === 1 && a.sampleRate === rate &&
        a.bitsPerSample === 16 && a.nSamples === n.toLong,
        s"trial $trial: format (${a.channels},${a.sampleRate}," +
          s"${a.bitsPerSample},${a.nSamples}) != (1,$rate,16,$n)")
      val expAbs = samples.map(s => math.abs(s.toInt).toLong).sum.toDouble / n
      assert(math.abs(a.meanAbs - expAbs) < 1e-9,
        s"trial $trial: meanAbs ${a.meanAbs} != $expAbs")
      var zc = 0L; var prev = 0
      samples.foreach { s =>
        val sg = Integer.signum(s.toInt)
        if (sg != 0) { if (prev != 0 && sg != prev) zc += 1; prev = sg }
      }
      assert(a.zeroCrossings === zc,
        s"trial $trial: zeroCrossings ${a.zeroCrossings} != $zc")
    }
  }
}
