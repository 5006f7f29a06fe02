package graft.functions

/** Pure-JVM media codecs for the multimodal column family: BMP
  * (BITMAPINFOHEADER, 24 bpp uncompressed) and WAV (RIFF PCM 16-bit) —
  * the two classic container formats parseable with nothing but
  * little-endian byte arithmetic, which is what this zero-dependency
  * sandbox allows. These are REAL parsers of the published formats
  * (BMP: the Windows BITMAPFILEHEADER/BITMAPINFOHEADER layout; WAV: the
  * RIFF chunk grammar), not shims: `decodeBmp` reads dimensions and the
  * pixel array through the header's own offsets and strides, and
  * `decodeWav` walks the chunk list (any chunk order, unknown chunks
  * skipped) — point them at a BMP/WAV produced by any other tool and
  * they work. The reference pipeline (govau/cga-logs-to-kinesis) moves
  * opaque log bytes and never decodes; this file is part of the
  * training-data-pipeline extension surface.
  *
  * Scale contract: all functions are row-local (no Spark imports) so
  * they run inside partition-batched `mapPartitions` tasks; a heavier
  * codec (JPEG/FLAC via JNI) would slot behind the same signatures.
  */
object MediaCodecs {

  // ---- little-endian primitives ------------------------------------

  private def le16(b: Array[Byte], off: Int): Int =
    (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8)
  private def le32(b: Array[Byte], off: Int): Int =
    (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8) |
      ((b(off + 2) & 0xff) << 16) | ((b(off + 3) & 0xff) << 24)
  private def putLe16(b: Array[Byte], off: Int, v: Int): Unit = {
    b(off) = v.toByte; b(off + 1) = (v >>> 8).toByte
  }
  private def putLe32(b: Array[Byte], off: Int, v: Int): Unit = {
    b(off) = v.toByte; b(off + 1) = (v >>> 8).toByte
    b(off + 2) = (v >>> 16).toByte; b(off + 3) = (v >>> 24).toByte
  }

  // ---- BMP ----------------------------------------------------------

  /** BMP row stride: pixel rows pad to 4-byte boundaries (format rule).
    * The Long form is the single stride definition; decode uses it
    * directly because header widths are attacker-controlled 32-bit data.
    */
  def bmpRowBytesL(width: Int): Long = (3L * width + 3L) / 4L * 4L

  /** Int stride for encoder-side dims (validated small by callers). */
  def bmpRowBytes(width: Int): Int = bmpRowBytesL(width).toInt

  /** Total file size of a 24 bpp BMP with the standard 54-byte header. */
  def bmpFileSize(width: Int, height: Int): Int =
    54 + height * bmpRowBytes(width)

  /** Encode a 24 bpp uncompressed BMP; `pix(i)` supplies the i-th byte
    * of the pixel array (including padding positions — the decoder skips
    * them by stride, so their value is irrelevant).
    */
  def encodeBmp(width: Int, height: Int, pix: Int => Byte): Array[Byte] = {
    require(width > 0 && height > 0, s"bad dims ${width}x$height")
    val rowBytes = bmpRowBytes(width)
    val dataSize = height * rowBytes
    val out = new Array[Byte](54 + dataSize)
    out(0) = 'B'; out(1) = 'M'
    putLe32(out, 2, out.length) // BITMAPFILEHEADER.bfSize
    putLe32(out, 10, 54)        // pixel-array offset
    putLe32(out, 14, 40)        // BITMAPINFOHEADER.biSize
    putLe32(out, 18, width)
    putLe32(out, 22, height)
    putLe16(out, 26, 1)         // planes
    putLe16(out, 28, 24)        // bpp
    putLe32(out, 30, 0)         // BI_RGB (uncompressed)
    putLe32(out, 34, dataSize)
    putLe32(out, 38, 2835); putLe32(out, 42, 2835) // 72 dpi
    var i = 0
    while (i < dataSize) { out(54 + i) = pix(i); i += 1 }
    out
  }

  /** One decoded BMP frame: geometry from the header, `meanLevel` the
    * mean of the actual pixel bytes (padding excluded — that is what the
    * stride in the header is for), `fileSize` the header's own size
    * field, which is what lets [[decodeBmpStream]] split a concatenation.
    */
  final case class BmpFrame(width: Int, height: Int, bpp: Int,
      fileSize: Int, meanLevel: Double)

  final case class BmpHeader(width: Int, height: Int, dataOff: Int,
      fileSize: Int)

  /** Parse and validate ONLY the BMP header at `off` — the geometry a
    * patch/tile manifest needs (q282), without touching a pixel byte.
    * Same validation discipline as [[decodeBmp]] (which builds on
    * this): long-widened bounds so hostile 32-bit fields fail the
    * require, never the array access.
    */
  def decodeBmpHeader(b: Array[Byte], off: Int): BmpHeader = {
    require(b.length - off >= 54, s"truncated BMP header at $off")
    require(b(off) == 'B' && b(off + 1) == 'M', s"bad BMP magic at $off")
    val fileSize = le32(b, off + 2)
    val dataOff = le32(b, off + 10)
    val width = le32(b, off + 18)
    val height = le32(b, off + 22)
    val bpp = le16(b, off + 28)
    val compression = le32(b, off + 30)
    require(width > 0 && height > 0, s"bad dims ${width}x$height")
    require(bpp == 24 && compression == 0,
      s"unsupported BMP profile: bpp=$bpp compression=$compression")
    // Bounds in LONG arithmetic: every header field is attacker-
    // controlled 32-bit data, so fileSize/dataOff can be negative as
    // Int (≥ 2³¹) and width·height·stride products overflow Int — an
    // Int-typed `off + fileSize <= length` check WRAPS and passes,
    // after which the pixel walk indexes a wrapped (wrong or OOB)
    // offset. Widening before any arithmetic makes the checks exact;
    // a hostile header now fails the require, never the array access.
    require(fileSize > 0 && dataOff >= 54,
      s"bad BMP header fields: fileSize=$fileSize dataOff=$dataOff")
    require(off.toLong + fileSize <= b.length, "BMP size field past buffer end")
    BmpHeader(width, height, dataOff, fileSize)
  }

  /** Parse the BMP starting at `off`. Validates magic, header size, and
    * 24 bpp/BI_RGB (the profile this library writes); a real pipeline
    * routes other profiles to a quarantine, it does not guess.
    */
  def decodeBmp(b: Array[Byte], off: Int): BmpFrame = {
    val hd = decodeBmpHeader(b, off)
    val (width, height, dataOff, fileSize) =
      (hd.width, hd.height, hd.dataOff, hd.fileSize)
    val rowBytes = bmpRowBytesL(width)
    // The pixel array must fit inside the frame's OWN declared fileSize,
    // not merely the buffer: in a concatenated stream a header whose
    // fileSize excludes its pixel array would otherwise "decode" by
    // reading the NEXT frame's bytes as pixels and then re-parse them as
    // a frame — overlapping, double-counted garbage. The bound is
    // division-form because the naive product rowBytes·height overflows
    // Long for hostile dims; it also implies the buffer bound
    // (off + fileSize <= b.length was checked above).
    val pixAvail = fileSize.toLong - dataOff
    require(pixAvail >= 0 && height <= pixAvail / rowBytes,
      s"BMP pixel array (${height}x$rowBytes bytes) past frame end ($fileSize)")
    var sum = 0L
    var r = 0
    while (r < height) {
      // safe narrowing: rowBytes·height ≤ fileSize − dataOff (the frame
      // bound above) ⟹ off + dataOff + rowBytes·height ≤ off + fileSize
      // ≤ b.length ≤ Int.MaxValue bounds every index below
      val rowStart = (off.toLong + dataOff.toLong + r * rowBytes).toInt
      var cIdx = 0
      val rowPixBytes = 3 * width
      while (cIdx < rowPixBytes) { sum += b(rowStart + cIdx) & 0xff; cIdx += 1 }
      r += 1
    }
    val nPix = height.toLong * 3L * width.toLong
    // bpp = 24 by the header validation above (the only profile parsed)
    BmpFrame(width, height, 24, fileSize,
      if (nPix == 0) 0.0 else sum.toDouble / nPix)
  }

  /** Split a back-to-back concatenation of BMP files by each header's
    * size field — the standard way to walk any frame stream whose
    * members self-describe their length.
    */
  def decodeBmpStream(b: Array[Byte]): Seq[BmpFrame] = {
    val frames = Seq.newBuilder[BmpFrame]
    var off = 0
    while (off < b.length) {
      val f = decodeBmp(b, off)
      frames += f
      require(f.fileSize > 0, "zero-size BMP frame")
      off += f.fileSize
    }
    frames.result()
  }

  /** Byte offsets of every frame in a back-to-back BMP concatenation —
    * the walk [[decodeBmpStream]] performs, without touching a pixel:
    * each header is parsed and geometry-validated (pixel array must
    * fit the frame's own declared fileSize — the overlap guard), then
    * the walk advances by that fileSize. The offset list a per-frame
    * hasher ([[dHash56At]], q288) consumes in place.
    */
  def bmpStreamOffsets(b: Array[Byte]): Seq[Int] = {
    val offs = Seq.newBuilder[Int]
    var off = 0
    while (off < b.length) {
      val hd = decodeBmpHeader(b, off)
      val rowBytes = bmpRowBytesL(hd.width)
      val pixAvail = hd.fileSize.toLong - hd.dataOff
      require(pixAvail >= 0 && hd.height <= pixAvail / rowBytes,
        s"BMP pixel array (${hd.height}x$rowBytes bytes) past frame end (${hd.fileSize})")
      offs += off
      require(hd.fileSize > 0, "zero-size BMP frame")
      off += hd.fileSize
    }
    offs.result()
  }

  /** 56-bit horizontal-difference perceptual hash (dHash) of the BMP at
    * the start of `payload` — the classic near-duplicate image
    * fingerprint (compare neighboring cells of a downsampled grayscale
    * grid; one bit per comparison), sized to 8 rows × 7 column
    * comparisons so the hash stays in the non-negative half of a
    * BIGINT (no sign-bit portability hazards in either engine).
    * Geometry comes from the PARSED header ([[decodeBmpHeader]]);
    * sampling is nearest-neighbor on the pixel-array grid (row r of 8
    * maps to array row r·h/8, column c of 8 to pixel c·w/8 — integer
    * division, so both engines agree exactly); gray = (b+g+r)/3 of the
    * sampled pixel's three data bytes. Row-local: no Spark imports, so
    * it runs inside partition-batched `mapPartitions` tasks next to the
    * other codecs.
    */
  def dHash56(payload: Array[Byte]): Long = dHash56At(payload, 0)

  /** [[dHash56]] of the BMP at byte offset `off` — the form a frame
    * STREAM walker uses to hash every frame in place (no per-frame
    * copies; the q288 shared-frame video dedup).
    */
  def dHash56At(payload: Array[Byte], off: Int): Long = {
    val hd = decodeBmpHeader(payload, off)
    // the same pixel-array-fits-the-frame guard as decodeBmp (long
    // stride first — an Int-form stride on a hostile width wraps): a
    // header whose fileSize excludes its pixel array must fail the
    // require here, never index past the frame into the next frame's
    // bytes (the q288 stream case) or past the buffer
    val rowBytes = bmpRowBytesL(hd.width)
    val pixAvail = hd.fileSize.toLong - hd.dataOff
    require(pixAvail >= 0 && hd.height <= pixAvail / rowBytes,
      s"BMP pixel array (${hd.height}x$rowBytes bytes) past frame end (${hd.fileSize})")
    // safe narrowing: height*rowBytes <= fileSize <= Int.MaxValue
    val stride = rowBytes.toInt
    def gray(x: Int, rArr: Int): Int = {
      val o = off + hd.dataOff + rArr * stride + 3 * x
      ((payload(o) & 0xff) + (payload(o + 1) & 0xff)
        + (payload(o + 2) & 0xff)) / 3
    }
    var h = 0L
    var r = 0
    while (r < 8) {
      // sample coordinates in LONG first (ADVICE r14): r·height and
      // (c+1)·width overflow Int for dims near 2³¹/8 that still pass
      // the division-form geometry guard (e.g. width=1, huge height) —
      // the quotient is ≤ height/width, so the narrowing back is exact
      val y = (r.toLong * hd.height / 8L).toInt
      var c = 0
      while (c < 7) {
        if (gray(((c + 1).toLong * hd.width / 8L).toInt, y) >
            gray((c.toLong * hd.width / 8L).toInt, y))
          h |= 1L << (r * 7 + c)
        c += 1
      }
      r += 1
    }
    h
  }

  // ---- WAV (RIFF PCM) ----------------------------------------------

  /** Encode a mono 16-bit PCM WAV with the canonical 44-byte
    * RIFF/fmt/data layout.
    */
  def encodeWavPcm16Mono(sampleRate: Int, samples: Array[Short]): Array[Byte] = {
    val dataBytes = samples.length * 2
    val out = new Array[Byte](44 + dataBytes)
    out(0) = 'R'; out(1) = 'I'; out(2) = 'F'; out(3) = 'F'
    putLe32(out, 4, 36 + dataBytes)
    out(8) = 'W'; out(9) = 'A'; out(10) = 'V'; out(11) = 'E'
    out(12) = 'f'; out(13) = 'm'; out(14) = 't'; out(15) = ' '
    putLe32(out, 16, 16)          // fmt chunk size (PCM)
    putLe16(out, 20, 1)           // audio format: PCM
    putLe16(out, 22, 1)           // channels
    putLe32(out, 24, sampleRate)
    putLe32(out, 28, sampleRate * 2) // byte rate
    putLe16(out, 32, 2)           // block align
    putLe16(out, 34, 16)          // bits per sample
    out(36) = 'd'; out(37) = 'a'; out(38) = 't'; out(39) = 'a'
    putLe32(out, 40, dataBytes)
    var i = 0
    while (i < samples.length) { putLe16(out, 44 + 2 * i, samples(i) & 0xffff); i += 1 }
    out
  }

  /** Decoded WAV: format fields from the fmt chunk, sample statistics
    * from the data chunk (meanAbs = mean |amplitude|, zeroCrossings =
    * sign changes — the two classic cheap audio features).
    */
  final case class WavAudio(channels: Int, sampleRate: Int,
      bitsPerSample: Int, nSamples: Long, meanAbs: Double,
      zeroCrossings: Long)

  private final case class WavChunks(fmt: Int, channels: Int,
      sampleRate: Int, bits: Int, dataOff: Int, dataLen: Int)

  /** Walk a RIFF/WAVE chunk list — chunks may come in any order and
    * unknown chunks (LIST, fact, …) are skipped by their declared
    * size, per the RIFF grammar — and validate the PCM-16-mono profile
    * (the one this library writes). Shared by [[decodeWav]] and
    * [[aHash56Wav]].
    */
  private def walkWavChunks(b: Array[Byte]): WavChunks = {
    require(b.length >= 12, "truncated RIFF header")
    require(b(0) == 'R' && b(1) == 'I' && b(2) == 'F' && b(3) == 'F' &&
      b(8) == 'W' && b(9) == 'A' && b(10) == 'V' && b(11) == 'E',
      "not a RIFF/WAVE file")
    var channels = -1; var sampleRate = -1; var bits = -1; var fmt = -1
    var dataOff = -1; var dataLen = -1
    var off = 12
    while (off + 8 <= b.length) {
      val id = new String(b, off, 4, java.nio.charset.StandardCharsets.US_ASCII)
      val size = le32(b, off + 4)
      // Long-widened bound (same rationale as decodeBmp): a size near
      // 2³¹ makes the Int sum wrap negative and pass the check.
      require(size >= 0 && off.toLong + 8 + size <= b.length,
        s"chunk '$id' size $size past buffer end")
      id match {
        case "fmt " =>
          require(size >= 16, "fmt chunk too small")
          fmt = le16(b, off + 8)
          channels = le16(b, off + 10)
          sampleRate = le32(b, off + 12)
          bits = le16(b, off + 22)
        case "data" => dataOff = off + 8; dataLen = size
        case _ => // unknown chunk: skip by declared size
      }
      off += 8 + size + (size & 1) // chunks pad to even offsets
    }
    require(fmt == 1 && bits == 16 && channels == 1,
      s"unsupported WAV profile: fmt=$fmt bits=$bits channels=$channels")
    require(dataOff >= 0, "no data chunk")
    WavChunks(fmt, channels, sampleRate, bits, dataOff, dataLen)
  }

  /** Parse a RIFF/WAVE file ([[walkWavChunks]]) and emit the classic
    * cheap audio features from its PCM data.
    */
  def decodeWav(b: Array[Byte]): WavAudio = {
    val c = walkWavChunks(b)
    val (sampleRate, bits, channels) = (c.sampleRate, c.bits, c.channels)
    val dataOff = c.dataOff
    val n = c.dataLen / 2
    var sumAbs = 0L; var zc = 0L; var prevSign = 0
    var i = 0
    while (i < n) {
      val s = (le16(b, dataOff + 2 * i) << 16) >> 16 // sign-extend
      sumAbs += math.abs(s).toLong
      val sign = Integer.signum(s)
      if (sign != 0) {
        if (prevSign != 0 && sign != prevSign) zc += 1
        prevSign = sign
      }
      i += 1
    }
    WavAudio(channels, sampleRate, bits, n.toLong,
      if (n == 0) 0.0 else sumAbs.toDouble / n, zc)
  }

  /** 56-bit energy-difference audio fingerprint of a PCM-16-mono WAV —
    * the audio sibling of [[dHash56]]: the sample stream splits into 57
    * index-proportional windows (sample i lands in window ⌊i·57/n⌋ —
    * integer arithmetic, so both engines agree exactly; short clips
    * leave trailing windows empty at energy 0), window energy = Σ|s|
    * (exact BIGINT — no floats anywhere), and bit k compares
    * neighboring energies E(k+1) > E(k), k = 0..55. Same non-negative
    * BIGINT shape as dHash56, so the banded Hamming dedup
    * ([[graft.operators.Multimodal.phashDedup]]) serves both
    * modalities unchanged.
    */
  /** Content-anchored 56-bit fingerprints of a PCM-16-mono WAV — the
    * SHIFT-TOLERANT audio near-dup path (q291), fixing the edit
    * fragility [[aHash56Wav]] documents: that fingerprint's windows
    * are index-proportional, so one inserted sample re-divides every
    * window and no near-identical clip survives it. Here window
    * placement is CONTENT-DEFINED (the rsync/LBFS chunking idea, the
    * audio analogue of q61's winnowing): position i ≥ 3 is an ANCHOR
    * iff the md5 of the last four |sample| values (comma-joined
    * decimal — the established md5-portability trick, replayed
    * verbatim by DuckDB's md5 on the same string) has its leading
    * 32 bits ≡ 0 mod `mod`, and each anchor fingerprints the 114
    * samples after it: 57 two-sample energies E_k = |s|(i+1+2k) +
    * |s|(i+2+2k), bit k set iff E(k+1) > E(k) — the [[aHash56Wav]]
    * comparator over a content-anchored window, so the result reuses
    * the unchanged banded-Hamming dedup operator. A clip shifted by s
    * samples has identical anchors at shifted positions with
    * identical windows, hence identical fingerprints: byte-shifted
    * duplicates collide at Hamming 0, and an edit loses only the
    * anchors whose key or window crosses it. Expected anchor density
    * 1/mod per eligible position. Returns (anchor index, hash) pairs;
    * clips shorter than 119 samples yield none.
    */
  def anchorHashes56Wav(payload: Array[Byte], mod: Int = 32): Seq[(Int, Long)] = {
    val c = walkWavChunks(payload)
    val n = c.dataLen / 2
    val a = new Array[Long](math.max(n, 0))
    var i = 0
    while (i < n) {
      val s = (le16(payload, c.dataOff + 2 * i) << 16) >> 16 // sign-extend
      a(i) = math.abs(s).toLong
      i += 1
    }
    val md = java.security.MessageDigest.getInstance("MD5")
    val out = Seq.newBuilder[(Int, Long)]
    i = 3
    while (i + 114 < n) {
      md.reset()
      val key = s"${a(i - 3)},${a(i - 2)},${a(i - 1)},${a(i)}"
      val d = md.digest(key.getBytes(java.nio.charset.StandardCharsets.US_ASCII))
      // the first 8 hex chars of the digest as an unsigned 32-bit value —
      // exactly ('0x' || substr(md5(key), 1, 8))::BIGINT on the SQL side
      val head = ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
        ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
      if (head % mod == 0) {
        var h = 0L
        var k = 0
        var ePrev = a(i + 1) + a(i + 2)
        while (k < 56) {
          val eNext = a(i + 3 + 2 * k) + a(i + 4 + 2 * k)
          if (eNext > ePrev) h |= 1L << k
          ePrev = eNext
          k += 1
        }
        out += ((i, h))
      }
      i += 1
    }
    out.result()
  }

  def aHash56Wav(payload: Array[Byte]): Long = {
    val c = walkWavChunks(payload)
    val n = c.dataLen / 2
    if (n == 0) return 0L
    val e = new Array[Long](57)
    var i = 0
    while (i < n) {
      val s = (le16(payload, c.dataOff + 2 * i) << 16) >> 16 // sign-extend
      e((i.toLong * 57L / n).toInt) += math.abs(s).toLong
      i += 1
    }
    var h = 0L
    var k = 0
    while (k < 56) {
      if (e(k + 1) > e(k)) h |= 1L << k
      k += 1
    }
    h
  }
}
