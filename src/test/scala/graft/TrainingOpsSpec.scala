package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins the r11 training-pipeline operators: the BPE merge loop
  * (greedy-application semantics, overlap counting, tie-breaks, early
  * stop), the encode pass, centroid drift, kNN voting, and the
  * l-diversity release rule — each against hand-computed truths.
  */
class TrainingOpsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import operators.{Curation, Extended, Similarity}

  private def docsOf(texts: String*) = {
    import spark.implicits._
    texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
  }

  test("bpeTrain: hand-computed merge sequence, ties, early stop") {
    // ab×3, abc×2 → pairs r1: (a,b)=5, (b,_)=3, (b,c)=2, (c,_)=2.
    // r3 is a TIE at cnt=2 between (ab,c) and (c,_) → lhs 'ab' < 'c'.
    // r5 finds no pair (every word one symbol) → loop stops at 4 merges.
    val (merges, seg) = Curation.bpeTrain(docsOf("ab ab ab", "abc abc"), 6)
    assert(merges === Seq(
      (1, "a", "b", 5L), (2, "ab", "_", 3L),
      (3, "ab", "c", 2L), (4, "abc", "_", 2L)))
    val segs = seg.collect().map(r =>
      r.getAs[String]("w") -> r.getAs[String]("seg")).toMap
    assert(segs === Map("ab" -> "ab_", "abc" -> "abc_"))
    spark.catalog.clearCache()
  }

  test("bpeTrain: overlapping pairs count fully, application is greedy") {
    // "aaaa" → a  a  a  a  _: (a,a) counts 3 (overlaps), application
    // merges greedily left-to-right → aa  aa  _ (never aa  a  a  _).
    // r2 ties at 1 between (aa,aa) and (aa,_) → rhs '_' < 'aa'.
    val (merges, seg) = Curation.bpeTrain(docsOf("aaaa"), 3)
    assert(merges === Seq(
      (1, "a", "a", 3L), (2, "aa", "_", 1L), (3, "aa", "aa_", 1L)))
    assert(seg.collect().head.getAs[String]("seg") === "aaaa_")
    spark.catalog.clearCache()
  }

  test("bpeTrain: a learned pair abutting a longer fused symbol stays put") {
    // tha×9, the×4, he×6. Hand-trace: r1 (t,h)=13; r2 (e,_)=10;
    // r3 tie at 9 → (a,_) by lhs; r4 (th,a_)=9; r5 (h,e_)=6 — at this
    // point 'the' is segmented th  e_, and the h inside the fused 'th'
    // must NOT satisfy lhs=h (an unanchored replace rewrote it to
    // the_, stealing r6); r6 (th,e_)=4 then fuses 'the' legitimately.
    val corpus = (Seq.fill(9)("tha") ++ Seq.fill(4)("the") ++
      Seq.fill(6)("he")).mkString(" ")
    val (merges, seg) = Curation.bpeTrain(docsOf(corpus), 6)
    assert(merges === Seq(
      (1, "t", "h", 13L), (2, "e", "_", 10L), (3, "a", "_", 9L),
      (4, "th", "a_", 9L), (5, "h", "e_", 6L), (6, "th", "e_", 4L)))
    val segs = seg.collect().map(r =>
      r.getAs[String]("w") -> r.getAs[String]("seg")).toMap
    assert(segs === Map("tha" -> "tha_", "the" -> "the_", "he" -> "he_"))
    spark.catalog.clearCache()
  }

  test("bpe encode: per-word token counts follow the learned merges") {
    val docs = docsOf("ab ab ab", "abc abc")
    // After 2 merges ((a,b) then (ab,_)): ab → [ab_] = 1 token,
    // abc → [ab, c, _] = 3 tokens.
    val (_, seg) = Curation.bpeTrain(docs, 2)
    val nTok = seg.select(col("w"),
        size(split(col("seg"), "  ")).as("n")).collect()
      .map(r => r.getAs[String]("w") -> r.getAs[Int]("n")).toMap
    assert(nTok === Map("ab" -> 1, "abc" -> 3))
    spark.catalog.clearCache()
  }

  test("centroidDrift: identical halves drift 0, planted shift is exact") {
    import spark.implicits._
    val vecs = Seq(
      // label 1: even/odd ids carry identical vectors → zero drift
      (0L, 1, Seq(0.5, 0.25)), (1L, 1, Seq(0.5, 0.25)),
      // label 2: dim-1 mean moves 0.50 → 0.75 → 250000 micro-L1
      (2L, 2, Seq(0.5, 0.5)), (3L, 2, Seq(0.75, 0.5)),
      // label 3: snapshot B only (odd id) → excluded, never a NULL row
      (5L, 3, Seq(0.1, 0.2))
    ).toDF("vec_id", "label", "v")
    val out = Similarity.centroidDrift(vecs, col("vec_id") % 2 === 0)
      .collect().map(r => r.getAs[Int]("label") ->
        r.getAs[Long]("l1_drift_micro")).toMap
    assert(out === Map(1 -> 0L, 2 -> 250000L))
  }

  test("knnClassify: planted clusters score 100%, vote ties pick min label") {
    import spark.implicits._
    // Two orthogonal directions; test points sit exactly on a cluster
    // direction → all 2 neighbors of that cluster outrank the other.
    val train = Seq(
      (10L, 7, Seq(1.0, 0.0)), (11L, 7, Seq(0.9, 0.1)),
      (20L, 3, Seq(0.0, 1.0)), (21L, 3, Seq(0.1, 0.9))
    ).toDF("vec_id", "label", "v")
    val test = Seq(
      (1L, 7, Seq(1.0, 0.05)), (2L, 3, Seq(0.05, 1.0))
    ).toDF("vec_id", "label", "v")
    val out = Similarity.knnClassify(train, test, k = 2).collect()
    assert(out.forall(_.getAs[Int]("is_correct") == 1))

    // Equidistant single test point, k=2 → one vote each for labels
    // 7 and 3 → deterministic tie-break picks the SMALLER label.
    val tied = Seq((1L, 7, Seq(1.0, 1.0))).toDF("vec_id", "label", "v")
    val tie = Similarity.knnClassify(
      train.filter(col("vec_id").isin(10L, 20L)), tied, k = 2).collect().head
    assert(tie.getAs[Int]("pred_label") === 3)
  }

  test("suffixRanks: hand-computed suffix arrays, sentinel orders prefixes first") {
    // banana: sorted suffixes a < ana < anana < banana < na < nana
    // → rank by position: 4 3 6 2 5 1
    // "ab ab": " ab" < "ab" < "ab ab" < "b" < "b ab" exercises BOTH the
    // space character and the 0-sentinel rule (a suffix orders before
    // its extensions, exactly like binary string comparison).
    val out = operators.TextAnalysis.suffixRanks(docsOf("banana", "ab ab"))
      .collect().map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("pos")) ->
        r.getAs[Long]("rnk")).toMap
    assert((0 to 5).map(p => out((0L, p.toLong))) === Seq(4, 3, 6, 2, 5, 1))
    assert((0 to 4).map(p => out((1L, p.toLong))) === Seq(3, 5, 1, 2, 4))
  }

  test("suffixRanks: empty text yields no rows (two-arg sequence() would phantom [0,-1])") {
    val out = operators.TextAnalysis.suffixRanks(docsOf("", "ab")).collect()
    assert(out.forall(_.getAs[Long]("doc_id") == 1L))
    assert(out.length === 2)
  }

  test("longestRepeatedSubstring: classic cases incl. overlapping repeats") {
    // banana → "ana" (rank-adjacent lcp 3); aaaa → "aaa" (overlap counts);
    // abcabc → "abc" (the repeat spans half the string).
    val docs = docsOf("banana", "aaaa", "abcabc")
    val out = operators.TextAnalysis.longestRepeatedSubstring(
        operators.TextAnalysis.suffixRanks(docs), docs)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("lrs_len"), r.getAs[String]("lrs"))).toMap
    assert(out === Map(0L -> ((3L, "ana")), 1L -> ((3L, "aaa")),
      2L -> ((3L, "abc"))))
  }

  test("globalSuffixRanks: global order matches sorted suffixes, ties collide") {
    // docs: "ab", "aba" — all suffixes sorted globally:
    //   a(1,2) < ab(0,0) < aba(1,0) < b(0,1) = b?  no: b(0,1) vs ba(1,1):
    //   "a" < "ab" < "aba" < "b" < "ba"; the two equal suffixes would tie.
    // Here all five are distinct; add doc 2 = "b" to create a TIE with
    // doc 0's suffix "b" — rank() must give both the same grank.
    val out = operators.TextAnalysis.globalSuffixRanks(
        docsOf("ab", "aba", "b"))
      .collect().map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("pos")) ->
        r.getAs[Long]("grank")).toMap
    // sorted: a(1,2)=1, ab(0,0)=2, aba(1,0)=3, b(0,1)=4, b(2,0)=4, ba(1,1)=6
    assert(out === Map(
      (1L, 2L) -> 1L, (0L, 0L) -> 2L, (1L, 0L) -> 3L,
      (0L, 1L) -> 4L, (2L, 0L) -> 4L, (1L, 1L) -> 6L))
  }

  test("crossDocSharedSpans: cross-doc max found, within-doc repeats excluded, short-equal clamp") {
    // "xyzab" and "qxyzc" share "xyz" (3); "abab" repeats within itself
    // only — it must NOT contribute a length-2 "ab" cross-doc row beyond
    // what "xyzab" provides ("ab" IS shared between xyzab and abab).
    val docs = docsOf("xyzab", "qxyzc", "abab")
    val top = operators.TextAnalysis.crossDocSharedSpans(
      operators.TextAnalysis.globalSuffixRanks(docs), docs).collect()
    assert(top.head.getAs[Long]("lrs_len") === 3L)
    assert(top.head.getAs[String]("lrs") === "xyz")

    // equal SHORT suffixes across docs: "zabc"/"yabc" share exactly
    // "abc" — the clamp must report 3, not the 64 cap.
    val d2 = docsOf("zabc", "yabc")
    val t2 = operators.TextAnalysis.crossDocSharedSpans(
      operators.TextAnalysis.globalSuffixRanks(d2), d2).collect()
    assert(t2.head.getAs[Long]("lrs_len") === 3L)
    assert(t2.head.getAs[String]("lrs") === "abc")
  }

  test("lDiversityRelease: homogeneous class suppressed despite k, union recount exact") {
    import spark.implicits._
    def rows(nation: Int, seg: String, bals: Seq[Double]) =
      bals.map(b => (nation, seg, b))
    val customer = (
      // class A: 12 rows, all in the same $1000 band → k ok, l = 1 → suppressed
      rows(1, "AUTO", Seq.fill(12)(500.0)) ++
      // class B: 12 rows across 3 bands → released
      rows(2, "AUTO", Seq.fill(4)(500.0) ++ Seq.fill(4)(1500.0) ++ Seq.fill(4)(2500.0)) ++
      // class C: 5 rows (fails k) across 2 bands, one shared with A
      rows(3, "AUTO", Seq(500.0, 500.0, 1500.0, 1500.0, 3500.0))
    ).toDF("c_nationkey", "c_mktsegment", "c_acctbal")
    val out = Extended.lDiversityRelease(customer, k = 10, l = 3).collect()
      .map(r => (r.getAs[String]("nation"), r.getAs[String]("segment"),
        r.getAs[Long]("n_rows"), r.getAs[Long]("n_sens"))).toSet
    // suppressed union = A(12 rows, band {0}) + C(5 rows, bands {0,1,3})
    // → 17 rows, 3 distinct bands (band 0 counted ONCE, not summed)
    assert(out === Set(
      ("2", "AUTO", 12L, 3L),
      ("*", "*", 17L, 3L)))
  }

  test("unigramLmTrain: hand-traced seed, Viterbi, prune, smoothed re-score") {
    // corpus "ab ab b": types ab(2), b(1). Seed (maxLen 4, minCount 2):
    // a:2, b:3, ab:2, t=7 -> costs a/ab ln(7/2)=1252763, b ln(7/3)=847298.
    // Viterbi: "ab" -> [ab] (1252763) beats [a b] (2100061); "b" -> [b].
    // E-counts: ab:2, b:1. Final vocab = chars {a, b} + top multi {ab};
    // a unused -> cnt 0. Smoothed (t=3, nv=3): cost = round(1e6*ln(6/(cnt+1))):
    // a 1791759, b 1098612, ab 693147.
    val out = Curation.unigramLmTrain(docsOf("ab ab b")).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(out === Array(
      ("a", 0L, 1791759L), ("ab", 2L, 693147L), ("b", 1L, 1098612L)))
  }

  test("unigramLmTrain: equal-cost segmentations break by (cost, n, seg)") {
    // corpus "abc", maxLen 2, minCount 1: seed {a,b,c,ab,bc} all cnt 1,
    // all cost ln(5)=1609438. "abc" has [ab c] and [a bc] TIED on cost
    // (2x) and n (2); seg order "a bc" < "ab c" -> bc gets the E-count,
    // ab gets none and is pruned. Final: chars a/b/c + {bc};
    // counts a:1, bc:1, b:0, c:0; smoothed over t=2, nv=4: ln(6/(cnt+1)).
    val out = Curation.unigramLmTrain(
        docsOf("abc"), kMulti = 40, maxLen = 2, minCount = 1L).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(out === Array(
      ("a", 1L, 1098612L), ("b", 0L, 1791759L), ("bc", 1L, 1098612L),
      ("c", 0L, 1791759L)))
  }

  test("unigramLmSoftTrain: hand-traced forward-backward posteriors") {
    // corpus "ab ab b b": types ab(2), b(2). Seed counts a:2, b:4,
    // ab:2, t=8 -> EXACT binary probabilities p(a)=.25, p(b)=.5,
    // p(ab)=.25 (so the lattice doubles are hand-computable).
    // Word "ab": alpha = [1, .25, .375], Z=.375; beta = [.375, .5, 1].
    //   occ a(1,1): 1*.25*.5/.375  = 1/3 -> floor(1e6*x) = 333333
    //   occ ab(1,2): 1*.25*1/.375  = 2/3 -> 666666
    //   occ b(2,1): .25*.5*1/.375  = 1/3 -> 333333
    // Word "b": Z=.5; occ b(1,1) = 1.0 exactly -> 1000000.
    // Soft counts (freq-weighted): a 2*333333=666666,
    // ab 2*666666=1333332, b 2*333333+2*1000000=2666666 — the
    // POSTERIOR SPLIT hard-EM can't produce (q280 credits ab:2, a:0).
    // M-step re-uses q280's proven smoothing formula on these counts.
    val out = Curation.unigramLmSoftTrain(docsOf("ab ab b b")).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val cnts = Map("a" -> 666666L, "ab" -> 1333332L, "b" -> 2666666L)
    val t = cnts.values.sum; val nv = cnts.size
    val expected = cnts.toSeq.sortBy(_._1).map { case (g, c) =>
      (g, c, math.round(1e6 * math.log((t + nv) * 1.0 / (c + 1))))
    }.toArray
    assert(out === expected)
  }

  test("unigramLmSoftTrain: property vs an independent in-memory forward-backward") {
    // a plain-Scala reference replicating the EXACT arithmetic
    // structure (a*p then *b then /z; terms added in L order; floor at
    // the ppm readout) — IEEE determinism makes Spark-vs-Scala
    // bit-exact, so the comparison is ===, no tolerance
    def reference(texts: Seq[String], kMulti: Int = 40, maxLen: Int = 4,
        minCount: Long = 2L): Seq[(String, Long, Long)] = {
      val ty = texts.flatMap(_.split(" ")).filter(_.nonEmpty)
        .groupBy(identity).map { case (w, ws) => w -> ws.size.toLong }
      val sub = scala.collection.mutable.Map.empty[String, Long]
      for ((w, f) <- ty; i <- 1 to w.length; l <- 1 to maxLen
           if i + l - 1 <= w.length) {
        val g = w.substring(i - 1, i - 1 + l)
        sub(g) = sub.getOrElse(g, 0L) + f
      }
      val seed = sub.filter { case (g, c) => g.length == 1 || c >= minCount }
      val t = seed.values.sum
      val p = seed.map { case (g, c) => g -> (c * 1.0 / t) }
      val counts = scala.collection.mutable.Map.empty[String, Long]
      for ((w, f) <- ty) {
        val n = w.length
        val a = new Array[Double](n + 1); a(0) = 1.0
        for (j <- 1 to n) {
          var s = 0.0
          for (l <- 1 to maxLen if j - l >= 0)
            p.get(w.substring(j - l, j)).foreach(pp => s += a(j - l) * pp)
          a(j) = s
        }
        val b = new Array[Double](n + 1); b(n) = 1.0
        for (j <- n - 1 to 0 by -1) {
          var s = 0.0
          for (l <- 1 to maxLen if j + l <= n)
            p.get(w.substring(j, j + l)).foreach(pp => s += b(j + l) * pp)
          b(j) = s
        }
        val z = a(n)
        if (z > 0.0)
          for (i <- 1 to n; l <- 1 to maxLen if i + l - 1 <= n) {
            val g = w.substring(i - 1, i - 1 + l)
            p.get(g).foreach { pp =>
              val e = math.floor(
                1000000.0 * (((a(i - 1) * pp) * b(i + l - 1)) / z)).toLong
              counts(g) = counts.getOrElse(g, 0L) + f * e
            }
          }
      }
      val chars = sub.keys.filter(_.length == 1).toSeq
      val multi = counts.filter(_._1.length > 1).toSeq
        .sortBy { case (g, c) => (-c, g) }.take(kMulti).map(_._1)
      val fin = (chars ++ multi).distinct
      val fc = fin.map(g => g -> counts.getOrElse(g, 0L))
      val t2 = fc.map(_._2).sum; val nv = fc.size
      fc.sortBy(_._1).map { case (g, c) =>
        (g, c, math.round(1e6 * math.log((t2 + nv) * 1.0 / (c + 1))))
      }
    }
    val rnd = new scala.util.Random(2026)
    for (trial <- 0 until 3) {
      val words = Seq.fill(6 + rnd.nextInt(6))(
        Seq.fill(1 + rnd.nextInt(7))("abc" (rnd.nextInt(3))).mkString)
      val texts = Seq.fill(3)(
        Seq.fill(4 + rnd.nextInt(5))(words(rnd.nextInt(words.size)))
          .mkString(" "))
      val out = Curation.unigramLmSoftTrain(docsOf(texts: _*)).collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
      assert(out === reference(texts), s"trial $trial corpus $texts")
    }
  }

  test("unigramLmEmTrain: property vs an independent in-memory 2-round EM") {
    // the single-round reference above, iterated with the q292 prune
    // schedule and the smoothed (cnt+1)/(t+nv) M-step between rounds —
    // same IEEE-structural arithmetic, so the comparison stays ===
    def emReference(texts: Seq[String], schedule: Seq[Int],
        maxLen: Int = 4, minCount: Long = 2L): Seq[(String, Long, Long)] = {
      val ty = texts.flatMap(_.split(" ")).filter(_.nonEmpty)
        .groupBy(identity).map { case (w, ws) => w -> ws.size.toLong }
      val sub = scala.collection.mutable.Map.empty[String, Long]
      for ((w, f) <- ty; i <- 1 to w.length; l <- 1 to maxLen
           if i + l - 1 <= w.length) {
        val g = w.substring(i - 1, i - 1 + l)
        sub(g) = sub.getOrElse(g, 0L) + f
      }
      val seed = sub.filter { case (g, c) => g.length == 1 || c >= minCount }
      val t0 = seed.values.sum
      var p: Map[String, Double] =
        seed.map { case (g, c) => g -> (c * 1.0 / t0) }.toMap
      val chars = sub.keys.filter(_.length == 1).toSeq
      var fc: Seq[(String, Long)] = Nil
      for (k <- schedule) {
        val counts = scala.collection.mutable.Map.empty[String, Long]
        for ((w, f) <- ty) {
          val n = w.length
          val a = new Array[Double](n + 1); a(0) = 1.0
          for (j <- 1 to n) {
            var s = 0.0
            for (l <- 1 to maxLen if j - l >= 0)
              p.get(w.substring(j - l, j)).foreach(pp => s += a(j - l) * pp)
            a(j) = s
          }
          val b = new Array[Double](n + 1); b(n) = 1.0
          for (j <- n - 1 to 0 by -1) {
            var s = 0.0
            for (l <- 1 to maxLen if j + l <= n)
              p.get(w.substring(j, j + l)).foreach(pp => s += b(j + l) * pp)
            b(j) = s
          }
          val z = a(n)
          if (z > 0.0)
            for (i <- 1 to n; l <- 1 to maxLen if i + l - 1 <= n) {
              val g = w.substring(i - 1, i - 1 + l)
              p.get(g).foreach { pp =>
                val e = math.floor(
                  1000000.0 * (((a(i - 1) * pp) * b(i + l - 1)) / z)).toLong
                counts(g) = counts.getOrElse(g, 0L) + f * e
              }
            }
        }
        val multi = counts.filter(_._1.length > 1).toSeq
          .sortBy { case (g, c) => (-c, g) }.take(k).map(_._1)
        val fin = (chars ++ multi).distinct
        fc = fin.map(g => g -> counts.getOrElse(g, 0L))
        val t = fc.map(_._2).sum; val nv = fc.size
        p = fc.map { case (g, c) => g -> ((c + 1L) * 1.0 / (t + nv)) }.toMap
      }
      val t2 = fc.map(_._2).sum; val nv = fc.size
      fc.sortBy(_._1).map { case (g, c) =>
        (g, c, math.round(1e6 * math.log((t2 + nv) * 1.0 / (c + 1))))
      }
    }
    val rnd = new scala.util.Random(2926)
    for (trial <- 0 until 2) {
      val words = Seq.fill(6 + rnd.nextInt(6))(
        Seq.fill(1 + rnd.nextInt(7))("abc" (rnd.nextInt(3))).mkString)
      val texts = Seq.fill(3)(
        Seq.fill(4 + rnd.nextInt(5))(words(rnd.nextInt(words.size)))
          .mkString(" "))
      val schedule = Seq(Seq(8, 4), Seq(10, 6, 3))(trial % 2)
      val out = Curation.unigramLmEmTrain(docsOf(texts: _*), schedule)
        .collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
      assert(out === emReference(texts, schedule),
        s"trial $trial schedule $schedule corpus $texts")
    }
  }

  test("unigramLmEmTrain: a 1-round schedule reproduces unigramLmSoftTrain") {
    // the iterated trainer with schedule Seq(40) IS the certified
    // single-round q284 — pins that the loop refactor changed nothing
    val texts = Seq("abab bab ab", "bab ab ab cc", "cc abab bab")
    val single = Curation.unigramLmSoftTrain(docsOf(texts: _*)).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    val looped = Curation.unigramLmEmTrain(docsOf(texts: _*), Seq(40))
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    assert(looped === single)
  }

  test("unigramLmEncode: fertility from the final model's Viterbi pass") {
    import spark.implicits._
    // same tie-break corpus: final model a/bc cheap (1098612), b/c dear
    // (1791759). "abc" encodes [a bc] (2197224, n 2) over [a b c]
    // (4682130, n 3) -> 1 word, 2 pieces, 2000000 ppm.
    val docs = Seq((0L, "abc", "en", "s0"))
      .toDF("doc_id", "text", "lang", "source")
    val out = Curation.unigramLmEncode(
        docs, kMulti = 40, maxLen = 2, minCount = 1L).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    assert(out === Array(("en", "s0", 1L, 2L, 2000000L)))
  }
}
