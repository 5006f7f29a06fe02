package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Semantics for the corpus-divergence and BM25 operators (q84/q85) —
  * the oracle pins engine parity; these pin meaning on planted corpora.
  */
class RetrievalSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def docs(rows: (Long, String, String)*) = {
    val s = spark
    import s.implicits._
    rows.toDF("doc_id", "text", "source")
  }

  test("corpusDivergence: identical slices diverge by zero, a skewed slice dominates") {
    val even = "alpha beta gamma delta"
    val res = graft.operators.Curation.corpusDivergence(docs(
      (1L, even, "a"), (2L, even, "b"),
      (3L, "alpha alpha alpha alpha", "c"))).collect()
      .map(r => r.getString(0) -> (r.getLong(2), r.getLong(3))).toMap
    spark.catalog.clearCache()
    // a and b have the same distribution — identical divergence
    assert(res("a") == res("b"))
    // c (all mass on one token) must diverge more than the balanced slices
    assert(res("c")._1 > res("a")._1 && res("c")._2 > res("a")._2,
      s"skewed slice should dominate: $res")
  }

  test("bm25: a doc with more query-term hits outranks, term-less docs are absent") {
    val corpus = docs(
      (1L, "spark spark spark pad pad pad pad pad", "s"),
      (2L, "spark pad pad pad pad pad pad pad", "s"),
      (3L, "pad pad pad pad pad pad pad pad", "s"))
    val res = graft.operators.TextAnalysis
      .bm25TopK(corpus, Seq("spark"), topK = 10).collect()
    spark.catalog.clearCache()
    assert(res.map(_.getLong(0)).toSeq == Seq(1L, 2L), "rank by tf; doc 3 absent")
    assert(res.head.getLong(1) > res(1).getLong(1), "higher tf → higher score")
    assert(res.map(_.getInt(2)).toSeq == Seq(1, 2), "dense ranks from 1")
  }

  test("perplexityScore: improbable token sequences score higher NLL per bigram") {
    // docs 1-3 share one high-frequency pattern; doc 4 is the outlier
    // whose bigrams occur nowhere else — the filter's target
    val common = "the quick fox " * 6 + "the quick fox"
    val corpus = docs(
      (1L, common.trim, "s"), (2L, common.trim, "s"), (3L, common.trim, "s"),
      (4L, (1 to 19).map(i => s"z$i").mkString(" "), "s"))
    val res = graft.operators.TextAnalysis.perplexityScore(corpus).collect()
      .map(r => r.getLong(0) -> (r.getLong(2).toDouble / r.getLong(1))).toMap
    spark.catalog.clearCache()
    assert(res(4L) > res(1L) * 1.5,
      s"outlier doc must have markedly higher per-bigram NLL: $res")
    assert(res(1L) == res(2L) && res(2L) == res(3L),
      "identical docs score identically")
  }

  test("bm25: length normalization — same tf, shorter doc wins") {
    val corpus = docs(
      (1L, "spark " + (1 to 40).map(i => s"p$i").mkString(" "), "s"),
      (2L, "spark p1 p2 p3", "s"))
    val res = graft.operators.TextAnalysis
      .bm25TopK(corpus, Seq("spark"), topK = 10).collect()
    spark.catalog.clearCache()
    assert(res.head.getLong(0) == 2L, s"shorter doc should rank first: ${res.toSeq}")
  }

  test("invertedIndex: df band enforced, postings sorted, occurrences round-trip") {
    val corpus = docs(
      (3L, "a b c a b", "s"),  // bigrams: "a b"(×2→1 distinct), "b c", "c a"
      (1L, "a b x y", "s"),    // "a b", "b x", "x y"
      (2L, "x y a b", "s"))    // "x y", "y a", "a b"
    val occ = graft.operators.TextAnalysis.bigramOccurrences(corpus)
    val idx = graft.operators.TextAnalysis.invertedIndex(occ, minDf = 2L, maxDf = 10L)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getString(2))).toList
    spark.catalog.clearCache()
    val byTerm = idx.map(t => t._1 -> ((t._2, t._3))).toMap
    // only "a b" (df 3) and "x y" (df 2) survive the band
    assert(byTerm.keySet == Set("a b", "x y"), s"got ${byTerm.keySet}")
    assert(byTerm("a b") == ((3L, "1,2,3")), "postings must be doc-id-sorted")
    assert(byTerm("x y") == ((2L, "1,2")))
  }

  test("pmiCollocations: an exclusive pair scores high, a promiscuous token scores ~0") {
    // "zig zag" only ever co-occur with each other; "the" pairs with everything
    val corpus = docs(
      (1L, "zig zag the a the b the c the d", "s"),
      (2L, "zig zag the e the f the g the h", "s"),
      (3L, "zig zag the a the c the e the g", "s"),
      (4L, "zig zag the b the d the f the h", "s"),
      (5L, "zig zag the a the b the e the f", "s"))
    val out = graft.operators.TextAnalysis.pmiCollocations(corpus, minCount = 5L)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(3)).toMap
    spark.catalog.clearCache()
    assert(out.contains(("zig", "zag")), s"exclusive pair must survive the floor: $out")
    val zigzag = out(("zig", "zag"))
    assert(zigzag > 1000000L, s"exclusive collocation should exceed pmi 1.0: $zigzag")
    out.filter(_._1._1 == "the").values.foreach(p =>
      assert(p < zigzag, s"promiscuous 'the' pairs must score below zig-zag: $out"))
  }

  test("invertedIndex: duplicate bigram inside one doc counts once toward df") {
    val corpus = docs((1L, "p q p q", "s")) // "p q" twice, "q p" once
    val idx = graft.operators.TextAnalysis
      .invertedIndex(graft.operators.TextAnalysis.bigramOccurrences(corpus),
        minDf = 1L, maxDf = 10L)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    spark.catalog.clearCache()
    assert(idx == Map("p q" -> 1L, "q p" -> 1L), s"got $idx")
  }
}
