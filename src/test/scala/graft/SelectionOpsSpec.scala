package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins the r12 selection/curation operators — ExactSubstr removal
  * accounting, DSIR importance weights, matryoshka truncation recall,
  * and quality-aware cluster survivors — against hand-computed truths
  * (importance weights against an offline-verified md5-bucket golden).
  */
class SelectionOpsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import operators.{Curation, Dedup, Similarity}

  test("exactSubstrRemoval: islands merge, gaps split, short docs survive") {
    import spark.implicits._
    // l=4. Shared grams: abcd/bcde (docs 0,2,3,4), cdef (docs 0,1,4).
    // doc0 marks p0,p1,p2 -> one island [0,6). doc1 marks p2 -> [2,6).
    // doc2/doc3 mark p2,p3 -> [2,7). doc4 marks p0 and p8 - gap 8 >= 4
    // -> TWO islands [0,4)+[8,12). doc5 is shorter than l -> no grams,
    // still emitted with zero dup.
    val docs = Seq(
      (0L, "abcdefgh"), (1L, "qqcdefqq"), (2L, "mnabcdeuv"),
      (3L, "klabcdest"), (4L, "abcdXXXXcdef"), (5L, "xy")
    ).toDF("doc_id", "text")
    val out = Dedup.exactSubstrRemoval(docs, l = 4).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    assert(out === Array(
      (0L, 8L, 1L, 6L, 2L), (1L, 8L, 1L, 4L, 4L), (2L, 9L, 1L, 5L, 4L),
      (3L, 9L, 1L, 5L, 4L), (4L, 12L, 2L, 8L, 4L), (5L, 2L, 0L, 0L, 2L)))
  }

  test("importanceWeights: md5-bucket golden, in-domain ranks above out") {
    import spark.implicits._
    // Golden micro-nat scores verified offline against the DuckDB
    // oracle formula on the same corpus (4 tokens, no bucket
    // collisions at B=256: alpha->163, beta->176, delta->248,
    // gamma->215).
    val docs = Seq(
      (0L, "alpha alpha beta", "en"), (1L, "alpha gamma", "en"),
      (2L, "delta delta gamma", "fr"), (3L, "beta delta", "fr")
    ).toDF("doc_id", "text", "lang")
    val out = Curation.importanceWeights(docs, col("lang") === "en")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(out === Array(
      (0L, 3L, -348537L), (1L, 2L, -367513L),
      (2L, 3L, -3121125L), (3L, 2L, -1753807L)))
    // the selection property the scorer exists for: in-domain docs
    // outrank out-of-domain ones
    assert(out.filter(t => t._1 <= 1).map(_._3).min >
      out.filter(t => t._1 >= 2).map(_._3).max)
    spark.catalog.clearCache()
  }

  test("matryoshkaRecall: full/truncated agreement scores full recall") {
    import spark.implicits._
    // dTrunc=1, topK=1, 2-dim. Query 0 = [1,0]: id 20 = [2,0] is the
    // unambiguous best under BOTH rankings (full cos 1.0 vs negative
    // for id 21; trunc cos 1.0 vs -1.0) -> overlap 1.
    val corpus = Seq(
      (0L, Seq(1.0, 0.0)), (20L, Seq(2.0, 0.0)), (21L, Seq(-1.0, 0.5))
    ).toDF("vec_id", "v")
    val out = Similarity.matryoshkaRecall(
        corpus, corpus.filter(col("vec_id") === 0), dTrunc = 1, topK = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(out === Array((0L, 1L, 1000000L)))
    spark.catalog.clearCache()
  }

  test("matryoshkaRecall: engineered disagreement yields zero overlap") {
    import spark.implicits._
    // Query 0 = [1,0]; candidate 5 = [0.6,0.8] (full cos .6), candidate
    // 6 = [0.8,-0.6] (full cos .8 - full best). Truncated to dim 1 both
    // have cos 1.0; id tiebreak picks 5. Full top1 = 6, trunc top1 = 5.
    val corpus = Seq(
      (0L, Seq(1.0, 0.0)), (5L, Seq(0.6, 0.8)), (6L, Seq(0.8, -0.6))
    ).toDF("vec_id", "v")
    val out = Similarity.matryoshkaRecall(
        corpus, corpus.filter(col("vec_id") === 0), dTrunc = 1, topK = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(out === Array((0L, 0L, 0L)))
    spark.catalog.clearCache()
  }

  test("selectByScoreBudget: greedy prefix exact across buckets, ties by id") {
    import spark.implicits._
    // buckets=2 forces the cross-bucket path: scores 90,80,10,10,5 with
    // tokens 3,4,2,2,5 and budget 9 -> greedy order (90,80,10@id3,
    // 10@id4,5): cums 3,7,9,11,16 -> keep first three (ids 1,2,3).
    val scored = Seq(
      (1L, 3L, 90L), (2L, 4L, 80L), (3L, 2L, 10L), (4L, 2L, 10L),
      (5L, 5L, 5L)
    ).toDF("doc_id", "n_tok", "score_micro")
    val out = Curation.selectByScoreBudget(scored, budget = 9L, buckets = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3)))
    assert(out === Array((1L, 3L, 90L, 3L), (2L, 4L, 80L, 7L),
      (3L, 2L, 10L, 9L)))
    // empty input: no NPE, empty output
    assert(Curation.selectByScoreBudget(
      scored.filter(col("doc_id") < 0), budget = 9L).count() === 0L)
  }

  test("scoreAuc: rank-sum across buckets matches hand-computed AUC") {
    import spark.implicits._
    // buckets=2 (scores 5..30, width 13 -> {5,10} vs {20,30,30}).
    // Ascending (score, doc_id) ranks: d4->1, d1->2, d2->3, d3->4,
    // d5->5. Positives d1,d3 -> rsum 6, U = 6 - 2*3/2 = 3,
    // AUC = 3/(2*3) = 0.5 exactly.
    val labeled = Seq(
      (1L, 10L, 1), (2L, 20L, 0), (3L, 30L, 1), (4L, 5L, 0), (5L, 30L, 0)
    ).toDF("doc_id", "score_micro", "pos")
    val r = Curation.scoreAuc(labeled, buckets = 2).collect().head
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)) ===
      ((2L, 3L, 3L, 500000L)))
  }

  test("noveltyRates: shared trigram marks both docs, unique stays novel") {
    import spark.implicits._
    // doc0/doc1 share exactly the trigram "x y z"; every other trigram
    // is unique. doc0 grams: {a b x, b x y, x y z} -> 2/3 novel
    // (666666 ppm). doc1 grams: {x y z, y z q, z q r} -> 2/3 novel.
    // doc2 fully unique -> 1000000 ppm.
    val docs = Seq(
      (0L, "a b x y z"), (1L, "x y z q r"), (2L, "m n o p")
    ).toDF("doc_id", "text")
    val out = Dedup.noveltyRates(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(out === Array((0L, 3L, 2L, 666666L), (1L, 3L, 2L, 666666L),
      (2L, 2L, 2L, 1000000L)))
  }

  test("clusterSurvivors: longest wins, id breaks ties, drops accounted") {
    import spark.implicits._
    // cluster 1 = {1,2,3} lens 5,9,9: survivor 2 (len tie with 3, id
    // wins), dropped 5+9=14. cluster 7 = {7,8} lens 4,6: survivor 8.
    val clusters = Seq((1L, 1L), (2L, 1L), (3L, 1L), (7L, 7L), (8L, 7L))
      .toDF("doc_id", "cluster_id")
    val metric = Seq((1L, 5L), (2L, 9L), (3L, 9L), (7L, 4L), (8L, 6L))
      .toDF("doc_id", "len")
    val out = Dedup.clusterSurvivors(clusters, metric).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    assert(out === Array(
      (1L, 3L, 2L, 9L, 14L), (7L, 2L, 8L, 6L, 4L)))
  }

  test("selectionPipeline: AUC gate branches selection, report stays consistent") {
    import spark.implicits._
    val docs = Seq(
      (0L, "alpha alpha beta", "en"), (1L, "alpha gamma", "en"),
      (2L, "delta delta gamma", "fr"), (3L, "beta delta", "fr")
    ).toDF("doc_id", "text", "lang")
    // gate set above any achievable AUC: selection must NOT run —
    // empty selected frame, zeroed counts, null in-domain share
    val (_, _, selF, sumF) = Curation.selectionPipelineStages(
      docs, col("lang") === "en", budget = 100L, gatePpm = 1000001L)
    assert(selF.count() === 0L)
    val rf = sumF.collect().head
    assert((rf.getLong(0), rf.getInt(2), rf.getLong(3), rf.getLong(4)) ===
      ((4L, 0, 0L, 0L)))
    assert(rf.isNullAt(5))
    // gate at 0: selection runs and must equal the direct q268 call
    val (scored, auc, selT, sumT) = Curation.selectionPipelineStages(
      docs, col("lang") === "en", budget = 5L, gatePpm = 0L)
    assert(auc.collect().head.getLong(3) === 1000000L) // perfect scorer here
    assert(selT.collect().toSeq ===
      Curation.selectByScoreBudget(scored, budget = 5L).collect().toSeq)
    val rt = sumT.collect().head
    // budget 5: greedy takes doc0 (3 tok) then doc1 (2 tok) — both en
    assert((rt.getInt(2), rt.getLong(3), rt.getLong(4), rt.getLong(5)) ===
      ((1, 2L, 5L, 1000000L)))
    spark.catalog.clearCache()
  }

  test("exactSubstrRemovalHashed equals the exact form, catalog corpus included") {
    import spark.implicits._
    // the SelectionOpsSpec q263 fixture (islands merge, gaps split,
    // short docs) plus the sf0.001 catalog corpus: the hashed exchange
    // must reproduce the exact form's output bit for bit
    val hand = Seq(
      (0L, "abcdefgh"), (1L, "qqcdefqq"), (2L, "mnabcdeuv"),
      (3L, "klabcdest"), (4L, "abcdXXXXcdef"), (5L, "xy")
    ).toDF("doc_id", "text")
    assert(Dedup.exactSubstrRemovalHashed(hand, l = 4).collect().toSeq ===
      Dedup.exactSubstrRemoval(hand, l = 4).collect().toSeq)
    val docs = Tables.documents(spark, TestSpark.Sf0001)
    assert(Dedup.exactSubstrRemovalHashed(docs).collect().toSeq ===
      Dedup.exactSubstrRemoval(docs).collect().toSeq)
    spark.catalog.clearCache()
  }

  test("noveltyRatesHashed equals the exact form, catalog corpus included") {
    import spark.implicits._
    val hand = Seq(
      (0L, "a b x y z"), (1L, "x y z q r"), (2L, "m n o p")
    ).toDF("doc_id", "text")
    assert(Dedup.noveltyRatesHashed(hand).collect().toSeq ===
      Dedup.noveltyRates(hand).collect().toSeq)
    val docs = Tables.documents(spark, TestSpark.Sf0001)
    assert(Dedup.noveltyRatesHashed(docs).collect().toSeq ===
      Dedup.noveltyRates(docs).collect().toSeq)
    spark.catalog.clearCache()
  }

  test("blocklistHitsLarge: token-anchored hits, boundary non-hit, short docs") {
    import spark.implicits._
    // phrases: "a b c", "p q r". doc0 contains "a b c" as whole tokens
    // (1 hit). doc1 contains it only inside longer tokens ("xa b cy") —
    // a SUBSTRING match (q271 semantics) but NOT a token-anchored one:
    // must be 0 here (the ADVICE-r12 divergence case, pinned). doc2
    // hits both phrases once each, duplicated occurrences of "p q r"
    // counted ONCE (distinct-phrase count). doc3 has fewer tokens than
    // n=3: zero grams, still emitted with 0.
    val docs = Seq(
      (0L, "m a b c n"), (1L, "xa b cy"), (2L, "a b c p q r p q r"),
      (3L, "a b")
    ).toDF("doc_id", "text")
    val phrases = Seq("a b c", "p q r").toDF("g")
    val out = operators.Curation.blocklistHitsLarge(docs, phrases)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    assert(out === Array((0L, 1L, 1), (1L, 0L, 0), (2L, 2L, 1),
      (3L, 0L, 0)))
    // cross-check: q271's substring form DOES hit doc1 — the semantic
    // divergence both scaladocs document
    assert(docs.filter(col("doc_id") === 1L)
      .join(broadcast(phrases), col("text").contains(col("g")))
      .count() === 1L)
  }

  test("blocklistHitsLarge: shuffle-on-gram-hash path equals the broadcast form") {
    import spark.implicits._
    // the beyond-broadcast fallback (q286) must be result-identical to
    // the broadcast form absent 64-bit collisions — on the hand corpus
    // AND on the catalog corpus with its self-mined 1000-phrase list
    val docs = Seq(
      (0L, "m a b c n"), (1L, "xa b cy"), (2L, "a b c p q r p q r"),
      (3L, "a b")
    ).toDF("doc_id", "text")
    val phrases = Seq("a b c", "p q r").toDF("g")
    assert(operators.Curation.blocklistHitsLarge(docs, phrases,
        broadcastList = false).collect().toSeq ===
      operators.Curation.blocklistHitsLarge(docs, phrases).collect().toSeq)
    val corpus = Tables.documents(spark, TestSpark.Sf0001)
    val block = Dedup.shingles(corpus)
      .groupBy(col("g")).agg(count(lit(1)).as("df"))
      .orderBy(col("df").desc, col("g")).limit(1000).select(col("g"))
    assert(operators.Curation.blocklistHitsLarge(corpus, block,
        broadcastList = false).collect().toSeq ===
      operators.Curation.blocklistHitsLarge(corpus, block).collect().toSeq)
    spark.catalog.clearCache()
  }

  test("matryoshkaRecall ppm grid is exact when topK does not divide 1e6") {
    import spark.implicits._
    // topK=3 with full agreement must read exactly 1000000 ppm, not
    // 3 * (1000000 div 3) = 999999 (ADVICE r12): query [1,0] against
    // candidates on the positive x-axis — both rankings identical.
    val corpus = Seq(
      (0L, Seq(1.0, 0.0)), (10L, Seq(2.0, 0.0)), (11L, Seq(3.0, 0.1)),
      (12L, Seq(4.0, 0.2)), (13L, Seq(-5.0, 0.0))
    ).toDF("vec_id", "v")
    val out = Similarity.matryoshkaRecall(
        corpus, corpus.filter(col("vec_id") === 0), dTrunc = 1, topK = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(out === Array((0L, 3L, 1000000L)))
    spark.catalog.clearCache()
  }
}
