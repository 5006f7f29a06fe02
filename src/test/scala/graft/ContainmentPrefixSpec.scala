package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

/** Certifies the q290 prefix-filtered containment path against the q182
  * exact truth — the one-truth-many-paths discipline (q30/q50/q187,
  * q263/q278): the asymmetric prefix filter is PROVABLY exact (the
  * pigeonhole argument in the scaladoc), and these tests pin the proof
  * against the implementation on the catalog corpus, on random corpora,
  * and on a planted excerpt pair whose Jaccard is far below any
  * symmetric threshold.
  */
class ContainmentPrefixSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = TestSpark.Sf0001

  private def scored(df: DataFrame): Set[(Long, Long, Long, Long, Long)] =
    df.select("doc_a", "doc_b", "inter", "size_a", "containment_ppm")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSet

  test("prefix-filtered containment equals the exact truth on the catalog") {
    val docs = Tables.documents(spark, sf).select("doc_id", "text")
    val exact = scored(operators.Dedup.containmentPairs(docs))
    spark.catalog.clearCache()
    val prefix = scored(operators.Dedup.containmentPairsPrefix(docs))
    assert(exact.nonEmpty)
    assert(prefix === exact)
    spark.catalog.clearCache()
  }

  test("planted excerpt: low Jaccard, containment 1.0, found by both paths") {
    val s = spark
    import s.implicits._
    // doc 1 is a verbatim 8-token excerpt of the 60-token doc 0: every
    // trigram of doc 1 occurs in doc 0 (containment 10⁶ ppm) while
    // Jaccard ≈ 6/58 — the subsumption case the symmetric near-dup
    // family structurally misses
    val big = (0 until 60).map(i => s"w$i").mkString(" ")
    val excerpt = (20 until 28).map(i => s"w$i").mkString(" ")
    val filler = (0 until 10).map(i =>
      s"filler$i aaa$i bbb$i ccc$i ddd$i eee$i fff$i ggg$i")
    val corpus = ((0L, big) +: (1L, excerpt) +: filler.zipWithIndex.map {
      case (t, i) => ((i + 2).toLong, t)
    }).toDF("doc_id", "text")
    val exact = scored(operators.Dedup.containmentPairs(corpus))
    spark.catalog.clearCache()
    val prefix = scored(operators.Dedup.containmentPairsPrefix(corpus))
    // 8 tokens → 6 trigrams, all inside doc 0 → exactly the (1→0) edge
    assert(exact === Set((1L, 0L, 6L, 6L, 1000000L)))
    assert(prefix === exact)
    spark.catalog.clearCache()
  }

  test("property: prefix == exact across random corpora and thresholds") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(290L)
    for (trial <- 1 to 3) {
      // skew-heavy random corpus: a tiny vocabulary makes boilerplate
      // grams (high df — the prefix filter's adversarial case) and
      // random excerpts plant real containment edges
      val vocabSize = 8 + rnd.nextInt(10)
      def randDoc(len: Int): String =
        (0 until len).map(_ => s"v${rnd.nextInt(vocabSize)}").mkString(" ")
      val bases = (0 until 12).map(i => (i.toLong, randDoc(8 + rnd.nextInt(40))))
      val excerpts = (0 until 6).map { i =>
        val (_, t) = bases(rnd.nextInt(bases.size))
        val toks = t.split(" ")
        val from = rnd.nextInt(math.max(1, toks.length - 4))
        val len = 4 + rnd.nextInt(math.max(1, toks.length - from - 3))
        ((100 + i).toLong, toks.slice(from, from + len).mkString(" "))
      }
      val corpus = (bases ++ excerpts).toDF("doc_id", "text")
      val minPpm = Seq(300000L, 500000L, 800000L)(trial % 3)
      val exact = scored(operators.Dedup.containmentPairs(corpus, minPpm))
      spark.catalog.clearCache()
      val prefix = scored(operators.Dedup.containmentPairsPrefix(corpus, minPpm))
      assert(prefix === exact, s"trial $trial minPpm=$minPpm vocab=$vocabSize")
      spark.catalog.clearCache()
    }
  }

  test("degenerate thresholds: minPpm above 10⁶ yields empty, tiny minPpm all") {
    val s = spark
    import s.implicits._
    val corpus = Seq((0L, "a b c d e f"), (1L, "a b c d"), (2L, "x y z w"))
      .toDF("doc_id", "text")
    // t(A) > |A| → prefix length ≤ 0 → provably empty on both paths
    assert(scored(operators.Dedup.containmentPairsPrefix(corpus, 1500000L))
      .isEmpty)
    spark.catalog.clearCache()
    // minPpm = 1: every sharing pair qualifies; both directions emitted
    val exact = scored(operators.Dedup.containmentPairs(corpus, 1L))
    spark.catalog.clearCache()
    val prefix = scored(operators.Dedup.containmentPairsPrefix(corpus, 1L))
    assert(prefix === exact)
    assert(prefix.exists(p => p._1 == 0L && p._2 == 1L))
    assert(prefix.exists(p => p._1 == 1L && p._2 == 0L))
    spark.catalog.clearCache()
  }
}
