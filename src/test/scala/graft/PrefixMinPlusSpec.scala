package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Dedup, Graph}

/** Pins the two round-6 scale-path algorithms to sequential references:
  *
  *  - prefix-filtered set-similarity join (q187): candidate generation
  *    by rarity-ordered prefixes must be EXACT — equal, pair for pair
  *    and score for score, to the all-shingles self-join (q30's path)
  *    on random corpora with planted near-dups. This is the property
  *    the AllPairs pigeonhole argument promises; a broken prefix length
  *    or a wrong global order silently LOSES pairs, which no rows-only
  *    check would catch.
  *
  *  - bounded-horizon min-plus distances (q194): the 3-round doubling
  *    must equal a sequential hop-bounded Bellman–Ford (exactly ≤ 2^3
  *    edges) on random weighted digraphs, including cyclic ones.
  */
class PrefixMinPlusSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  // ----- prefix filter ≡ exact --------------------------------------

  /** Deterministic corpus: base docs of random tokens, plus mutated
    * copies (token substitutions at increasing rates) so the Jaccard
    * spectrum straddles the 0.5 threshold.
    */
  private def corpus(seed: Long, nBase: Int, vocab: Int): Seq[(Long, String)] = {
    val rnd = new scala.util.Random(seed)
    val base = (0 until nBase).map { i =>
      val len = 12 + rnd.nextInt(20)
      (i.toLong, Seq.fill(len)(s"w${rnd.nextInt(vocab)}").mkString(" "))
    }
    val mutated = base.flatMap { case (id, text) =>
      val toks = text.split(" ")
      (1 to 2).map { m =>
        // 5% keeps trigram survival (0.95)³ ≈ 0.86 → jac ≈ 0.75 (true
        // positives); 25% → ≈ 0.27 (true negatives the filter must
        // reject) — the spectrum straddles the 0.5 threshold
        val rate = if (m == 1) 0.05 else 0.25
        val t2 = toks.map(t =>
          if (rnd.nextDouble() < rate) s"w${rnd.nextInt(vocab)}" else t)
        (id + 10000L * m, t2.mkString(" "))
      }
    }
    base ++ mutated
  }

  test("prefix-filtered near-dups equal the exact all-shingles join") {
    import spark.implicits._
    for (seed <- Seq(1L, 2L, 3L)) {
      val docs = corpus(seed, nBase = 30, vocab = 40).toDF("doc_id", "text")
      val exact = Dedup.exactNearDups(docs, persistShingles = false)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      val pref = Dedup.prefixFilterNearDups(docs, persistShingles = false)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      assert(pref == exact,
        s"seed=$seed: prefix path lost/gained pairs: " +
          s"missing=${exact -- pref} extra=${pref -- exact}")
      assert(exact.nonEmpty, s"seed=$seed: vacuous corpus — no near-dup pairs")
      spark.catalog.clearCache()
    }
  }

  // ----- min-plus doubling ≡ hop-bounded Bellman–Ford ----------------

  /** Sequential reference: cheapest cost over paths with ≤ maxHops
    * edges, DP over hop count.
    */
  private def hopBounded(edges: Seq[(Long, Long, Long)], maxHops: Int)
      : Map[(Long, Long), Long] = {
    // collapse parallel edges to min weight
    val e = edges.groupBy(t => (t._1, t._2))
      .map { case (k, v) => (k._1, k._2, v.map(_._3).min) }.toSeq
    var dist = e.map(t => (t._1, t._2) -> t._3).toMap
    var frontier = dist // paths of exactly ≤ current hop bound
    for (_ <- 2 to maxHops) {
      val next = for {
        ((a, m), d1) <- frontier.toSeq
        (m2, b, w) <- e if m2 == m
      } yield (a, b) -> (d1 + w)
      val merged = (dist.toSeq ++ next).groupBy(_._1)
        .map { case (k, v) => k -> v.map(_._2).min }
      if (merged == dist) return dist
      frontier = merged
      dist = merged
    }
    dist
  }

  test("3-round min-plus doubling equals sequential ≤8-hop Bellman–Ford") {
    import spark.implicits._
    for (seed <- Seq(11L, 12L, 13L)) {
      val rnd = new scala.util.Random(seed)
      val n = 25
      val edges = Seq.fill(80)(
        (rnd.nextInt(n).toLong, rnd.nextInt(n).toLong, 1L + rnd.nextInt(9)))
        .filter(t => t._1 != t._2)
      val ref = hopBounded(edges, maxHops = 8)
      val got = Graph.boundedMinPlusDistances(
          edges.toDF("src", "dst", "w"), rounds = 3)
        .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
      assert(got == ref,
        s"seed=$seed: mismatch: " +
          s"onlyRef=${ref.toSet -- got.toSet} onlyGot=${got.toSet -- ref.toSet}")
    }
  }
}
