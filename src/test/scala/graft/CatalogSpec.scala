package graft

import org.scalatest.funsuite.AnyFunSuite

/** Catalog-level contract checks + semantic cross-checks between the
  * approximate (hash-seeded, oracle-less) operators and their exact
  * ground-truth counterparts at sf0.001.
  */
class CatalogSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = TestSpark.Sf0001

  test("driver contract: oracle keys ⊆ query keys, names unique") {
    val defs = SparkEntry.allDefs
    assert(defs.map(_.name).distinct.size === defs.size)
    assert(SparkEntry.oracleSql.keySet.subsetOf(SparkEntry.queries.keySet))
  }

  test("driver smoke: entry() returns rows on sf0.001") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("MinHash-LSH near-dup pairs equal the exact n-gram Jaccard truth") {
    val exact = SparkEntry.queries("q30_dedup_ngram_jaccard")(spark, sf)
      .select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val minhash = SparkEntry.queries("q28_dedup_minhash_lsh")(spark, sf)
      .select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(exact.nonEmpty) // the corpus has planted near-dups
    assert(minhash === exact)
  }

  test("SimHash finds most true near-dup pairs (different similarity notion)") {
    val exact = SparkEntry.queries("q30_dedup_ngram_jaccard")(spark, sf)
      .select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val simhash = SparkEntry.queries("q29_dedup_simhash")(spark, sf)
      .select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = exact.count(simhash.contains).toDouble / exact.size
    assert(recall >= 0.7, s"simhash recall $recall")
  }

  test("LSH ANN reaches ≥50% recall@10 vs brute force") {
    val brute = SparkEntry.queries("q32_ann_bruteforce_topk")(spark, sf)
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = SparkEntry.queries("q33_ann_lsh_topk")(spark, sf)
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = brute.count(lsh.contains).toDouble / brute.size
    assert(recall >= 0.5, s"ann recall $recall")
  }

  test("proto roundtrip query reports zero corrupt envelopes") {
    val rows = SparkEntry.queries("q41_proto_roundtrip")(spark, sf).collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_.getAs[Long]("ok") == 1L))
    assert(rows.forall(_.getAs[Long]("wire_len") > 0L))
  }

  test("media features pipeline is deterministic and complete") {
    val df = SparkEntry.queries("q39_media_features")(spark, sf)
    val rows = df.collect()
    assert(rows.length === 500)
    val again = SparkEntry.queries("q39_media_features")(spark, sf).collect()
    assert(rows.map(_.toString).toSeq === again.map(_.toString).toSeq)
  }

  test("BenchBaselines names exactly track the declared catalog") {
    // drift guard: a renamed/removed query with a stale baseline entry
    // would silently lose its wave re-probe (Bench only probes names it
    // can look up), and a new query should be pinned next round
    val declared = SparkEntry.allDefs.map(_.name).toSet
    val pinned = BenchBaselines.sec.keySet
    assert((pinned -- declared).isEmpty,
      s"baseline entries for unknown queries: ${(pinned -- declared).toSeq.sorted}")
    assert((declared -- pinned).isEmpty,
      s"declared queries missing a baseline pin: ${(declared -- pinned).toSeq.sorted}")
    // the provisional set feeds the letter's widened 2x threshold: a
    // stale name after a rename would silently hold NOTHING to 2x
    // while the renamed query gets the tight 1.5x letter it shouldn't
    assert((BenchBaselines.provisional -- declared).isEmpty,
      s"provisional entries for unknown queries: ${(BenchBaselines.provisional -- declared).toSeq.sorted}")
  }
}
