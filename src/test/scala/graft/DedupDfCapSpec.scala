package graft

import org.scalatest.funsuite.AnyFunSuite

class DedupDfCapSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = TestSpark.Sf0001

  test("df-capped near-dup finds the same pairs as the exact truth here") {
    val exact = SparkEntry.queries("q30_dedup_ngram_jaccard")(spark, sf)
      .select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val capped = SparkEntry.queries("q50_neardup_dfcapped")(spark, sf)
      .select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(exact.nonEmpty)
    // pruning only lowers jaccard evidence → capped ⊆ exact always;
    // at this corpus's df distribution nothing is lost either
    assert(capped.subsetOf(exact))
    assert(capped === exact)
  }
}
