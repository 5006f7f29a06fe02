package graft

import java.nio.file.Files
import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

/** The persistent-index dedup flow: build banded MinHash signatures
  * once, write them to parquet, and dedup an ingest increment against
  * the STORED index (plus within the increment) without re-shingling
  * the corpus. Must reproduce exactly what the one-shot pipeline finds
  * for pairs touching the increment.
  */
class MinhashIndexSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = TestSpark.Sf0001

  private def pairs(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
    df.select("doc_a", "doc_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

  test("stored signature index reproduces one-shot minhash dedup incrementally") {
    val docs = Tables.documents(spark, sf).select("doc_id", "text")
    val cut = 450L
    val index = docs.filter(col("doc_id") < cut)
    val fresh = docs.filter(col("doc_id") >= cut)

    val dir = Files.createTempDirectory("graft-mhidx").toString
    operators.Dedup.minhashSignatures(index)
      .write.mode("overwrite").parquet(dir)
    // a NEW read of the stored index — nothing shared with the build plan
    val indexSigs = spark.read.parquet(dir)

    val cand = operators.Dedup.minhashCandidatesAgainst(
      indexSigs, operators.Dedup.minhashSignatures(fresh))
    val got = pairs(operators.Dedup.jaccardVerify(docs, cand))

    val full = pairs(operators.Dedup.minhashNearDups(docs))
    val expected = full.filter(p => p._1 >= cut || p._2 >= cut)
    assert(expected.nonEmpty, "fixture must contain pairs touching the increment")
    assert(got === expected)
    spark.catalog.clearCache()
  }

  test("signatures are session-independent (seed-deterministic)") {
    val docs = Tables.documents(spark, sf).select("doc_id", "text").limit(50)
    val a = operators.Dedup.minhashSignatures(docs)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    val b = operators.Dedup.minhashSignatures(docs)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    assert(a === b)
    assert(a.nonEmpty)
  }
}
