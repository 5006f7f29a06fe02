package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins the pluggable pair-finding stage of the composed curation
  * pipeline: on this corpus the planted near-dups all have Jaccard
  * ≥ 0.5 and the LSH miss probability at those similarities is
  * negligible (see Dedup.scala scaladoc), so the exact, df-capped and
  * MinHash stages must produce the SAME curated output — which is the
  * argument that lets a 100 TB user swap the Σdf² truth stage for the
  * scale-safe variants without changing results.
  */
class CurateSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = TestSpark.Sf0001

  private def packedCounts(pairFinder: DataFrame => DataFrame): (Long, Long, Long) = {
    val all = Tables.documents(spark, sf)
    val train = all.filter(col("doc_id") % 10 =!= 0)
    val bench = all.filter(col("doc_id") % 10 === 0)
    val (_, deduped, clean, packed) =
      operators.Curation.curateStages(train, bench, 512, pairFinder)
    val r = (deduped.count(), clean.count(), packed.count())
    spark.catalog.clearCache()
    r
  }

  test("curate(exact) == curate(dfCapped) == curate(minhash) on this corpus") {
    val exact = packedCounts(operators.Dedup.exactNearDups(_))
    assert(exact._1 > 0 && exact._2 > 0 && exact._3 > 0)
    assert(packedCounts(operators.Dedup.dfCappedNearDups(_)) === exact)
    assert(packedCounts(operators.Dedup.minhashNearDups(_)) === exact)
  }

  test("curate survivor ids identical across pair-finding stages") {
    val all = Tables.documents(spark, sf)
    val train = all.filter(col("doc_id") % 10 =!= 0)
    val bench = all.filter(col("doc_id") % 10 === 0)
    def survivors(pf: DataFrame => DataFrame): Set[Long] = {
      val ids = operators.Curation.curate(train, bench, 512, pf)
        .select("doc_id").collect().map(_.getLong(0)).toSet
      spark.catalog.clearCache()
      ids
    }
    val exact = survivors(operators.Dedup.exactNearDups(_))
    assert(exact.nonEmpty)
    assert(survivors(operators.Dedup.minhashNearDups(_)) === exact)
  }
}
