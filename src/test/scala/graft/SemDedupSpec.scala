package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Semantic dedup (q81): soundness on the catalog corpus (every drop is
  * a true cosine-≥τ pair with a smaller surviving id) and recall on a
  * planted fixture (near-identical vectors MUST be caught — they land in
  * the same k-means cluster because their centroid rankings coincide up
  * to the perturbation).
  */
class SemDedupSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = TestSpark.Sf0001

  test("drops on the catalog corpus are a sound subset of the exact pair set") {
    val sem = SparkEntry.queries("q81_semantic_dedup")(spark, sf)
    val dropped = sem.filter(!col("keep")).select("vec_id").collect()
      .map(_.getLong(0)).toSet
    val exactDupBs = SparkEntry.queries("q31_embedding_neardup")(spark, sf)
      .select("id_b").collect().map(_.getLong(0)).toSet
    spark.catalog.clearCache()
    assert(dropped.nonEmpty, "catalog corpus has ≥0.4-cosine pairs; some must be caught")
    assert(dropped.subsetOf(exactDupBs),
      s"every semantic drop must be an exact near-dup id_b: ${dropped -- exactDupBs}")
  }

  test("planted near-identical pairs are caught with recall ≥ 0.9") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(11)
    val dim = 32; val nBase = 200; val nDups = 20
    def normalize(v: Array[Double]): Array[Double] = {
      val n = math.sqrt(v.map(x => x * x).sum); v.map(_ / n)
    }
    val base = Array.fill(nBase)(normalize(Array.fill(dim)(rnd.nextGaussian())))
    // dup i duplicates base i with a 1e-3 perturbation → cosine ≈ 0.999
    val dups = (0 until nDups).map { i =>
      normalize(base(i).map(_ + rnd.nextGaussian() * 1e-3))
    }
    val rows: Seq[(Long, Seq[Double])] =
      base.zipWithIndex.map { case (v, i) => (i.toLong, v.toSeq) }.toSeq ++
        dups.zipWithIndex.map { case (v, i) => ((nBase + i).toLong, v.toSeq) }
    val res = operators.Similarity
      .semanticDedup(rows.toDF("vec_id", "v"), threshold = 0.95, nClusters = 8)
    val dropped = res.filter(!col("keep")).select("vec_id").collect()
      .map(_.getLong(0)).toSet
    spark.catalog.clearCache()
    // each planted dup has exactly one ≥0.95 partner (its base, smaller id)
    val expected = (nBase until nBase + nDups).map(_.toLong).toSet
    val recall = expected.count(dropped.contains).toDouble / expected.size
    assert(recall >= 0.9, s"planted recall $recall, caught ${dropped.size}")
    // soundness: nothing outside the planted dups is dropped at τ=0.95
    // (base vectors are random — spurious 0.95 cosine is implausible)
    assert((dropped -- expected).isEmpty,
      s"unexpected drops: ${dropped -- expected}")
  }
}
