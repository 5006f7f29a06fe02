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

  test("int8 quantization: reconstruction cosine ≥ 0.99, codes within int8 range") {
    val res = graft.operators.Similarity.quantizeInt8(
      graft.Tables.embeddings(spark, sf)
        .selectExpr("vec_id", "cast(embedding as array<double>) as v")).collect()
    val vecs = graft.Tables.embeddings(spark, sf)
      .selectExpr("vec_id", "cast(embedding as array<double>) as v").collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).toMap
    spark.catalog.clearCache()
    res.foreach { r =>
      val (id, scale) = (r.getLong(0), r.getDouble(1))
      val qv = r.getSeq[Int](2).toArray
      assert(qv.forall(q => q >= -127 && q <= 127), s"codes in range for $id")
      val v = vecs(id)
      val rec = qv.map(_ / scale)
      val cos = {
        val d = v.zip(rec).map { case (a, b) => a * b }.sum
        d / (math.sqrt(v.map(x => x * x).sum) * math.sqrt(rec.map(x => x * x).sum))
      }
      assert(cos >= 0.99, s"reconstruction cosine $cos for $id")
    }
  }

  test("JL projection approximately preserves pairwise cosine structure") {
    val vecs = graft.Tables.embeddings(spark, sf)
      .selectExpr("vec_id", "cast(embedding as array<double>) as v").collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).toMap
    val proj = operators.Similarity.randomProject(
        graft.Tables.embeddings(spark, sf)
          .selectExpr("vec_id", "cast(embedding as array<double>) as v"))
      .collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).toMap
    spark.catalog.clearCache()
    def cos(a: Array[Double], b: Array[Double]): Double = {
      val d = a.zip(b).map { case (x, y) => x * y }.sum
      d / (math.sqrt(a.map(x => x * x).sum) * math.sqrt(b.map(x => x * x).sum))
    }
    assert(proj.head._2.length == 16, "projected to 16 dims")
    val rnd = new scala.util.Random(3)
    val ids = vecs.keys.toArray.sorted
    val errs = (0 until 200).map { _ =>
      val a = ids(rnd.nextInt(ids.length)); val b = ids(rnd.nextInt(ids.length))
      math.abs(cos(vecs(a), vecs(b)) - cos(proj(a), proj(b)))
    }
    val mean = errs.sum / errs.size
    // JL's distortion bound at k=16, n=500 is ~sqrt(ln n / k) ≈ 0.6;
    // the ±1 sign matrix lands ~0.20 mean on this corpus (the previous
    // 0.2 line was tuned to one lucky Gaussian draw) — 0.25 still pins
    // "geometry preserved" with margin against a broken projection,
    // which scores ≥ 0.5 here
    assert(mean <= 0.25, s"mean cosine distortion $mean too high for k=16")
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
