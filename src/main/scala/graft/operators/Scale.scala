package graft.operators

import graft.{QueryDef, Tables}
import graft.functions.{CosineSimilarity, VectorFunctions => VF}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Scale-technique operators: IVF-style ANN (coarse quantizer + probed
  * inverted lists) and salt-based skew mitigation. Both produce results
  * identical to their naive forms — the point is the PLAN shape at 100 TB.
  */
object Scale {

  def defs: Seq[QueryDef] = Seq(q47, q48)

  /** IVF (inverted-file) ANN: a deterministic coarse "codebook" (every
    * k-th vector by id — a seeded sample stands in for trained k-means
    * centroids; the plan shape is what matters), each corpus vector
    * assigned to its nearest centroid (one fused-cosine per centroid,
    * argmax via greatest-struct), queries probe the 4 nearest lists.
    * The corpus scan for assignment is one pass; the search join touches
    * only the probed lists — the IVF trade vs LSH banding is fewer,
    * larger buckets and a tunable nprobe. Rows-only (codebook choice is
    * engine-defined); recall vs q32 asserted in ScaleSpec.
    */
  val q47: QueryDef = QueryDef.rowsOnly("q47_ann_ivf_topk") { (s, d) =>
    val nCentroids = 16
    val nProbe = 4 // 4/16 lists probed; recall@10 ≈ 0.6 on this corpus
    // (random data has no cluster structure — IVF shines when it does;
    // the untrained even-spaced codebook is the worst case)
    val e = Tables.embeddings(s, d)
      .select(col("vec_id"), VF.asDouble(col("embedding")).as("v"))
    // deterministic codebook: 16 evenly-spaced vectors by id (collect is
    // 16 rows — codebook init, the one legitimate driver-side step)
    val n = e.count()
    val step = math.max(1L, n / nCentroids)
    val centroids = e.filter(col("vec_id") % step === 0 && col("vec_id") / step < nCentroids)
      .orderBy(col("vec_id"))
      .collect()
      .map(r => (r.getLong(0) / step, r.getSeq[Double](1)))
    // nearest-centroid assignment: array of (sim, cid) structs → array_max
    def bestOf(vcol: org.apache.spark.sql.Column, k: Int) = {
      val sims = centroids.map { case (cid, cv) =>
        struct(CosineSimilarity.cosineSim(vcol, typedLit(cv)).as("sim"),
          lit(cid).as("cid"))
      }
      array_sort(array(sims: _*)) // ascending by sim, then cid
    }
    val corpus = e.withColumn("ranked", bestOf(col("v"), 1))
      .withColumn("cid", element_at(col("ranked"), -1).getField("cid"))
      .select(col("vec_id").as("neighbor_id"), col("v").as("vc"), col("cid"))
    val queries = e.filter(col("vec_id") < 5)
      .withColumn("ranked", bestOf(col("v"), nProbe))
      .select(col("vec_id").as("query_id"), col("v").as("vq"),
        explode(slice(col("ranked"), -nProbe, nProbe)).as("probe"))
      .select(col("query_id"), col("vq"), col("probe.cid").as("cid"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cs").desc, col("neighbor_id"))
    broadcast(queries).join(corpus, Seq("cid"))
      .filter(col("neighbor_id") =!= col("query_id"))
      .dropDuplicates("query_id", "neighbor_id")
      .withColumn("cs", CosineSimilarity.cosineSim(col("vq"), col("vc")))
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= 10)
      .select(col("query_id"), col("neighbor_id"), col("rnk"),
        round(col("cs"), 6).as("cos_sim"))
      .orderBy(col("query_id"), col("rnk"))
  }

  /** Skew-mitigated join via salting, oracle-checked: the join key
    * l_returnflag has 3 values over the whole fact table — a direct
    * shuffle join puts ~1/3 of 100 TB in ONE reducer. Salting: fact side
    * gets salt = l_orderkey % 16 (deterministic, no rand()); the dim side
    * is exploded ×16; the join key becomes (flag, salt) → 48 evenly-sized
    * partitions. The aggregate then re-merges across salts. Result is
    * IDENTICAL to the unsalted join — which is exactly what the oracle
    * checks (its SQL is the naive join).
    */
  val q48: QueryDef = QueryDef.checked(
    "q48_skew_salted_join",
    """SELECT f.flag, f.adj,
      | CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS revenue,
      | COUNT(*) AS n
      |FROM lineitem JOIN (VALUES ('A', 0.9), ('N', 1.0), ('R', 0.8)) f(flag, adj)
      |  ON l_returnflag = f.flag
      |GROUP BY f.flag, f.adj ORDER BY f.flag""".stripMargin) { (s, d) =>
    import s.implicits._
    val nSalts = 16
    val dim = Seq(("A", 0.9), ("N", 1.0), ("R", 0.8)).toDF("flag", "adj")
    val saltedDim = dim.withColumn("salt",
      explode(array((0 until nSalts).map(lit(_)): _*)))
    val fact = Tables.lineitem(s, d)
      .select(col("l_returnflag"), col("l_extendedprice"), col("l_discount"),
        (col("l_orderkey") % nSalts).cast("int").as("salt"))
    fact.join(saltedDim,
        fact("l_returnflag") === saltedDim("flag") && fact("salt") === saltedDim("salt"))
      .groupBy(col("flag"), col("adj"))
      .agg(Exact.sum4(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("revenue"),
        count(lit(1)).as("n"))
      .orderBy(col("flag"))
  }
}
