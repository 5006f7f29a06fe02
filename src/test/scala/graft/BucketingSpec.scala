package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins the claim bucketing exists to make: a join of two tables
  * bucketed by their join key plans with ZERO exchanges (no shuffle, no
  * broadcast) and no runtime sort, and the co-location changes nothing
  * about the result. Broadcast is disabled for the pin — at toy scale
  * AQE would otherwise pick a broadcast join, which is exactly what a
  * 100 TB fact⋈fact join cannot do.
  */
class BucketingSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = TestSpark.Sf0001

  test("bucketed co-located join: zero exchanges, sort-merge, bucket-sorted scan") {
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val df = SparkEntry.queries("q80_bucketed_join")(spark, sf)
      df.collect()
      val plan = df.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"),
        s"expected a sort-merge join over the bucketed scans:\n$plan")
      assert(!plan.contains("Exchange") && !plan.contains("ShuffleQueryStage"),
        s"bucketed join + co-located agg must be exchange-free:\n$plan")
      // a LOCAL per-bucket sort remains: since 3.0 Spark only trusts
      // sortBy file order behind spark.sql.legacy.bucketedTableScan.
      // outputOrdering (multi-file buckets would need a merge). The sort
      // is per-partition and spillable — the scale win (no exchange)
      // stands; pin that the scan at least reports the bucketing.
      assert(plan.contains("Bucketed: true"),
        s"scan must use the bucketed layout:\n$plan")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("bucketing is invisible to semantics: equals the plain shuffle join") {
    val bucketed = SparkEntry.queries("q80_bucketed_join")(spark, sf)
    val li = Tables.lineitem(spark, sf).filter(col("l_orderkey") < 5000)
    val ord = Tables.orders(spark, sf).filter(col("o_orderkey") < 5000)
    val plain = li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("l_orderkey"))
      .agg(count(lit(1)).as("n_items"),
        sum(col("l_quantity").cast(org.apache.spark.sql.types.DecimalType(18, 2)))
          .cast("double").as("sum_qty"),
        sum(col("l_extendedprice").cast(org.apache.spark.sql.types.DecimalType(18, 2)))
          .cast("double").as("revenue"),
        min(col("o_custkey")).as("custkey"))
    assert(bucketed.exceptAll(plain).isEmpty && plain.exceptAll(bucketed).isEmpty,
      "bucketed and plain join results must be identical multisets")
  }

  test("bucketed pagerank: per-round edge side is exchange-free off the layout") {
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val df = SparkEntry.queries("q133_pagerank_bucketed")(spark, sf)
      df.collect()
      val plan = df.queryExecution.executedPlan.toString
      assert(plan.contains("Bucketed: true"),
        s"every iteration's edge scan must come off the bucketed layout:\n$plan")
      // 3 iterations: each may shuffle the RANK side into the join and the
      // dst roll-up — but NEVER the edges side. With the init scan's
      // distinct also served by the layout, hash exchanges are bounded by
      // 2 per iteration (the single-partition count exchange for n_nodes
      // and the 1-row broadcasts are not hash shuffles).
      // the AQE string prints Final AND Initial plans — count the final only
      val finalPlan = plan.split("== Initial Plan ==").head
      val hashExchanges =
        "Exchange hashpartitioning".r.findAllIn(finalPlan).size
      assert(hashExchanges <= 6,
        s"expected ≤ 2 hash exchanges per iteration (rank side + dst agg), " +
          s"got $hashExchanges:\n$plan")
      // and the layout result is bit-identical to the in-memory variant
      val classic = SparkEntry.queries("q110_pagerank")(spark, sf)
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      spark.catalog.clearCache()
      val bucketed = df.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(bucketed == classic,
        "bucketed and persisted pagerank must produce identical ranks")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("q242 point lookup reads only the probed buckets") {
    val df = SparkEntry.queries("q242_bucket_pruned_lookup")(spark, sf)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("Bucketed: true"),
      s"scan must use the bucketed layout:\n$plan")
    // three probe keys hash into at most 3 of the 8 buckets — the scan
    // must report the pruned selection, not a full bucket set
    val sel = "SelectedBucketsCount: (\\d+) out of 8".r.findFirstMatchIn(plan)
    assert(sel.isDefined, s"expected SelectedBucketsCount in the scan:\n$plan")
    assert(sel.get.group(1).toInt <= 3,
      s"expected <=3 of 8 buckets selected:\n$plan")
  }

  test("bucketed writer lays out exactly one file per bucket") {
    val n = Tables.orders(spark, sf).filter(col("o_orderkey") < 5000)
      .select(col("o_orderkey"), col("o_custkey"))
    val root = java.nio.file.Files
      .createTempDirectory(operators.Exact.fmtRoot, "bktspec_")
      .toAbsolutePath.toString
    operators.Layout.bucketedWrite(n, "o_orderkey", 8, "graft_bktspec_files", s"$root/t")
    val files = new java.io.File(s"$root/t").listFiles()
      .filter(f => f.getName.endsWith(".parquet"))
    assert(files.length == 8,
      s"expected one parquet file per bucket, got ${files.map(_.getName).toSeq}")
  }
}
