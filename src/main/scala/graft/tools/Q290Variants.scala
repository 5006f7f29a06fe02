package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** A/B harness for q290 (containmentPairsPrefix) verify/candidate-join
  * variants (guide §2.3 "shuffle fewer bytes", §3). All variants must
  * produce IDENTICAL results (checked via exceptAll both ways on the
  * first pass). Run: sbt "runMain graft.tools.Q290Variants"
  */
object Q290Variants {
  def main(args: Array[String]): Unit = {
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val minPpm = 500000L
    def load(): String =
      scala.util.Try(scala.io.Source.fromFile("/proc/loadavg").mkString
        .split(" ").head).getOrElse("?")

    /** current shipped form */
    def current(): DataFrame =
      graft.operators.Dedup.containmentPairsPrefix(
        graft.Tables.documents(spark, d))

    /** hashed-gram candidate + verify joins: all g equi-joins key on
      * xxhash64(g) computed once on the persisted frames. */
    def hashed(): DataFrame = {
      val docs = graft.Tables.documents(spark, d)
      val sh = graft.operators.Dedup.shingles(docs)
        .withColumn("gh", xxhash64(col("g")))
        .persist(StorageLevel.MEMORY_AND_DISK)
      val sizes = sh.groupBy(col("doc_id")).agg(count(lit(1)).as("sz"))
      val dfr = sh.groupBy(col("gh")).agg(count(lit(1)).as("df"),
        min(col("g")).as("g0"))
      val wDoc = Window.partitionBy(col("doc_id")).orderBy(col("df"), col("g"))
      val ranked = sh.join(dfr.select(col("gh"), col("df")), Seq("gh"))
        .withColumn("pos", row_number().over(wDoc))
        .join(sizes, Seq("doc_id"))
        .select(col("doc_id"), col("gh"), col("pos"), col("sz"))
        .persist(StorageLevel.MEMORY_AND_DISK)
      val probe = ranked
        .filter(col("pos") <=
          expr(s"sz - ((sz * $minPpm + 999999L) div 1000000L) + 1L"))
        .select(col("doc_id").as("doc_a"), col("gh"), col("sz").as("sz_a"))
      val cand = probe
        .join(ranked.select(col("doc_id").as("doc_b"), col("gh"),
          col("pos").as("pos_b"), col("sz").as("sz_b")), Seq("gh"))
        .filter(col("doc_a") =!= col("doc_b"))
        .filter(col("pos_b") <=
          col("sz_b") - expr(s"(sz_a * $minPpm + 999999L) div 1000000L") + lit(1L))
        .select(col("doc_a"), col("doc_b"))
        .distinct()
      cand
        .join(ranked.select(col("doc_id").as("doc_a"), col("gh")), Seq("doc_a"))
        .join(ranked.select(col("doc_id").as("doc_b"), col("gh")),
          Seq("doc_b", "gh"))
        .groupBy(col("doc_a"), col("doc_b"))
        .agg(count(lit(1)).as("inter"))
        .join(sizes.select(col("doc_id").as("doc_a"), col("sz").as("size_a")),
          Seq("doc_a"))
        .withColumn("containment_ppm", expr("inter * 1000000 div size_a"))
        .filter(col("containment_ppm") >= minPpm)
        .select(col("doc_a"), col("doc_b"), col("inter"), col("size_a"),
          col("containment_ppm"))
    }

    /** hashed joins + array-intersect verify: per-doc sorted hash arrays
      * joined to the candidate pairs; inter = size(array_intersect). */
    def hashedArrays(): DataFrame = {
      val docs = graft.Tables.documents(spark, d)
      val sh = graft.operators.Dedup.shingles(docs)
        .withColumn("gh", xxhash64(col("g")))
        .persist(StorageLevel.MEMORY_AND_DISK)
      val sizes = sh.groupBy(col("doc_id")).agg(count(lit(1)).as("sz"))
      val dfr = sh.groupBy(col("gh")).agg(count(lit(1)).as("df"))
      val wDoc = Window.partitionBy(col("doc_id")).orderBy(col("df"), col("g"))
      val ranked = sh.join(dfr, Seq("gh"))
        .withColumn("pos", row_number().over(wDoc))
        .join(sizes, Seq("doc_id"))
        .select(col("doc_id"), col("gh"), col("pos"), col("sz"))
        .persist(StorageLevel.MEMORY_AND_DISK)
      val garr = sh.groupBy(col("doc_id"))
        .agg(array_sort(collect_list(col("gh"))).as("ga"),
          count(lit(1)).as("sz"))
        .persist(StorageLevel.MEMORY_AND_DISK)
      val probe = ranked
        .filter(col("pos") <=
          expr(s"sz - ((sz * $minPpm + 999999L) div 1000000L) + 1L"))
        .select(col("doc_id").as("doc_a"), col("gh"), col("sz").as("sz_a"))
      val cand = probe
        .join(ranked.select(col("doc_id").as("doc_b"), col("gh"),
          col("pos").as("pos_b"), col("sz").as("sz_b")), Seq("gh"))
        .filter(col("doc_a") =!= col("doc_b"))
        .filter(col("pos_b") <=
          col("sz_b") - expr(s"(sz_a * $minPpm + 999999L) div 1000000L") + lit(1L))
        .select(col("doc_a"), col("doc_b"))
        .distinct()
      cand
        .join(garr.select(col("doc_id").as("doc_a"), col("ga").as("gsa"),
          col("sz").as("size_a")), Seq("doc_a"))
        .join(garr.select(col("doc_id").as("doc_b"), col("ga").as("gsb")),
          Seq("doc_b"))
        .withColumn("inter", size(array_intersect(col("gsa"), col("gsb")))
          .cast("long"))
        .withColumn("containment_ppm", expr("inter * 1000000 div size_a"))
        .filter(col("containment_ppm") >= minPpm)
        .select(col("doc_a"), col("doc_b"), col("inter"), col("size_a"),
          col("containment_ppm"))
    }

    /** candidate join on xxhash64(g) (collisions can only ADD candidates
      * — still a provable superset), verify via array_intersect on the
      * RAW gram strings — fully exact end to end, no collision caveat. */
    def exactArrays(): DataFrame = {
      val docs = graft.Tables.documents(spark, d)
      val sh = graft.operators.Dedup.shingles(docs)
        .withColumn("gh", xxhash64(col("g")))
        .persist(StorageLevel.MEMORY_AND_DISK)
      val sizes = sh.groupBy(col("doc_id")).agg(count(lit(1)).as("sz"))
      val dfr = sh.groupBy(col("gh")).agg(count(lit(1)).as("df"))
      val wDoc = Window.partitionBy(col("doc_id")).orderBy(col("df"), col("g"))
      val ranked = sh.join(dfr, Seq("gh"))
        .withColumn("pos", row_number().over(wDoc))
        .join(sizes, Seq("doc_id"))
        .select(col("doc_id"), col("gh"), col("pos"), col("sz"))
        .persist(StorageLevel.MEMORY_AND_DISK)
      val garr = sh.groupBy(col("doc_id"))
        .agg(array_sort(collect_list(col("g"))).as("ga"),
          count(lit(1)).as("sz"))
        .persist(StorageLevel.MEMORY_AND_DISK)
      val probe = ranked
        .filter(col("pos") <=
          expr(s"sz - ((sz * $minPpm + 999999L) div 1000000L) + 1L"))
        .select(col("doc_id").as("doc_a"), col("gh"), col("sz").as("sz_a"))
      val cand = probe
        .join(ranked.select(col("doc_id").as("doc_b"), col("gh"),
          col("pos").as("pos_b"), col("sz").as("sz_b")), Seq("gh"))
        .filter(col("doc_a") =!= col("doc_b"))
        .filter(col("pos_b") <=
          col("sz_b") - expr(s"(sz_a * $minPpm + 999999L) div 1000000L") + lit(1L))
        .select(col("doc_a"), col("doc_b"))
        .distinct()
      cand
        .join(garr.select(col("doc_id").as("doc_a"), col("ga").as("gsa"),
          col("sz").as("size_a")), Seq("doc_a"))
        .join(garr.select(col("doc_id").as("doc_b"), col("ga").as("gsb")),
          Seq("doc_b"))
        .withColumn("inter", size(array_intersect(col("gsa"), col("gsb")))
          .cast("long"))
        .withColumn("containment_ppm", expr("inter * 1000000 div size_a"))
        .filter(col("containment_ppm") >= minPpm)
        .select(col("doc_a"), col("doc_b"), col("inter"), col("size_a"),
          col("containment_ppm"))
    }

    val variants: Seq[(String, () => DataFrame)] = Seq(
      "current" -> (() => current()),
      "hashedArrays" -> (() => hashedArrays()),
      "exactArrays" -> (() => exactArrays()))

    // equality check once
    val ref = current().orderBy(col("doc_a"), col("doc_b")).collect().toSeq
    spark.catalog.clearCache()
    variants.drop(1).foreach { case (n, f) =>
      val got = f().orderBy(col("doc_a"), col("doc_b")).collect().toSeq
      println(s"[q290var] $n equal=${got == ref} rows=${got.size} ref=${ref.size}")
      spark.catalog.clearCache()
    }
    (0 until 3).foreach { pass =>
      variants.foreach { case (n, f) =>
        spark.catalog.clearCache()
        val l = load()
        val t0 = System.nanoTime()
        f().write.format("noop").mode("overwrite").save()
        println(f"[q290var] pass $pass $n%-14s ${(System.nanoTime() - t0) / 1e9}%.2f s load $l")
      }
    }
    spark.stop()
  }
}
