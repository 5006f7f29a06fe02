package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Stage breakdown for q78 (persistent-index incremental dedup) — which
  * of index-build/write, fresh-signature, candidate-join, verify carries
  * the 45 s BENCH_r05 outlier. Run:
  *   sbt "runMain graft.tools.Q78Profile"
  *
  * Verdict (sf0.1, local[32], r6): VERIFY carried it — 12–50 s against
  * 1–4 s for every other stage. Two compounding causes: (1) the lazy
  * candidate frame is referenced three times inside jaccardVerify, so
  * the whole candidate subtree (index parquet read + fresh signatures +
  * shingles + bands) re-executed per reference; (2) the persist() of the
  * 37k-row shingle frame cost 2–7 s to populate under host IO contention
  * while the bare computation took 0.4–0.8 s. Fix shipped in Dedup:
  * localCheckpoint the bounded pair set once, aggregate per-doc gram
  * sets once, intersect row-locally with array_intersect (no
  * explode-join, nothing computed twice), and memoize the persistent
  * index per (corpus, cut) per JVM. q78 after: ~1.7–2.3 s warm.
  */
object Q78Profile {
  def main(args: Array[String]): Unit = {
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.operators.{Dedup, Exact}
    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[q78prof] $name ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    (0 until 2).foreach { pass =>
      println(s"[q78prof] === pass $pass ===")
      val docs = graft.Tables.documents(spark, d).select(col("doc_id"), col("text"))
      val cut = t("maxscan") {
        (docs.agg(max(col("doc_id"))).head().getLong(0) + 1L) * 9L / 10L }
      val tmp = java.nio.file.Files
        .createTempDirectory(Exact.fmtRoot, "mhprof_").toAbsolutePath.toString
      t("index-build+write") {
        Dedup.minhashSignatures(docs.filter(col("doc_id") < cut))
          .write.mode("overwrite").parquet(s"$tmp/sigs") }
      val indexSigs = spark.read.parquet(s"$tmp/sigs")
      val fresh = t("fresh-sigs (materialize)") {
        val f = Dedup.minhashSignatures(docs.filter(col("doc_id") >= cut))
        f.write.format("noop").mode("overwrite").save(); f }
      val cand = t("candidates (materialize)") {
        val c = Dedup.minhashCandidatesAgainst(indexSigs, fresh)
        c.write.format("noop").mode("overwrite").save(); c }
      t("verify (lazy cand)") {
        Dedup.jaccardVerify(docs, cand)
          .write.format("noop").mode("overwrite").save() }
      val candP = cand.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      candP.count()
      t("verify (persisted cand)") {
        Dedup.jaccardVerify(docs, candP)
          .write.format("noop").mode("overwrite").save() }
      candP.unpersist()
      val candC = cand.localCheckpoint(true)
      t("verify (checkpointed cand)") {
        Dedup.jaccardVerify(docs, candC)
          .write.format("noop").mode("overwrite").save() }
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
