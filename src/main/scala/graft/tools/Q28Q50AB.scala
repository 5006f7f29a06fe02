package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Interleaved A/B of the PRODUCTION q28/q50 paths with and without the
  * shingle persist. Variants alternate pass-by-pass so a host contention
  * wave (this box shows multi-minute external waves, BASELINE.md) hits
  * both arms equally instead of whichever ran second; min-of-N per arm
  * is reported with every raw sample and the load window.
  */
object Q28Q50AB {
  def main(args: Array[String]): Unit = {
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val rounds = sys.env.getOrElse("AB_ROUNDS", "4").toInt
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def loadAvg(): Double =
      try {
        val src = scala.io.Source.fromFile("/proc/loadavg")
        try src.mkString.split("\\s+")(0).toDouble finally src.close()
      } catch { case _: Throwable => -1.0 }
    def docs = graft.Tables.documents(spark, d)
    val arms: Seq[(String, () => DataFrame)] = Seq(
      ("q28 persist=T", () => graft.operators.Dedup
        .minhashNearDups(docs, persistShingles = true)),
      ("q28 persist=F", () => graft.operators.Dedup
        .minhashNearDups(docs, persistShingles = false)),
      ("q50 persist=T", () => graft.operators.Dedup
        .dfCappedNearDups(docs, persistShingles = true)),
      ("q50 persist=F", () => graft.operators.Dedup
        .dfCappedNearDups(docs, persistShingles = false)))
    val samples = arms.map(_ => scala.collection.mutable.ArrayBuffer.empty[(Double, Double)])
    for (_ <- 0 until rounds; i <- arms.indices) {
      spark.catalog.clearCache()
      val t0 = System.nanoTime()
      arms(i)._2().write.format("noop").mode("overwrite").save()
      samples(i) += (((System.nanoTime() - t0) / 1e9, loadAvg()))
    }
    arms.indices.foreach { i =>
      val ts = samples(i).map(_._1)
      println(f"[ab] ${arms(i)._1} min=${ts.min}%.2f " +
        s"all=${samples(i).map { case (t, l) => f"$t%.2f@$l%.1f" }.mkString(",")}")
    }
    spark.stop()
  }
}
