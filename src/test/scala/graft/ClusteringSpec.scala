package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Similarity

/** Pins kmeansAssign beyond the q160 oracle (which certifies
  * engine-parity, not clustering QUALITY): on planted well-separated
  * clusters the assignment must recover the plant exactly, and the
  * whole pipeline must be run-to-run deterministic.
  */
class ClusteringSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  /** Three tight clusters around far-apart centers; ids 0/1/2 land in
    * different clusters so the first-k seeding starts one seed in each.
    */
  private def planted: org.apache.spark.sql.DataFrame = {
    import spark.implicits._
    val centers = Seq(
      Array.tabulate(8)(i => if (i == 0) 10.0 else 0.0),
      Array.tabulate(8)(i => if (i == 3) -10.0 else 0.0),
      Array.tabulate(8)(i => if (i == 6) 10.0 else -10.0))
    // deterministic jitter from md5 — no PRNG state
    def jitter(id: Long, dim: Int): Double = {
      val h = java.security.MessageDigest.getInstance("MD5")
        .digest(s"km:$id:$dim".getBytes("UTF-8"))
      (h(0) & 0xff).toDouble / 255.0 - 0.5
    }
    val rows = for (id <- 0L until 60L) yield {
      val c = centers((id % 3).toInt)
      (id, c.zipWithIndex.map { case (v, i) => v + jitter(id, i) }.toSeq)
    }
    rows.toDF("vec_id", "v")
  }

  test("planted clusters are recovered exactly and deterministically") {
    val a1 = Similarity.kmeansAssign(planted, k = 3, iterations = 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // every planted cluster maps to ONE assignment id, all distinct
    val byPlant = (0 until 3).map(p =>
      (0L until 60L).filter(_ % 3 == p).map(a1).toSet)
    byPlant.zipWithIndex.foreach { case (ids, p) =>
      assert(ids.size == 1, s"planted cluster $p split across $ids")
    }
    assert(byPlant.flatten.toSet.size == 3,
      s"three planted clusters must get three distinct ids: $byPlant")
    val a2 = Similarity.kmeansAssign(planted, k = 3, iterations = 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(a1 == a2, "assignment must be run-to-run deterministic")
  }
}
