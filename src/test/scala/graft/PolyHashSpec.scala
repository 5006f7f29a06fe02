package graft

import graft.functions.PolyHash
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class PolyHashSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  /** Independent reference: BigInt Horner evaluation of the same
    * polynomial — validates the overflow-free limb arithmetic.
    */
  private def refHash(s: String): Long = {
    val M = BigInt(PolyHash.Mod)
    var h = BigInt(0)
    s.getBytes("UTF-8").foreach { b =>
      h = (h * PolyHash.Base + (b & 0xff)) % M
    }
    h.toLong
  }

  test("limb arithmetic matches BigInt reference on assorted strings") {
    val cases = Seq("", "a", "hello world", "x" * 10000,
      "unicode: 日本語 ünïcødé", (0 until 256).map(_.toChar).mkString)
    cases.foreach { c =>
      assert(PolyHash.hashBytes(c.getBytes("UTF-8")) === refHash(c), s"case: ${c.take(20)}")
    }
    // seeded fuzz
    val rnd = new scala.util.Random(9)
    (0 until 200).foreach { _ =>
      val s = rnd.alphanumeric.take(rnd.nextInt(500)).mkString
      assert(PolyHash.hashBytes(s.getBytes("UTF-8")) === refHash(s))
    }
  }

  test("codegen path through SQL equals the scala evaluation") {
    import spark.implicits._
    val docs = Tables.documents(spark, TestSpark.Sf0001).limit(50)
    val viaExpr = docs.select($"doc_id", PolyHash.polyhash($"text").as("h"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val direct = docs.select($"doc_id", $"text").collect()
      .map(r => r.getLong(0) -> PolyHash.hashBytes(r.getString(1).getBytes("UTF-8"))).toMap
    assert(viaExpr === direct)
    // and via the SQL registration
    docs.createOrReplaceTempView("ph_docs")
    val viaSql = spark.sql("SELECT doc_id, graft_polyhash(text) AS h FROM ph_docs")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(viaSql === direct)
    spark.catalog.dropTempView("ph_docs")
  }
}
