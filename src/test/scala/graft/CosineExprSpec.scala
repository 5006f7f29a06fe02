package graft

import graft.functions.{CosineSimilarity, VectorFunctions => VF}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The fused codegen expression must be bit-identical to the builtin
  * zip_with/aggregate composition (both sequential double folds) — that
  * equivalence is what lets the fast path keep passing the DuckDB oracle.
  */
class CosineExprSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("fused expression == builtin composition, bit-for-bit, on real embeddings") {
    val e = Tables.embeddings(spark, TestSpark.Sf0001).limit(50)
      .select(col("vec_id"), col("embedding"))
    val a = e.select(col("vec_id").as("ia"), col("embedding").as("va"))
    val b = e.select(col("vec_id").as("ib"), col("embedding").as("vb"))
    val pairs = a.join(b, col("ia") < col("ib"))
    val cmp = pairs.select(
      CosineSimilarity.cosineSim(col("va"), col("vb")).as("fused"),
      (VF.dot(VF.asDouble(col("va")), VF.asDouble(col("vb"))) /
        (VF.norm(VF.asDouble(col("va"))) * VF.norm(VF.asDouble(col("vb"))))).as("builtin"))
    val mismatches = cmp.filter(col("fused") =!= col("builtin")).count()
    assert(mismatches === 0L)
    assert(cmp.count() === 50L * 49 / 2)
  }

  test("SQL registration: graft_cosine works through spark.sql") {
    CosineSimilarity.register(spark)
    Tables.embeddings(spark, TestSpark.Sf0001).limit(5)
      .createOrReplaceTempView("emb_test")
    val n = spark.sql(
      """SELECT graft_cosine(a.embedding, b.embedding) AS cs
        |FROM emb_test a JOIN emb_test b ON a.vec_id < b.vec_id""".stripMargin)
      .filter(col("cs").between(-1.0000001, 1.0000001)).count()
    assert(n === 10L)
  }

  test("NULL contract matches the composed form: mismatch, null element, zero norm") {
    // the composed zip_with/aggregate/divide form yields NULL on a
    // length mismatch (padding nulls), a null element, and a zero-norm
    // side (divide by zero) — the fused kernel must do the same, never
    // a prefix-truncated score, an NPE, or a NaN
    val rows = spark.sql(
      """SELECT
        |  cosine_sim(array(3.0d), array(3.0d, 4.0d)) AS mismatch,
        |  cosine_sim(array(1.0d, cast(null as double)), array(1.0d, 1.0d)) AS nullel,
        |  cosine_sim(array(0.0d, 0.0d), array(1.0d, 2.0d)) AS zeronorm,
        |  cosine_sim(array(3.0d, 4.0d), array(3.0d, 4.0d)) AS same
        |""".stripMargin).head()
    assert(rows.isNullAt(0), "length mismatch must be NULL")
    assert(rows.isNullAt(1), "null element must be NULL")
    assert(rows.isNullAt(2), "zero norm must be NULL")
    assert(rows.getDouble(3) === 1.0)
  }
}
