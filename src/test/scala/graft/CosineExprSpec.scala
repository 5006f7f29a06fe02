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
}
