package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType}
import org.apache.spark.sql.GraftBridge

/** Boundary validation that NARROWS an array type to
  * `containsNull = false` — the safe way to hand parquet-sourced
  * vectors to [[CosineSimilarity]]'s check-free codegen loop.
  *
  * Parquet writers mark list elements optional even for dense data, so
  * every embedding column scans as `array<T> containsNull = true` and
  * the fused cosine kernel must emit a per-element null test inside
  * the multiply-accumulate loop of every O(n²) pair filter. This
  * expression moves that test OUT of the quadratic stage: it scans
  * each row's array ONCE at the projection below the join (O(d) per
  * input row, not O(d) per pair), THROWS loudly on a null element
  * (data corruption — a dense embedding corpus has no legitimate null
  * components; silently narrowing on a caller's say-so would read
  * garbage values instead), and declares the output element type
  * non-null so downstream kernels statically drop their checks.
  *
  * Null CONTRACT difference vs the raw kernel, stated plainly: the
  * raw kernel maps a null element to a NULL score (the pair silently
  * drops); behind this validator a null element FAILS THE QUERY. For
  * a corpus whose generator guarantees density (the catalog
  * embeddings) the two are indistinguishable on real data and the
  * loud failure is the better behavior on corrupted data. A null
  * ARRAY (whole column value) passes through as NULL unchanged.
  */
case class KnownDenseArray(child: Expression) extends UnaryExpression {

  override def dataType: DataType =
    child.dataType.asInstanceOf[ArrayType].copy(containsNull = false)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case _: ArrayType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"known_dense expects an array, got ${other.catalogString}")
    }

  override def nullSafeEval(v: Any): Any = {
    val a = v.asInstanceOf[ArrayData]
    val n = a.numElements()
    var i = 0
    while (i < n) {
      if (a.isNullAt(i))
        throw new IllegalStateException(
          s"dense-array certificate violated: null element at index $i " +
            s"of $n — the input corpus is not dense")
      i += 1
    }
    a
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      s"""
         |int $n = $c.numElements();
         |for (int $i = 0; $i < $n; $i++) {
         |  if ($c.isNullAt($i)) {
         |    throw new IllegalStateException(
         |      "dense-array certificate violated: null element at index "
         |        + $i + " of " + $n + " — the input corpus is not dense");
         |  }
         |}
         |${ev.value} = $c;
       """.stripMargin
    })

  override protected def withNewChildInternal(
      newChild: Expression): KnownDenseArray = copy(child = newChild)
}

object KnownDenseArray {
  /** Column-API entry point. */
  def denseChecked(v: Column): Column =
    GraftBridge.column(KnownDenseArray(GraftBridge.expression(v)))
}
