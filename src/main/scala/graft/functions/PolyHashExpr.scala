package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Polynomial rolling-hash document fingerprint (Rabin-Karp style):
  * h = Σ b_i · B^i  (mod M), evaluated as h = h·B + b_i over the UTF-8
  * bytes. B = 257, M = 2^61-1 (Mersenne prime; the modulo keeps every
  * intermediate < 2^63 so ANSI-mode overflow can't trigger). One fused
  * codegen loop over the string bytes — the codegen'd counterpart of the
  * md5-based fingerprint (TextFunctions.fingerprint) for pipelines that
  * want a cheap 61-bit rolling hash instead of a cryptographic one, and
  * the building block for windowed (chunk-level) fingerprinting.
  */
case class PolyHash(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"graft_polyhash expects string, got ${child.dataType.catalogString}")

  override def nullSafeEval(input: Any): Any = {
    val bytes = input.asInstanceOf[UTF8String].getBytes
    var h = 0L
    var i = 0
    while (i < bytes.length) {
      h = PolyHash.step(h, bytes(i))
      i += 1
    }
    h
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.PolyHash.hashBytes($c.getBytes())")

  override protected def withNewChildInternal(newChild: Expression): PolyHash =
    copy(child = newChild)
}

object PolyHash {
  final val Base = 257L
  final val Mod = (1L << 61) - 1 // Mersenne prime 2^61-1

  /** One step: h·B + b (mod M), all intermediates < 2^63. */
  @inline def step(h: Long, b: Byte): Long = {
    // h < 2^61; h*257 needs up to 2^69 → split h = hi·2^32 + lo and use
    // the Mersenne identity (x·2^61 + y) mod (2^61-1) = x + y
    val mul = mulMod(h, Base)
    val s = mul + (b & 0xffL)
    if (s >= Mod) s - Mod else s
  }

  /** (a·b) mod 2^61-1 without overflow, for a < 2^61 and small b:
    * a·b = (aHi·b)·2^32 + aLo·b with a = aHi·2^32 + aLo; each term fits
    * in a Long (aHi < 2^29, aLo < 2^32, b ≤ 257) and is reduced mod M.
    */
  @inline def mulMod(a: Long, b: Long): Long = {
    val aHi = a >>> 32
    val aLo = a & 0xffffffffL
    val term1 = mulShift32(mod61(aHi * b))
    val term2 = mod61(aLo * b)
    mod61(term1 + term2)
  }

  /** (x · 2^32) mod 2^61-1 for x < 2^61. */
  @inline private def mulShift32(x: Long): Long = {
    // x·2^32 = (x >> 29)·2^61 + (x & (2^29-1))·2^32
    // and 2^61 ≡ 1 (mod M)
    val hi = x >>> 29
    val lo = (x & ((1L << 29) - 1)) << 32
    mod61(hi + lo)
  }

  @inline private def mod61(x: Long): Long = {
    val m = (x & Mod) + (x >>> 61)
    if (m >= Mod) m - Mod else m
  }

  /** Loop form used by both eval and generated code. */
  def hashBytes(bytes: Array[Byte]): Long = {
    var h = 0L
    var i = 0
    while (i < bytes.length) { h = step(h, bytes(i)); i += 1 }
    h
  }

  def polyhash(c: Column): Column =
    GraftBridge.column(PolyHash(GraftBridge.expression(c)))
}
