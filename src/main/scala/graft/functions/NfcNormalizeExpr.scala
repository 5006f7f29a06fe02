package graft.functions

import java.text.Normalizer

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode NFC normalization as a native codegen expression — the text
  * cleanup step every multilingual corpus pipeline needs before
  * dedup/fingerprinting (the same logical string arrives byte-different
  * from different scrapers: decomposed e + U+0301 vs precomposed é make
  * hash dedup, MinHash shingles, and tokenizers all miss), and Spark has
  * no builtin for it. A codegen UnaryExpression (not a UDF) keeps it
  * inside WholeStageCodegen with null handling for free; the kernel
  * short-circuits on pure-ASCII input (one byte scan, no allocation) —
  * NFC is the identity on ASCII, which is the overwhelmingly common row
  * at corpus scale, so the String round trip is only paid by rows that
  * can actually change. Behavior is pinned against DuckDB's
  * `nfc_normalize` by the q180 oracle (identical bytes for identical
  * inputs) — both sides delegate to the Unicode normalization tables.
  */
case class NfcNormalize(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"nfc_normalize expects string, got ${child.dataType.catalogString}")

  override def nullSafeEval(input: Any): Any =
    NfcNormalize.norm(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.NfcNormalize.norm($c)")

  override protected def withNewChildInternal(newChild: Expression): NfcNormalize =
    copy(child = newChild)
}

object NfcNormalize {

  /** NFC-normalize one UTF8String. ASCII fast path: every UTF-8 byte of
    * a pure-ASCII string is < 0x80, and NFC never rewrites ASCII — so a
    * single sign-bit scan over the raw bytes skips the
    * UTF8String→String→Normalizer→UTF8String trip entirely. (Checking
    * `isNormalized` on the decoded String would still pay the decode;
    * this checks bytes first.)
    */
  def norm(s: UTF8String): UTF8String = {
    val bytes = s.getBytes
    var i = 0
    var ascii = true
    while (ascii && i < bytes.length) {
      if (bytes(i) < 0) ascii = false
      i += 1
    }
    if (ascii) s
    else {
      val str = s.toString
      if (Normalizer.isNormalized(str, Normalizer.Form.NFC)) s
      else UTF8String.fromString(Normalizer.normalize(str, Normalizer.Form.NFC))
    }
  }

  def nfc(c: Column): Column =
    GraftBridge.column(NfcNormalize(GraftBridge.expression(c)))
}
