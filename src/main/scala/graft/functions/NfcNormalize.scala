package graft.functions

import java.text.Normalizer

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode NFC canonical normalization as a native codegen expression —
  * the first pass of any crawl-text pipeline (the same page fetched twice
  * can carry the same glyphs as composed codepoints or base+combining-mark
  * sequences; exact dedup, fingerprinting, and tokenization all diverge
  * unless text is canonicalized first).
  *
  * Spark ships no normalization function, so this wraps the JDK's
  * `java.text.Normalizer` (Unicode UAX #15 — the same algorithm DuckDB's
  * `nfc_normalize` implements, which is what makes the gate cross-engine
  * verifiable). ASCII-only strings (bytes == chars, all < 0x80) are already
  * NFC by construction and take an allocation-free fast path, so the common
  * case costs one byte scan — important because this sits scan-side on
  * every document at lake scale.
  */
case class NfcNormalizeExpr(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType

  override def nullSafeEval(input: Any): Any =
    NfcNormalize.nfc(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.NfcNormalize.nfc($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "nfc_normalize"
}

object NfcNormalize {

  /** NFC-normalize; returns the input object unchanged when it is pure
    * ASCII (always normalized) or already in NFC, so the fast path
    * allocates nothing.
    */
  def nfc(s: UTF8String): UTF8String = {
    val bytes = s.getBytes
    var ascii = true
    var i = 0
    while (ascii && i < bytes.length) { ascii = bytes(i) >= 0; i += 1 }
    if (ascii) return s
    val str = s.toString
    if (Normalizer.isNormalized(str, Normalizer.Form.NFC)) s
    else UTF8String.fromString(Normalizer.normalize(str, Normalizer.Form.NFC))
  }

  def apply(c: Column): Column =
    GraftBridge.column(NfcNormalizeExpr(GraftBridge.expression(c)))
}
