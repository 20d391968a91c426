package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** 60-bit positive md5-prefix hash — the cross-engine hash under every
  * MinHash / SimHash / fingerprint operator. Value-identical to
  * `conv(substring(md5(x), 1, 15), 16, 10)` (and to DuckDB's
  * `('0x' || substr(md5(x),1,15))::BIGINT`): the first 15 hex digits of the
  * digest are exactly its first 60 bits.
  *
  * Native expression because the composed form allocates a 32-char hex
  * string and then string-parses it back — per call, on paths that hash
  * millions of shingles/tokens/char-grams per suite run.
  */
case class Hash60Expr(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType

  override def nullSafeEval(input: Any): Any =
    Hash60.hash(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Hash60.hash($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "hash60"
}

object Hash60 {

  private val md = ThreadLocal.withInitial[MessageDigest](() =>
    MessageDigest.getInstance("MD5"))

  /** First 60 bits of md5(utf8 bytes), as a non-negative long. */
  def hash(s: UTF8String): Long = {
    val d = md.get()
    d.reset()
    val dig = d.digest(s.getBytes)
    var acc = 0L
    var i = 0
    while (i < 7) { acc = (acc << 8) | (dig(i) & 0xffL); i += 1 }
    (acc << 4) | ((dig(7) & 0xf0L) >>> 4)
  }

  def apply(c: Column): Column =
    GraftBridge.column(Hash60Expr(GraftBridge.expression(c)))
}
