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

  private def digestBits(d: MessageDigest): Long = {
    val dig = d.digest()
    var acc = 0L
    var i = 0
    while (i < 7) { acc = (acc << 8) | (dig(i) & 0xffL); i += 1 }
    (acc << 4) | ((dig(7) & 0xf0L) >>> 4)
  }

  /** min over i in [0, max(numChars-n, 0)] of hash(substring(i, i+n)) —
    * the rolling char-n-gram sketch as ONE loop per row. Equivalent to
    * explode(positions) + min-agg of [[hash]], with zero explode/shuffle
    * overhead. Grams are CHAR-based like SQL substr; pure-ASCII strings
    * (bytes == chars) take an allocation-free sliding-byte-window path
    * with identical results.
    */
  def minGramHash(s: UTF8String, n: Int): Long = {
    val d = md.get()
    var best = Long.MaxValue
    val bytes = s.getBytes
    if (bytes.length == s.numChars()) {
      val last = math.max(bytes.length - n, 0)
      var i = 0
      while (i <= last) {
        d.reset()
        d.update(bytes, i, math.min(n, bytes.length - i))
        val h = digestBits(d)
        if (h < best) best = h
        i += 1
      }
    } else {
      val last = math.max(s.numChars() - n, 0)
      var i = 0
      while (i <= last) {
        val h = hash(s.substring(i, i + n))
        if (h < best) best = h
        i += 1
      }
    }
    best
  }

  def apply(c: Column): Column =
    GraftBridge.column(Hash60Expr(GraftBridge.expression(c)))

  def minGram(c: Column, n: Int): Column =
    GraftBridge.column(MinCharGramHashExpr(GraftBridge.expression(c), n))
}

/** Rolling min char-n-gram hash sketch as a native expression — see
  * [[Hash60.minGramHash]].
  */
case class MinCharGramHashExpr(child: Expression, n: Int)
    extends UnaryExpression {

  override def dataType: DataType = LongType

  override def nullSafeEval(input: Any): Any =
    Hash60.minGramHash(input.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Hash60.minGramHash($c, $n)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "min_chargram_hash"
}
