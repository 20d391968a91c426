package graft.functions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, IntegerType}
import org.apache.spark.unsafe.types.UTF8String

/** Greedy longest-match subword segmentation count — the WordPiece
  * algorithm (Wu et al. 2016; the tokenizer family's OTHER member next to
  * BPE's merge-fold): starting from the left, repeatedly consume the
  * LONGEST vocabulary piece that prefixes the remainder, and return how
  * many pieces the word took. The vocabulary is bounded driver metadata
  * (single characters + the trained merge products), so it rides as a
  * reference object and each word costs one tight loop — scan-side, no
  * shuffle, no per-step Column allocation.
  *
  * The match is well-defined: distinct pieces of equal length matching at
  * one position would be equal strings, so "longest match" is unique, and
  * single characters guarantee progress (a char with no piece counts as
  * one piece — mirroring the SQL oracle's NULL-drop only for inputs the
  * caller already filtered out).
  */
case class WordPieceCountExpr(child: Expression, pieces: Seq[String])
    extends UnaryExpression {
  // Seq, not Array: arrays compare by reference, which would defeat
  // expression canonicalization (semanticEquals, subexpression
  // elimination) — structurally equal calls must be equal expressions

  override def dataType: DataType = IntegerType

  @transient private lazy val set: java.util.HashSet[String] = {
    val s = new java.util.HashSet[String](pieces.length * 2)
    pieces.foreach(s.add)
    s
  }
  @transient private lazy val maxLen: Int =
    if (pieces.isEmpty) 1 else pieces.map(_.length).max

  override def nullSafeEval(input: Any): Any =
    WordPieceCount.count(input.asInstanceOf[UTF8String], set, maxLen)

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val setRef = ctx.addReferenceObj("wpPieces", set, "java.util.HashSet")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.WordPieceCount.count($c, $setRef, " +
        s"$maxLen);")
  }

  override protected def withNewChildInternal(
      newChild: Expression): Expression = copy(child = newChild)

  override def prettyName: String = "wordpiece_count"
}

object WordPieceCount {

  /** `pieces` must include every character the words can contain (the
    * single-char closure), or unmatched characters count as one piece
    * each. The word is segmented with the `_` end-of-word sentinel
    * appended, matching the BPE training alphabet.
    */
  def apply(word: Column, pieces: Seq[String]): Column =
    GraftBridge.column(WordPieceCountExpr(GraftBridge.expression(word),
      pieces))

  def count(w: UTF8String, set: java.util.HashSet[String],
      maxLen: Int): Int = {
    val s = w.toString + "_"
    val n = s.length
    var pos = 0
    var np = 0
    while (pos < n) {
      var len = math.min(maxLen, n - pos)
      var matched = 1 // unmatched char degrades to a single-char piece
      var found = false
      while (len >= 1 && !found) {
        if (set.contains(s.substring(pos, pos + len))) {
          matched = len
          found = true
        }
        len -= 1
      }
      np += 1
      pos += matched
    }
    np
  }
}
