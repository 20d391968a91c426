package graft.functions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** AHO–CORASICK multi-pattern automaton, built once on the driver and
  * shipped as a reference object — the single-pass answer to "count every
  * blocklist term in every document" that a per-term `replace` chain
  * cannot give at blocklist scale: the chain costs O(terms · doc_len) per
  * document, the automaton O(doc_len + matches) regardless of how many
  * thousand terms it holds.
  *
  * Matching semantics: every occurrence of every term is counted,
  * INCLUDING overlapping occurrences of one term with itself. For terms
  * with no proper border (no prefix that is also a suffix — true of
  * normal words/phrases) this equals the non-overlapping left-to-right
  * count the SQL `replace` identity computes, which is what lets the
  * DuckDB oracle mirror the gate cheaply; [[AcAutomaton.build]] fails
  * loudly on bordered terms rather than letting the two counts silently
  * diverge.
  *
  * Transitions are per-node sorted char arrays probed by binary search —
  * node counts are Σ term lengths (bounded driver metadata), match
  * emission walks precomputed flattened output lists, and the whole eval
  * is a tight static helper shared by the interpreted and codegen paths
  * (the NearestCells/BpeApply kernel discipline).
  */
final class AcAutomaton private (
    val chars: Array[Array[Char]],      // per-node sorted transition chars
    val states: Array[Array[Int]],      // per-node target states
    val fail: Array[Int],               // failure links
    val out: Array[Array[Int]],         // per-node flattened term indices
    val nTerms: Int) extends Serializable {

  /** Next state from `s` on `c` following failure links (root absorbs). */
  def step(s: Int, c: Char): Int = {
    var cur = s
    while (true) {
      val idx = java.util.Arrays.binarySearch(chars(cur), c)
      if (idx >= 0) return states(cur)(idx)
      if (cur == 0) return 0
      cur = fail(cur)
    }
    0 // unreachable
  }
}

object AcAutomaton {

  /** Build the goto/fail/output automaton. Rejects empty, duplicate, and
    * BORDERED terms (see class doc for why borders are refused).
    */
  def build(terms: Array[String]): AcAutomaton = {
    require(terms.nonEmpty, "empty term list")
    require(terms.distinct.length == terms.length, "duplicate terms")
    terms.foreach { t =>
      require(t.nonEmpty, "empty term")
      (1 until t.length).foreach { b =>
        require(t.substring(0, b) != t.substring(t.length - b),
          s"term '$t' has a border of length $b — overlapping and " +
            "non-overlapping counts would diverge")
      }
    }
    // trie with growable per-node maps, then frozen to sorted arrays
    val trans = scala.collection.mutable.ArrayBuffer(
      scala.collection.mutable.TreeMap.empty[Char, Int])
    val terminal = scala.collection.mutable.ArrayBuffer(List.empty[Int])
    terms.zipWithIndex.foreach { case (t, ti) =>
      var s = 0
      t.foreach { c =>
        s = trans(s).getOrElseUpdate(c, {
          trans += scala.collection.mutable.TreeMap.empty[Char, Int]
          terminal += Nil
          trans.length - 1
        })
      }
      terminal(s) = ti :: terminal(s)
    }
    val n = trans.length
    val fail = new Array[Int](n)
    val out = new Array[List[Int]](n)
    (0 until n).foreach(i => out(i) = terminal(i))
    // BFS failure links; out flattens through the failure chain
    val queue = scala.collection.mutable.Queue.empty[Int]
    trans(0).values.foreach { s => fail(s) = 0; queue += s }
    while (queue.nonEmpty) {
      val r = queue.dequeue()
      trans(r).foreach { case (c, s) =>
        queue += s
        var f = fail(r)
        while (f != 0 && !trans(f).contains(c)) f = fail(f)
        fail(s) = if (trans(f).contains(c) && trans(f)(c) != s)
          trans(f)(c) else 0
        out(s) = out(s) ++ out(fail(s))
      }
    }
    new AcAutomaton(
      trans.map(_.keys.toArray).toArray,
      trans.map(_.values.toArray).toArray,
      fail, out.map(_.toArray), terms.length)
  }
}

case class AcCountExpr(child: Expression, terms: Array[String])
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  @transient private lazy val aut = AcAutomaton.build(terms)

  override def nullSafeEval(input: Any): Any =
    AcCount.count(input.asInstanceOf[UTF8String], aut)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val autRef = ctx.addReferenceObj("acAutomaton",
      AcAutomaton.build(terms), "graft.functions.AcAutomaton")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.AcCount.count($c, $autRef);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "ac_count"
}

object AcCount {

  /** `ac_count(text)` → array<long> of per-term occurrence counts. */
  def apply(text: Column, terms: Seq[String]): Column =
    GraftBridge.column(AcCountExpr(GraftBridge.expression(text),
      terms.toArray))

  /** Shared interpreted/codegen eval: one left-to-right pass. */
  def count(text: UTF8String, aut: AcAutomaton): ArrayData = {
    val counts = new Array[Long](aut.nTerms)
    val s = text.toString
    var state = 0
    var i = 0
    while (i < s.length) {
      state = aut.step(state, s.charAt(i))
      val o = aut.out(state)
      var j = 0
      while (j < o.length) { counts(o(j)) += 1; j += 1 }
      i += 1
    }
    new GenericArrayData(counts)
  }
}
