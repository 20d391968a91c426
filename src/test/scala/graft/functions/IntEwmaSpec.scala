package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class IntEwmaSpec extends SparkSpec {

  import spark.implicits._

  private def run(xs: Seq[Long]): Seq[Long] =
    Seq(Tuple1(xs)).toDF("xs")
      .select(IntEwma(col("xs")).as("e"))
      .collect().head.getSeq[Long](0)

  test("recurrence matches the hand fold, including integer truncation") {
    val g = IntEwma.Grid
    // E0 = 3g; E1 = (1g + 3g)/2 = 2g; E2 = (2g + 2g)/2 = 2g
    assert(run(Seq(3L, 1L, 2L)) === Seq(3 * g, 2 * g, 2 * g))
    // odd sums floor: E1 = (0 + 1g)/2 = g/2 exactly; E2 = (1g + g/2)/2
    assert(run(Seq(1L, 0L, 1L)) === Seq(g, g / 2, (g + g / 2) / 2))
  }

  test("empty and singleton series") {
    assert(run(Seq.empty) === Seq.empty)
    assert(run(Seq(7L)) === Seq(7L * IntEwma.Grid))
  }

  test("constant series is a fixpoint") {
    assert(run(Seq.fill(5)(4L)) === Seq.fill(5)(4L * IntEwma.Grid))
  }
}
