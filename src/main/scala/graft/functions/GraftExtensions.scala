package graft.functions

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.FunctionRegistry
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}

/** SparkSessionExtensions entry point: registers graft's native Catalyst
  * expressions with the SQL function registry, so
  * `spark.sql("SELECT debezium_decimal(price_b64, 2) ...")` works anywhere
  * DataFrame code does.
  *
  * Activate with
  * `.config("spark.sql.extensions", "graft.functions.GraftExtensions")` or
  * programmatically via `withExtensions`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("debezium_decimal"),
      new ExpressionInfo(classOf[DebeziumDecimalExpr].getName,
        "debezium_decimal"),
      (args: Seq[Expression]) => {
        require(args.size == 2,
          "debezium_decimal(base64String, scaleLiteral) takes 2 arguments")
        val scale = args(1) match {
          case Literal(v: Int, _) => v
          case other => throw new IllegalArgumentException(
            s"debezium_decimal scale must be an integer literal, got $other")
        }
        DebeziumDecimalExpr(args.head, scale)
      }))

    ext.injectFunction((
      FunctionIdentifier("debezium_decimal_encode"),
      new ExpressionInfo(classOf[DebeziumDecimalEncodeExpr].getName,
        "debezium_decimal_encode"),
      (args: Seq[Expression]) => {
        require(args.size == 1,
          "debezium_decimal_encode(unscaledLong) takes 1 argument")
        DebeziumDecimalEncodeExpr(args.head)
      }))

    ext.injectFunction((
      FunctionIdentifier("vec_dot"),
      new ExpressionInfo(classOf[DotProductExpr].getName, "vec_dot"),
      (args: Seq[Expression]) => {
        require(args.size == 2, "vec_dot(a, b) takes 2 arguments")
        DotProductExpr(args.head, args(1))
      }))

    ext.injectFunction((
      FunctionIdentifier("hash60"),
      new ExpressionInfo(classOf[Hash60Expr].getName, "hash60"),
      (args: Seq[Expression]) => {
        require(args.size == 1, "hash60(str) takes 1 argument")
        Hash60Expr(args.head)
      }))

    ext.injectFunction((
      FunctionIdentifier("min_chargram_hash"),
      new ExpressionInfo(classOf[MinCharGramHashExpr].getName,
        "min_chargram_hash"),
      (args: Seq[Expression]) => {
        require(args.size == 2,
          "min_chargram_hash(str, nLiteral) takes 2 arguments")
        MinCharGramHashExpr(args.head, intLit(args(1), "min_chargram_hash n"))
      }))

    ext.injectFunction((
      FunctionIdentifier("word_ngrams"),
      new ExpressionInfo(classOf[graft.text.WordNGramsExpr].getName,
        "word_ngrams"),
      (args: Seq[Expression]) => {
        require(args.size == 2, "word_ngrams(str, nLiteral) takes 2 arguments")
        graft.text.WordNGramsExpr(args.head, intLit(args(1), "word_ngrams n"))
      }))

    ext.injectFunction((
      FunctionIdentifier("word_ngrams_all"),
      new ExpressionInfo(classOf[graft.text.WordNGramsAllExpr].getName,
        "word_ngrams_all"),
      (args: Seq[Expression]) => {
        require(args.size == 2,
          "word_ngrams_all(str, nLiteral) takes 2 arguments")
        graft.text.WordNGramsAllExpr(args.head,
          intLit(args(1), "word_ngrams_all n"))
      }))

    ext.injectFunction((
      FunctionIdentifier("envelope_parse"),
      new ExpressionInfo(classOf[EnvelopeParseExpr].getName, "envelope_parse"),
      (args: Seq[Expression]) => {
        require(args.size == 2,
          "envelope_parse(line, 'schema ddl literal') takes 2 arguments")
        val ddl = args(1) match {
          case Literal(s: org.apache.spark.unsafe.types.UTF8String, _) =>
            s.toString
          case other => throw new IllegalArgumentException(
            s"envelope_parse schema must be a string literal, got $other")
        }
        EnvelopeParseExpr(args.head,
          org.apache.spark.sql.types.StructType.fromDDL(ddl))
      }))
  }

  private def intLit(e: Expression, what: String): Int = e match {
    case Literal(v: Int, _) => v
    case other => throw new IllegalArgumentException(
      s"$what must be an integer literal, got $other")
  }
}
