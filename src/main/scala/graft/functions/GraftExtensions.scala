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

    ext.injectFunction((
      FunctionIdentifier("jaro_winkler"),
      new ExpressionInfo(classOf[JaroWinklerExpr].getName, "jaro_winkler"),
      (args: Seq[Expression]) => {
        require(args.size == 2, "jaro_winkler(a, b) takes 2 arguments")
        JaroWinklerExpr(args.head, args(1))
      }))

    ext.injectFunction((
      FunctionIdentifier("char_ngram_entropy"),
      new ExpressionInfo(classOf[CharNgramEntropyExpr].getName,
        "char_ngram_entropy"),
      (args: Seq[Expression]) => {
        require(args.size == 2,
          "char_ngram_entropy(str, nLiteral) takes 2 arguments")
        CharNgramEntropyExpr(args.head,
          intLit(args(1), "char_ngram_entropy n"))
      }))

    ext.injectFunction((
      FunctionIdentifier("char_ngram_counts"),
      new ExpressionInfo(classOf[graft.text.CharNgramCountsExpr].getName,
        "char_ngram_counts"),
      (args: Seq[Expression]) => {
        require(args.size == 2,
          "char_ngram_counts(str, nLiteral) takes 2 arguments")
        graft.text.CharNgramCountsExpr(args.head,
          intLit(args(1), "char_ngram_counts n"))
      }))

    ext.injectFunction((
      FunctionIdentifier("deletion_variants"),
      new ExpressionInfo(classOf[graft.text.DeletionVariantsExpr].getName,
        "deletion_variants"),
      (args: Seq[Expression]) => {
        require(args.size == 1, "deletion_variants(str) takes 1 argument")
        graft.text.DeletionVariantsExpr(args.head)
      }))

    ext.injectFunction((
      FunctionIdentifier("nfc_normalize"),
      new ExpressionInfo(classOf[NfcNormalizeExpr].getName,
        "nfc_normalize"),
      (args: Seq[Expression]) => {
        require(args.size == 1, "nfc_normalize(str) takes 1 argument")
        NfcNormalizeExpr(args.head)
      }))

    ext.injectFunction((
      FunctionIdentifier("int_ewma"),
      new ExpressionInfo(classOf[IntEwmaExpr].getName, "int_ewma"),
      (args: Seq[Expression]) => {
        require(args.size == 1, "int_ewma(array<bigint>) takes 1 argument")
        IntEwmaExpr(args.head)
      }))

    ext.injectFunction((
      FunctionIdentifier("bpe_apply"),
      new ExpressionInfo(classOf[BpeApplyExpr].getName, "bpe_apply"),
      (args: Seq[Expression]) => {
        require(args.size == 3,
          "bpe_apply(str, searches-literal, targets-literal) takes 3 " +
            "arguments")
        BpeApplyExpr(args.head, stringArrayLit(args(1), "bpe_apply searches"),
          stringArrayLit(args(2), "bpe_apply targets"))
      }))

    ext.injectFunction((
      FunctionIdentifier("mmr_select"),
      new ExpressionInfo(classOf[MmrSelectExpr].getName, "mmr_select"),
      (args: Seq[Expression]) => {
        require(args.size == 2,
          "mmr_select(candidates, kLiteral) takes 2 arguments")
        MmrSelectExpr(args.head, intLit(args(1), "mmr_select k"))
      }))

    ext.injectFunction((
      FunctionIdentifier("ac_count"),
      new ExpressionInfo(classOf[AcCountExpr].getName, "ac_count"),
      (args: Seq[Expression]) => {
        require(args.size == 2,
          "ac_count(str, array-of-string-literals) takes 2 arguments")
        AcCountExpr(args.head, stringArrayLit(args(1), "ac_count terms"))
      }))
  }

  /** A CONSTANT array<string> argument. At function-resolution time
    * `array('a','b')` is still an unevaluated CreateArray (constant folding
    * runs later in the optimizer), so accept any foldable array<string>
    * expression and evaluate it now.
    */
  private def stringArrayLit(e: Expression, what: String): Array[String] =
    e.dataType match {
      case org.apache.spark.sql.types.ArrayType(
          org.apache.spark.sql.types.StringType, _) if e.foldable =>
        e.eval(null) match {
          case d: org.apache.spark.sql.catalyst.util.ArrayData =>
            d.toObjectArray(org.apache.spark.sql.types.StringType)
              .map(_.asInstanceOf[org.apache.spark.unsafe.types.UTF8String]
                .toString)
          case other => throw new IllegalArgumentException(
            s"$what evaluated to $other, expected an array")
        }
      case _ => throw new IllegalArgumentException(
        s"$what must be a constant array<string>, got $e")
    }

  private def intLit(e: Expression, what: String): Int = e match {
    case Literal(v: Int, _) => v
    case other => throw new IllegalArgumentException(
      s"$what must be an integer literal, got $other")
  }
}
