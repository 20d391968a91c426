package graft.functions

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}

/** SparkSessionExtensions entry point: registers graft's native Catalyst
  * expressions with the SQL function registry, so
  * `spark.sql("SELECT debezium_decimal(price_b64, 2) ...")` works anywhere
  * DataFrame code does.
  *
  * Activate with
  * `.config("spark.sql.extensions", "graft.functions.GraftExtensions")` or
  * programmatically via `withExtensions`; for a session that was built
  * WITHOUT the extension (a shared notebook session, the driver harness),
  * [[GraftExtensions.registerAll]] injects the same builders into the
  * live session's function registry.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  override def apply(ext: SparkSessionExtensions): Unit = {
    GraftExtensions.builders.foreach { case (name, builder) =>
      ext.injectFunction((
        FunctionIdentifier(name),
        new ExpressionInfo("graft.functions", name),
        builder))
    }
    // partitionless running windows plan distributed instead of
    // single-task (see graft.plans.RunningWindow; kill switch:
    // spark.graft.runningWindow.enabled=false)
    ext.injectPlannerStrategy(_ => graft.plans.GlobalRunningWindowStrategy)
  }
}

object GraftExtensions {

  /** Register every graft SQL function on an EXISTING session (temp
    * functions, session-scoped): the post-hoc twin of `withExtensions` for
    * sessions the library did not build. Idempotent.
    */
  def registerAll(spark: SparkSession): Unit = {
    builders.foreach { case (name, builder) =>
      spark.sessionState.functionRegistry
        .createOrReplaceTempFunction(name, builder, "scala_udf")
    }
    graft.plans.RunningWindow.install(spark)
  }

  /** One row per SQL-callable native kernel: name → Expression builder.
    * Builders validate arity and evaluate literal-only arguments eagerly
    * (kernel state — scales, n-gram widths, search tables — is plan-time
    * constant by design; see the kernels' scaladoc).
    */
  val builders: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "debezium_decimal" -> { args: Seq[Expression] =>
      require(args.size == 2,
        "debezium_decimal(base64String, scaleLiteral) takes 2 arguments")
      val scale = args(1) match {
        case Literal(v: Int, _) => v
        case other => throw new IllegalArgumentException(
          s"debezium_decimal scale must be an integer literal, got $other")
      }
      DebeziumDecimalExpr(args.head, scale)
    },

    "debezium_decimal_encode" -> { args: Seq[Expression] =>
      require(args.size == 1,
        "debezium_decimal_encode(unscaledLong) takes 1 argument")
      DebeziumDecimalEncodeExpr(args.head)
    },

    "vec_dot" -> { args: Seq[Expression] =>
      require(args.size == 2, "vec_dot(a, b) takes 2 arguments")
      DotProductExpr(args.head, args(1))
    },

    "hash60" -> { args: Seq[Expression] =>
      require(args.size == 1, "hash60(str) takes 1 argument")
      Hash60Expr(args.head)
    },

    "min_chargram_hash" -> { args: Seq[Expression] =>
      require(args.size == 2,
        "min_chargram_hash(str, nLiteral) takes 2 arguments")
      MinCharGramHashExpr(args.head, intLit(args(1), "min_chargram_hash n"))
    },

    "word_ngrams" -> { args: Seq[Expression] =>
      require(args.size == 2, "word_ngrams(str, nLiteral) takes 2 arguments")
      graft.text.WordNGramsExpr(args.head, intLit(args(1), "word_ngrams n"))
    },

    "word_ngrams_all" -> { args: Seq[Expression] =>
      require(args.size == 2,
        "word_ngrams_all(str, nLiteral) takes 2 arguments")
      graft.text.WordNGramsAllExpr(args.head,
        intLit(args(1), "word_ngrams_all n"))
    },

    "envelope_parse" -> { args: Seq[Expression] =>
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
    },

    "jaro_winkler" -> { args: Seq[Expression] =>
      require(args.size == 2, "jaro_winkler(a, b) takes 2 arguments")
      JaroWinklerExpr(args.head, args(1))
    },

    "char_ngram_entropy" -> { args: Seq[Expression] =>
      require(args.size == 2,
        "char_ngram_entropy(str, nLiteral) takes 2 arguments")
      CharNgramEntropyExpr(args.head,
        intLit(args(1), "char_ngram_entropy n"))
    },

    "char_ngram_counts" -> { args: Seq[Expression] =>
      require(args.size == 2,
        "char_ngram_counts(str, nLiteral) takes 2 arguments")
      graft.text.CharNgramCountsExpr(args.head,
        intLit(args(1), "char_ngram_counts n"))
    },

    "deletion_variants" -> { args: Seq[Expression] =>
      require(args.size == 1, "deletion_variants(str) takes 1 argument")
      graft.text.DeletionVariantsExpr(args.head)
    },

    "nfc_normalize" -> { args: Seq[Expression] =>
      require(args.size == 1, "nfc_normalize(str) takes 1 argument")
      NfcNormalizeExpr(args.head)
    },

    "int_ewma" -> { args: Seq[Expression] =>
      require(args.size == 1, "int_ewma(array<bigint>) takes 1 argument")
      IntEwmaExpr(args.head)
    },

    "int_holt" -> { args: Seq[Expression] =>
      require(args.size == 1, "int_holt(array<bigint>) takes 1 argument")
      IntHoltExpr(args.head)
    },

    "bpe_apply" -> { args: Seq[Expression] =>
      require(args.size == 3,
        "bpe_apply(str, searches-literal, targets-literal) takes 3 " +
          "arguments")
      BpeApplyExpr(args.head, stringArrayLit(args(1), "bpe_apply searches"),
        stringArrayLit(args(2), "bpe_apply targets"))
    },

    "mmr_select" -> { args: Seq[Expression] =>
      require(args.size == 2,
        "mmr_select(candidates, kLiteral) takes 2 arguments")
      MmrSelectExpr(args.head, intLit(args(1), "mmr_select k"))
    },

    "ac_count" -> { args: Seq[Expression] =>
      require(args.size == 2,
        "ac_count(str, array-of-string-literals) takes 2 arguments")
      AcCountExpr(args.head, stringArrayLit(args(1), "ac_count terms"))
    },

    "wordpiece_count" -> { args: Seq[Expression] =>
      require(args.size == 2,
        "wordpiece_count(word, pieces-literal) takes 2 arguments")
      WordPieceCountExpr(args.head,
        stringArrayLit(args(1), "wordpiece_count pieces"))
    },

    "cdc_boundaries" -> { args: Seq[Expression] =>
      require(args.size == 3,
        "cdc_boundaries(text, windowLiteral, divisorLiteral) takes 3 " +
          "arguments")
      CdcBoundariesExpr(args.head, intLit(args(1), "cdc_boundaries window"),
        intLit(args(2), "cdc_boundaries divisor"))
    },

    // AGGREGATE function (the analyzer wraps the bare AggregateFunction in
    // an AggregateExpression, exactly as for Spark's built-in registry
    // entries) — the bottom-k distinct sketch, see functions.KmvSketchAgg.
    "kmv_sketch" -> { args: Seq[Expression] =>
      require(args.size == 2,
        "kmv_sketch(longExpr, kLiteral) takes 2 arguments")
      KmvSketchAgg(args.head, intLit(args(1), "kmv_sketch k"))
    })

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
