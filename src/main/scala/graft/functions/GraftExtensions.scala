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
  }
}
