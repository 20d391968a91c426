package graft.functions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, IntegerType, LongType}

/** The Iceberg spec's `bucket[N]` partition transform over a long key
  * (Appendix B: standard murmur3_x86_32 of the 8-byte little-endian
  * value, `(hash & Int.MaxValue) % N`) — the scan-side twin of
  * [[graft.streaming.IcebergTransforms.bucketLong]], shared eval and
  * codegen. Used to DERIVE bucket partition columns when publishing
  * tables a real Iceberg writer would have bucket-partitioned (Spark's
  * own `hash` is a different murmur3 variant and would disagree with
  * every foreign engine).
  */
case class IcebergBucketExpr(child: Expression, buckets: Int)
    extends UnaryExpression {

  override def dataType: DataType = IntegerType

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case LongType | IntegerType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"iceberg_bucket needs bigint/int, got ${t.sql}")
    }

  override def nullSafeEval(input: Any): Any =
    graft.streaming.IcebergTransforms.bucketLong(
      input.asInstanceOf[Number].longValue(), buckets)

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v =>
      s"${ev.value} = graft.streaming.IcebergTransforms" +
        s".bucketLong((long)$v, $buckets);")

  override protected def withNewChildInternal(newChild: Expression)
      : Expression = copy(child = newChild)

  override def prettyName: String = "iceberg_bucket"
}

object IcebergBucket {
  def apply(key: Column, buckets: Int): Column =
    GraftBridge.column(
      IcebergBucketExpr(GraftBridge.expression(key), buckets))
}
