package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** KMV (bottom-k / theta) distinct sketch as a native Catalyst AGGREGATE —
  * the k smallest DISTINCT values of a (hash) column per group, returned
  * as an ascending array.
  *
  * This is the single-pass form of the q45 sketch construction: the
  * relational form needs a DISTINCT (one shuffle) plus a per-group
  * WindowGroupLimit sort; the aggregate form is one hash aggregation with
  * an O(k) buffer per group — partials combine map-side, merge is the
  * same bottom-k fold (bottom-k-distinct is a semilattice: commutative,
  * associative, idempotent), so the result is DETERMINISTIC under any
  * partitioning and the estimator built on it is engine-reproducible with
  * no RNG. At 100 TB this is the difference between sketching in the scan
  * stage and sorting every group's full hash set.
  *
  * `TypedImperativeAggregate` (not a cheaper `DeclarativeAggregate`)
  * because the state is a bounded ordered set, not a fixed tuple of
  * columns; Spark plans it through ObjectHashAggregate with partial
  * aggregation intact. Registered in SQL as `kmv_sketch(expr, k)`.
  */
case class KmvSketchAgg(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.TreeSet[java.lang.Long]]
  with UnaryLike[Expression] {

  require(k >= 1, s"kmv_sketch needs k >= 1, got $k")

  override def createAggregationBuffer(): java.util.TreeSet[java.lang.Long] =
    new java.util.TreeSet[java.lang.Long]()

  private def insert(buf: java.util.TreeSet[java.lang.Long],
                     v: Long): Unit = {
    if (buf.size < k) { buf.add(v); () }
    // strictly-less + add-returned-true: an already-present value must
    // not evict anything (the sketch holds DISTINCT minima)
    else if (v < buf.last && buf.add(v)) { buf.pollLast(); () }
  }

  override def update(buf: java.util.TreeSet[java.lang.Long],
                      input: InternalRow): java.util.TreeSet[java.lang.Long] = {
    val v = child.eval(input)
    if (v != null) insert(buf, v.asInstanceOf[Long])
    buf
  }

  override def merge(buf: java.util.TreeSet[java.lang.Long],
                     other: java.util.TreeSet[java.lang.Long])
      : java.util.TreeSet[java.lang.Long] = {
    val it = other.iterator()
    while (it.hasNext) insert(buf, it.next())
    buf
  }

  override def eval(buf: java.util.TreeSet[java.lang.Long]): Any = {
    val arr = new Array[Long](buf.size)
    val it = buf.iterator()
    var i = 0
    while (it.hasNext) { arr(i) = it.next(); i += 1 }
    new GenericArrayData(arr)
  }

  override def serialize(buf: java.util.TreeSet[java.lang.Long]): Array[Byte] = {
    val bos = new ByteArrayOutputStream(4 + buf.size * 8)
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    val it = buf.iterator()
    while (it.hasNext) out.writeLong(it.next())
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): java.util.TreeSet[java.lang.Long] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = new java.util.TreeSet[java.lang.Long]()
    var i = 0
    while (i < n) { buf.add(in.readLong()); i += 1 }
    buf
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullable: Boolean = false

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"kmv_sketch needs a BIGINT input, got ${child.dataType.sql}")

  override def withNewMutableAggBufferOffset(newOffset: Int): KmvSketchAgg =
    copy(mutableAggBufferOffset = newOffset)

  override def withNewInputAggBufferOffset(newOffset: Int): KmvSketchAgg =
    copy(inputAggBufferOffset = newOffset)

  override protected def withNewChildInternal(
      newChild: Expression): KmvSketchAgg = copy(child = newChild)

  override def prettyName: String = "kmv_sketch"
}
