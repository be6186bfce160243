package graft.functions.expr

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Native element-wise array-sum aggregate: given an `array<int>`
  * column whose rows all share one length, produce the per-position
  * `array<long>` of sums — the vote accumulation of SimHash (one
  * array row per term instead of a bits-fold row explosion) and the
  * vector-accumulation half of a centroid update.
  *
  * This is the aggregate-side analog of the scalar codegen expressions
  * in this package: a `TypedImperativeAggregate` whose buffer is a
  * primitive `Array[Long]` — no per-row boxing, partial aggregation
  * (map-side combine) for free, and a compact fixed-width serialized
  * form for the shuffle. Null rows are ignored; mismatched lengths sum
  * over the shorter prefix (inputs are fixed-width by construction).
  */
case class ElementwiseSum(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] with UnaryLike[Expression] {

  override def prettyName: String = "elementwise_sum"
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(IntegerType | LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<int|bigint>, got ${other.simpleString}")
  }

  // lazy: child.dataType is only valid once the plan is resolved
  private lazy val elemIsLong = child.dataType match {
    case ArrayType(LongType, _) => true
    case _ => false
  }

  override def createAggregationBuffer(): Array[Long] = Array.emptyLongArray

  override def update(buffer: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v == null) return buffer
    val arr = v.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val acc = if (buffer.length >= n) buffer else {
      val grown = new Array[Long](n)
      System.arraycopy(buffer, 0, grown, 0, buffer.length)
      grown
    }
    var i = 0
    while (i < n) {
      acc(i) += (if (elemIsLong) arr.getLong(i) else arr.getInt(i).toLong)
      i += 1
    }
    acc
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    val (big, small) = if (a.length >= b.length) (a, b) else (b, a)
    var i = 0
    while (i < small.length) { big(i) += small(i); i += 1 }
    big
  }

  override def eval(buffer: Array[Long]): Any = new GenericArrayData(buffer)

  override def serialize(buffer: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(buffer.length * 8)
    buffer.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    Array.fill(bytes.length / 8)(bb.getLong)
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): ElementwiseSum =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): ElementwiseSum =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): ElementwiseSum =
    copy(child = newChild)
}

/** Double-precision sibling of [[ElementwiseSum]] over
  * `array<float|double>` rows — the vector-accumulation half of a
  * k-means centroid update ([[graft.operators.VectorSearch.kmeansStep]]):
  * summing member vectors per cluster is one hash aggregation with
  * map-side partials, the only scalable shape for centroid training
  * over a corpus that cannot be collected.
  */
case class ElementwiseSumDouble(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Double]] with UnaryLike[Expression] {

  override def prettyName: String = "elementwise_sum_double"
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullable: Boolean = false

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType | DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<float|double>, got ${other.simpleString}")
  }

  private lazy val elemIsFloat = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def createAggregationBuffer(): Array[Double] = Array.emptyDoubleArray

  override def update(buffer: Array[Double], input: InternalRow): Array[Double] = {
    val v = child.eval(input)
    if (v == null) return buffer
    val arr = v.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val acc = if (buffer.length >= n) buffer else {
      val grown = new Array[Double](n)
      System.arraycopy(buffer, 0, grown, 0, buffer.length)
      grown
    }
    var i = 0
    while (i < n) {
      acc(i) += (if (elemIsFloat) arr.getFloat(i).toDouble else arr.getDouble(i))
      i += 1
    }
    acc
  }

  override def merge(a: Array[Double], b: Array[Double]): Array[Double] = {
    val (big, small) = if (a.length >= b.length) (a, b) else (b, a)
    var i = 0
    while (i < small.length) { big(i) += small(i); i += 1 }
    big
  }

  override def eval(buffer: Array[Double]): Any = new GenericArrayData(buffer)

  override def serialize(buffer: Array[Double]): Array[Byte] = {
    val bb = ByteBuffer.allocate(buffer.length * 8)
    buffer.foreach(bb.putDouble)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Double] = {
    val bb = ByteBuffer.wrap(bytes)
    Array.fill(bytes.length / 8)(bb.getDouble)
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): ElementwiseSumDouble =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): ElementwiseSumDouble =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): ElementwiseSumDouble =
    copy(child = newChild)
}
