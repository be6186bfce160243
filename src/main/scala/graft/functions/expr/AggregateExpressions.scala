package graft.functions.expr

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.{BinaryLike, UnaryLike}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

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

/** Bounded top-k as an aggregate: keep the k best (score desc, id asc)
  * pairs per group and emit them best-first as
  * `array<struct<id, score>>`.
  *
  * This is the shuffle-shape fix for batch kNN
  * ([[graft.operators.VectorSearch.knnJoin]]): ranking per query with a
  * window ships EVERY scored (query, corpus) pair to the query's single
  * reducer — |corpus|×|queries| rows into |queries| tasks. As a
  * `TypedImperativeAggregate` the same cut partial-aggregates map-side:
  * each input partition keeps at most k survivors per query in a bounded
  * heap, so the exchange carries |queries|×partitions buffers of ≤k
  * entries — independent of corpus size. The reference's per-segment
  * HNSW search + cross-segment merge
  * (`nidx/nidx_vector/src/lib.rs:212-240`) has exactly this
  * local-top-k-then-merge shape.
  *
  * The heap evicts worst-first (lowest score; ties: LARGEST id, so the
  * survivor set and final order match `row_number() OVER (ORDER BY
  * score DESC, id ASC)` exactly). Callers pass pre-rounded scores, so
  * the comparison is deterministic across partitionings.
  */
case class TopKByScore(
    score: Expression,
    id: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.PriorityQueue[(Double, Any)]]
  with BinaryLike[Expression] {

  require(k > 0, "topk_by_score requires k > 0")

  override def prettyName: String = "topk_by_score"
  override def left: Expression = score
  override def right: Expression = id
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("id", id.dataType, nullable = false),
      StructField("score", DoubleType, nullable = false))),
    containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    (score.dataType, id.dataType) match {
      case (DoubleType, LongType | IntegerType | _: StringType) =>
        TypeCheckResult.TypeCheckSuccess
      case (s, i) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (double, bigint|int|string), got " +
          s"(${s.simpleString}, ${i.simpleString})")
    }

  private lazy val idKind: Int = id.dataType match {
    case LongType => 0
    case IntegerType => 1
    case _ => 2 // string
  }

  private def compareIds(a: Any, b: Any): Int = idKind match {
    case 0 => java.lang.Long.compare(a.asInstanceOf[Long], b.asInstanceOf[Long])
    case 1 => java.lang.Integer.compare(a.asInstanceOf[Int], b.asInstanceOf[Int])
    case _ => a.asInstanceOf[UTF8String].compareTo(b.asInstanceOf[UTF8String])
  }

  /** Worst-first: lower score sorts first; equal scores put the larger
    * id first (it is the one `ORDER BY score DESC, id ASC` drops).
    */
  private lazy val worstFirst = new java.util.Comparator[(Double, Any)] {
    override def compare(a: (Double, Any), b: (Double, Any)): Int = {
      val c = java.lang.Double.compare(a._1, b._1)
      if (c != 0) c else -compareIds(a._2, b._2)
    }
  }

  override def createAggregationBuffer(): java.util.PriorityQueue[(Double, Any)] =
    new java.util.PriorityQueue[(Double, Any)](k, worstFirst)

  private def insert(
      q: java.util.PriorityQueue[(Double, Any)], s: Double, i: Any): Unit =
    if (q.size < k) q.add((s, i))
    else if (worstFirst.compare((s, i), q.peek()) > 0) { q.poll(); q.add((s, i)) }

  override def update(
      q: java.util.PriorityQueue[(Double, Any)],
      input: InternalRow): java.util.PriorityQueue[(Double, Any)] = {
    val s = score.eval(input)
    val i = id.eval(input)
    if (s != null && i != null) {
      // UTF8String from eval may alias a reused row buffer — copy it
      val owned = i match {
        case u: UTF8String => u.clone()
        case other => other
      }
      insert(q, s.asInstanceOf[Double], owned)
    }
    q
  }

  override def merge(
      a: java.util.PriorityQueue[(Double, Any)],
      b: java.util.PriorityQueue[(Double, Any)]): java.util.PriorityQueue[(Double, Any)] = {
    val it = b.iterator()
    while (it.hasNext) { val (s, i) = it.next(); insert(a, s, i) }
    a
  }

  override def eval(q: java.util.PriorityQueue[(Double, Any)]): Any = {
    val arr = q.toArray(new Array[(Double, Any)](q.size))
    java.util.Arrays.sort(arr, worstFirst.reversed()) // best-first
    new GenericArrayData(arr.map { case (s, i) =>
      new GenericInternalRow(Array[Any](i, s))
    })
  }

  override def serialize(q: java.util.PriorityQueue[(Double, Any)]): Array[Byte] = {
    val entries = q.toArray(new Array[(Double, Any)](q.size))
    val idBytes = entries.map {
      case (_, u: UTF8String) => u.getBytes
      case _ => null
    }
    val size = 4 + entries.indices.map { n =>
      8 + (if (idKind == 2) 4 + idBytes(n).length else 8)
    }.sum
    val bb = ByteBuffer.allocate(size)
    bb.putInt(entries.length)
    entries.indices.foreach { n =>
      bb.putDouble(entries(n)._1)
      idKind match {
        case 0 => bb.putLong(entries(n)._2.asInstanceOf[Long])
        case 1 => bb.putLong(entries(n)._2.asInstanceOf[Int].toLong)
        case _ => bb.putInt(idBytes(n).length); bb.put(idBytes(n))
      }
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): java.util.PriorityQueue[(Double, Any)] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val q = createAggregationBuffer()
    var i = 0
    while (i < n) {
      val s = bb.getDouble
      val idVal: Any = idKind match {
        case 0 => bb.getLong
        case 1 => bb.getLong.toInt
        case _ =>
          val len = bb.getInt
          val b = new Array[Byte](len)
          bb.get(b)
          UTF8String.fromBytes(b)
      }
      q.add((s, idVal))
      i += 1
    }
    q
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKByScore =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKByScore =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): TopKByScore =
    copy(score = newLeft, id = newRight)
}
