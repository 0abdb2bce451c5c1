package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types._

/** Exact element-wise vector sum in fixed point — the Lloyd update step
  * of distributed k-means (per-cell component sums / member counts).
  *
  * Why fixed point: summing float components as doubles is
  * order-dependent, and Spark's partial/final aggregation tree visits
  * rows in partition order — two runs (or Spark vs a sequential oracle)
  * can differ in the last ulp. Scaling each component to an integer
  * FIRST — floor(x · 2^scaleBits), computed in double, which is exact
  * and engine-independent because both engines floor the identical IEEE
  * product — makes the aggregation integer arithmetic: associative,
  * commutative, and overflow-checked (`Math.addExact`, in ANSI spirit).
  * Any partitioning, any merge order, bit-identical results.
  *
  * Why an aggregate and not posexplode + groupBy(dim): state here is one
  * long per dimension PER GROUP, combined map-side, so only |cells| rows
  * reach the shuffle. The explode plan shuffles |rows|·dim rows — at
  * 100 TB of embeddings that multiplier is the job.
  */
case class FixedPointVecSum(
    child: Expression,
    scaleBits: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] {

  require(scaleBits >= 0 && scaleBits < 63, s"scaleBits in [0, 62], got $scaleBits")

  private val scale: Double = (1L << scaleBits).toDouble

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"vec_fixedpoint_sum expects array<float>, got ${dt.simpleString}")
  }

  override def createAggregationBuffer(): Array[Long] = Array.emptyLongArray

  private def grown(buf: Array[Long], n: Int): Array[Long] =
    if (buf.length >= n) buf else java.util.Arrays.copyOf(buf, n)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v == null) return buf
    val arr = v.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    val n = arr.numElements()
    val b = grown(buf, n)
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i))
        b(i) = Math.addExact(b(i), math.floor(arr.getFloat(i).toDouble * scale).toLong)
      i += 1
    }
    b
  }

  override def merge(buf: Array[Long], other: Array[Long]): Array[Long] = {
    val b = grown(buf, other.length)
    var i = 0
    while (i < other.length) { b(i) = Math.addExact(b(i), other(i)); i += 1 }
    b
  }

  override def eval(buf: Array[Long]): Any = new GenericArrayData(buf)

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + buf.length * 8)
    bb.putInt(buf.length)
    var i = 0
    while (i < buf.length) { bb.putLong(buf(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val b = new Array[Long](n)
    var i = 0
    while (i < n) { b(i) = bb.getLong; i += 1 }
    b
  }

  override def withNewMutableAggBufferOffset(offset: Int): FixedPointVecSum =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): FixedPointVecSum =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildrenInternal(cs: IndexedSeq[Expression]): FixedPointVecSum =
    copy(child = cs.head)
  override def prettyName: String = "vec_fixedpoint_sum"
}

object VectorAggFunctions {
  private def litInt(e: Expression): Int = e.eval(null) match {
    case i: Int => i
    case l: Long => l.toInt
    case other => throw new IllegalArgumentException(
      s"vec_fixedpoint_sum scaleBits must be a literal int, got $other")
  }

  def register(spark: SparkSession): Unit =
    Registration.ifAbsent(spark, "vec_fixedpoint_sum") { es =>
      FixedPointVecSum(es.head, litInt(es(1)))
    }

  /** agg column: array<bigint> of per-component sums of
    * floor(x · 2^scaleBits).
    */
  def vecFixedPointSum(vec: Column, scaleBits: Int): Column =
    call_function("vec_fixedpoint_sum", vec,
      org.apache.spark.sql.functions.lit(scaleBits))
}
