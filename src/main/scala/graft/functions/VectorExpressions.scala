package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types._

/** Native Catalyst expressions for embedding math over
  * `ArrayType(FloatType)` columns (north-star similarity operators,
  * SURVEY.md §7.1 M4).
  *
  * Why a custom `Expression` instead of a UDF or `zip_with`/`aggregate`
  * HOFs: the expression stays inside whole-stage codegen (one virtual call
  * per row, no per-element lambda boxing), which is the difference between
  * a scan-speed ANN pass and a 10× slower one at 100 TB.
  *
  * Numeric contract: elements are widened float→double and accumulated
  * sequentially in index order, matching DuckDB's
  * `list_cosine_similarity(a::DOUBLE[], b::DOUBLE[])` bit-for-bit so the
  * driver's oracle hash-compare holds.
  */
object VectorKernels {
  /** dot(x,y) with sequential double accumulation. */
  def dot(x: ArrayData, y: ArrayData): Double = {
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) { acc += x.getFloat(i).toDouble * y.getFloat(i).toDouble; i += 1 }
    acc
  }

  /** cosine(x,y) = dot/(|x|·|y|), NaN-free for zero vectors (returns 0). */
  def cosine(x: ArrayData, y: ArrayData): Double = {
    val n = math.min(x.numElements(), y.numElements())
    var dot = 0.0; var nx = 0.0; var ny = 0.0
    var i = 0
    while (i < n) {
      val a = x.getFloat(i).toDouble; val b = y.getFloat(i).toDouble
      dot += a * b; nx += a * a; ny += b * b
      i += 1
    }
    val denom = math.sqrt(nx) * math.sqrt(ny)
    if (denom == 0.0) 0.0 else dot / denom
  }
}

abstract class VectorBinaryExpression extends BinaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(FloatType, _) => true
      case _ => false
    })
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects two array<float> arguments, got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
  }
  override def dataType: DataType = DoubleType
  /** Fully-qualified static kernel call emitted into generated code. */
  protected def kernel: String

  override protected def nullSafeEval(a: Any, b: Any): Any =
    evalKernel(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  protected def evalKernel(x: ArrayData, y: ArrayData): Double

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => s"${ev.value} = $kernel($a, $b);")
}

case class CosineSimilarity(left: Expression, right: Expression)
    extends VectorBinaryExpression {
  override protected def kernel = "graft.functions.VectorKernels.cosine"
  override protected def evalKernel(x: ArrayData, y: ArrayData): Double =
    VectorKernels.cosine(x, y)
  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(left = l, right = r)
  override def prettyName: String = "cosine_sim"
}

case class InnerProduct(left: Expression, right: Expression)
    extends VectorBinaryExpression {
  override protected def kernel = "graft.functions.VectorKernels.dot"
  override protected def evalKernel(x: ArrayData, y: ArrayData): Double =
    VectorKernels.dot(x, y)
  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(left = l, right = r)
  override def prettyName: String = "inner_product"
}

/** Session registration + typed Column API. */
object VectorFunctions {
  def register(spark: SparkSession): Unit = {
    Registration.ifAbsent(spark, "cosine_sim")(es => CosineSimilarity(es(0), es(1)))
    Registration.ifAbsent(spark, "inner_product")(es => InnerProduct(es(0), es(1)))
  }

  def cosineSim(a: Column, b: Column): Column = call_function("cosine_sim", a, b)
  def innerProduct(a: Column, b: Column): Column = call_function("inner_product", a, b)
}
