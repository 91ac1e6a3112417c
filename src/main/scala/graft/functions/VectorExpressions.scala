package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Native Catalyst expressions for the vector-similarity kernels
  * (SURVEY.md §4: tier-(b) custom Expression, justified by the bench — the
  * built-in alternative is a `zip_with`+`aggregate` higher-order chain whose
  * lambdas are evaluated interpretively per element, ~64 virtual calls per
  * pair here; this is one tight fused loop inside WholeStageCodegen).
  *
  * Semantics match the HOF formulation exactly: dot over the common prefix,
  * norms over each full array, left-to-right fold order (so doubles are
  * bit-identical to the DuckDB oracle's list_dot_product).
  */
case class CosineSimilarity(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(FloatType, _) => true
      case _ => false
    })
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two array<float> arguments, got " +
        s"${left.dataType.simpleString} and ${right.dataType.simpleString}")
  }
  override def dataType: DataType = DoubleType
  override def prettyName: String = "vec_cosine"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    CosineSimilarity.compute(x, y)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) =>
      s"${ev.value} = graft.functions.CosineSimilarity.compute($x, $y);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CosineSimilarity =
    copy(left = newLeft, right = newRight)
}

object CosineSimilarity {
  /** Shared by interpreted eval and generated code (static call — the
    * codegen template above compiles to one invokestatic). */
  def compute(x: ArrayData, y: ArrayData): Double = {
    val nx = x.numElements()
    val ny = y.numElements()
    val n = if (nx < ny) nx else ny
    var dot = 0.0
    var sx = 0.0
    var sy = 0.0
    var i = 0
    while (i < n) {
      val xi = x.getFloat(i).toDouble
      val yi = y.getFloat(i).toDouble
      dot += xi * yi
      sx += xi * xi
      sy += yi * yi
      i += 1
    }
    while (i < nx) { val xi = x.getFloat(i).toDouble; sx += xi * xi; i += 1 }
    i = n
    while (i < ny) { val yi = y.getFloat(i).toDouble; sy += yi * yi; i += 1 }
    dot / (math.sqrt(sx) * math.sqrt(sy))
  }
}

object VectorFunctions {
  /** Idempotently register the vector functions in a session's registry so
    * `call_function("vec_cosine", ...)` / SQL `vec_cosine(a, b)` resolve.
    * Also injectable globally via [[graft.GraftExtensions]]. */
  def ensureRegistered(spark: SparkSession): Unit = {
    val registry = spark.sessionState.functionRegistry
    val id = FunctionIdentifier("vec_cosine")
    if (!registry.functionExists(id)) {
      registry.registerFunction(
        id,
        new ExpressionInfo(classOf[CosineSimilarity].getName, "vec_cosine"),
        (children: Seq[Expression]) => CosineSimilarity(children(0), children(1)))
    }
  }
}
