package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, FloatType, LongType}

/** Native Catalyst expression for the embedding hot path: the exact
  * fixed-point dot product Σ round(a[i]·1e6)·round(b[i]·1e6) over two
  * float arrays, as one whole-stage-codegen'd loop.
  *
  * The equivalent built-in formulation
  * `aggregate(zip_with(a, b, (x,y) -> ...), 0L, (acc,v) -> acc+v)`
  * allocates an intermediate array and evaluates interpreted lambdas per
  * element — per-row overhead that dominates a 100 TB similarity scan.
  * Same arithmetic, same result (oracle-compatible): round half-up on
  * the µs-scaled doubles, exact Long accumulation.
  */
case class FixedPointDot(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(FloatType, _) => true
      case _ => false
    })
    if (ok) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"fixed_point_dot expects two ARRAY<FLOAT>, got " +
        s"${left.dataType.simpleString}, ${right.dataType.simpleString}")
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val xs = a.asInstanceOf[ArrayData]
    val ys = b.asInstanceOf[ArrayData]
    val n = math.min(xs.numElements(), ys.numElements())
    var acc = 0L
    var i = 0
    while (i < n) {
      acc += FixedPointDot.scale(xs.getFloat(i)) * FixedPointDot.scale(ys.getFloat(i))
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val cls = FixedPointDot.getClass.getName.stripSuffix("$") + "$"
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |${ev.value} = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  ${ev.value} += $cls.MODULE$$.scale($a.getFloat($i))
         |      * $cls.MODULE$$.scale($b.getFloat($i));
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "fixed_point_dot"
}

object FixedPointDot {
  /** THE µs fixed-point scale factor — every scaled-integer embedding
    * computation (this expression, the k-means quantizer, the SQL
    * oracles' `* 1e6` literals) shares this one constant. */
  val Scale = 1000000L

  /** Round half-AWAY-FROM-ZERO — SQL ROUND semantics (Math.round is
    * half-toward-+inf, which differs on negative .5 values). */
  def roundHalfAway(v: Double): Long =
    if (v >= 0) Math.floor(v + 0.5).toLong else Math.ceil(v - 0.5).toLong

  /** µs fixed-point scaling of one float: exact float→double widening,
    * then [[roundHalfAway]]. v ± 0.5 is exact for |v| < 2^22·1e6-scale
    * magnitudes, so this matches Spark's BigDecimal HALF_UP path
    * bit-for-bit. */
  def scale(x: Float): Long = roundHalfAway(x.toDouble * Scale)
}

object FixedPointOps {
  /** Column API: exact fixed-point dot product of two ARRAY<FLOAT>. */
  def fixedPointDot(a: Column, b: Column): Column =
    ColumnBridge.column(
      FixedPointDot(ColumnBridge.expression(a), ColumnBridge.expression(b)))

  /** Exact fixed-point squared norm. */
  def fixedPointNormSq(a: Column): Column = fixedPointDot(a, a)

  /** THE exact-arithmetic cosine tree every oracle-matched embedding
    * query shares: integer dot and norms, then the one IEEE shape
    * `CAST(dot) / (sqrt(CAST(nnA)) * sqrt(CAST(nnB)))` the DuckDB SQL
    * mirrors evaluate — operand order and cast placement are part of
    * the bit-parity contract, so they live in exactly one place. */
  def exactCosine(a: Column, b: Column): Column = {
    import org.apache.spark.sql.functions.sqrt
    fixedPointDot(a, b).cast("double") /
      (sqrt(fixedPointNormSq(a).cast("double")) *
        sqrt(fixedPointNormSq(b).cast("double")))
  }

  /** Register `fixed_point_dot` for SQL use. */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "fixed_point_dot",
      exprs => FixedPointDot(exprs(0), exprs(1)),
      "built-in")
}
