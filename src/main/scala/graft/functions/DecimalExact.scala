package graft.functions

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, Decimal, DecimalType}

/**
 * EXACT decimal semiring arithmetic for the factorized-aggregate fast
 * paths (r16 — lifting the `scale <= 6` decline):
 *
 * Spark's native decimal `*`/`+` route through
 * `DecimalPrecision.adjustPrecisionScale`, which caps intermediate
 * precision at 38 by SHRINKING the scale — but never below
 * MINIMUM_ADJUSTED_SCALE = 6. That is exactly why the semiring message
 * passing (partial sums × multiplicity counts, cross-multiplied partial
 * sums) was safe only for scale ≤ 6: a wider scale could be silently
 * ROUNDED mid-semiring, a divergence stock evaluation would not have.
 *
 * These expressions instead compute the product/sum exactly in
 * unbounded arithmetic and type the result DECIMAL(38, exact scale)
 * (product: s₁+s₂; sum: max(s₁,s₂)) — the scale can never shrink, and a
 * value whose MAGNITUDE outgrows 38 digits yields NULL, the same
 * bounded-magnitude class as a stock decimal SUM's capped accumulator.
 * Codegen'd (one static helper call per row), so the message-pass
 * projections stay inside whole-stage codegen.
 */
object DecimalExact {

  /** Exact product fitted to DECIMAL(38, scale); null on overflow.
    * (Also the codegen entry point — object methods compile to static
    * forwarders.) */
  def timesExact(a: Decimal, b: Decimal, scale: Int): Decimal =
    fit(a.toJavaBigDecimal.multiply(b.toJavaBigDecimal), scale)

  /** Exact sum fitted to DECIMAL(38, scale); null on overflow. */
  def plusExact(a: Decimal, b: Decimal, scale: Int): Decimal =
    fit(a.toJavaBigDecimal.add(b.toJavaBigDecimal), scale)

  private def fit(bd: java.math.BigDecimal, scale: Int): Decimal = {
    // bd's scale is already the target (exact product/sum of the child
    // scales), so changePrecision never rounds — it only overflow-checks
    val d = Decimal(BigDecimal(bd))
    if (d.changePrecision(DecimalType.MAX_PRECISION, scale)) d else null
  }

  /** Integral counts/multiplicities enter the semiring as DECIMAL(20,0):
    * every long fits, and scale 0 keeps the product scale unchanged. */
  def count(c: Column): Column = c.cast(DecimalType(20, 0))

  /** a × b (both DECIMAL-typed columns), typed DECIMAL(38, s_a + s_b). */
  def times(a: Column, b: Column): Column =
    GraftSqlBridge.column(DecimalTimesExact(
      GraftSqlBridge.expression(a), GraftSqlBridge.expression(b)))

  /** a + b (both DECIMAL-typed columns), typed DECIMAL(38, max(s_a, s_b)). */
  def plus(a: Column, b: Column): Column =
    GraftSqlBridge.column(DecimalPlusExact(
      GraftSqlBridge.expression(a), GraftSqlBridge.expression(b)))

  /** value × count with the count coerced ([[count]]). */
  def timesCount(value: Column, c: Column): Column = times(value, count(c))
}

private[graft] trait DecimalExactBinary extends BinaryExpression {
  protected def scaleOf(e: Expression): Int = e.dataType match {
    case d: DecimalType => d.scale
    case other => throw new IllegalArgumentException(
      s"${prettyName} needs decimal inputs, got $other — cast counts to DECIMAL(20,0) at the call site")
  }
  protected def resultScale: Int
  override def dataType: DataType = {
    require(resultScale <= DecimalType.MAX_PRECISION,
      s"$prettyName result scale $resultScale exceeds ${DecimalType.MAX_PRECISION} — " +
        "the door gate must decline this shape")
    DecimalType(DecimalType.MAX_PRECISION, resultScale)
  }
  override def nullable: Boolean = true
  protected def helper: String

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val tmp = ctx.freshName("dexact")
      s"""
         |org.apache.spark.sql.types.Decimal $tmp =
         |  graft.functions.DecimalExact.$helper($a, $b, $resultScale);
         |if ($tmp == null) { ${ev.isNull} = true; } else { ${ev.value} = $tmp; }
       """.stripMargin
    })
}

/** Exact decimal product: DECIMAL(38, s₁+s₂), null on magnitude overflow. */
case class DecimalTimesExact(left: Expression, right: Expression)
    extends DecimalExactBinary {
  override def prettyName: String = "graft_decimal_times_exact"
  override protected lazy val resultScale: Int = scaleOf(left) + scaleOf(right)
  override protected def helper: String = "timesExact"
  override def nullSafeEval(a: Any, b: Any): Any =
    DecimalExact.timesExact(a.asInstanceOf[Decimal], b.asInstanceOf[Decimal], resultScale)
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Exact decimal sum: DECIMAL(38, max(s₁,s₂)), null on magnitude overflow. */
case class DecimalPlusExact(left: Expression, right: Expression)
    extends DecimalExactBinary {
  override def prettyName: String = "graft_decimal_plus_exact"
  override protected lazy val resultScale: Int = math.max(scaleOf(left), scaleOf(right))
  override protected def helper: String = "plusExact"
  override def nullSafeEval(a: Any, b: Any): Any =
    DecimalExact.plusExact(a.asInstanceOf[Decimal], b.asInstanceOf[Decimal], resultScale)
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
