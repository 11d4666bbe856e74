package graft.functions

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/**
 * Native Catalyst expression for cosine similarity over two
 * `array<float>` or `array<double>` columns (element type read per side
 * from the child's resolved type — e.g. stored float embeddings against
 * computed double centroids).
 *
 * Why an Expression and not `aggregate(zip_with(...))`: the built-in
 * composition allocates two intermediate arrays and walks the input three
 * times per row; this is one fused primitive loop that whole-stage
 * codegen inlines — the difference is the hot path of every ANN/near-dup
 * operator at 100 TB. Semantics are IDENTICAL to the declarative form in
 * [[graft.datapipe.Ann.cosine]]: left-fold double accumulation in index
 * order, so results are bit-for-bit the same (and match the DuckDB
 * oracle).
 */
case class CosineSimilarity(left: Expression, right: Expression)
    extends BinaryExpression {

  // inputs must be array<float|double> (float is the embedding storage
  // type); enforced by the callers rather than ExpectsInputTypes, which
  // is sql-private
  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_cosine"

  private def isFloat(e: Expression): Boolean = e.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val (xf, yf) = (isFloat(left), isFloat(right))
    val n = math.min(x.numElements(), y.numElements())
    var dot = 0.0
    var na = 0.0
    var nb = 0.0
    var i = 0
    while (i < n) {
      val xi = if (xf) x.getFloat(i).toDouble else x.getDouble(i)
      val yi = if (yf) y.getFloat(i).toDouble else y.getDouble(i)
      dot += xi * yi
      na += xi * xi
      nb += yi * yi
      i += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val dot = ctx.freshName("dot")
      val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      val i = ctx.freshName("i")
      val xi = ctx.freshName("xi")
      val yi = ctx.freshName("yi")
      val getX = if (isFloat(left)) s"(double) $a.getFloat($i)" else s"$a.getDouble($i)"
      val getY = if (isFloat(right)) s"(double) $b.getFloat($i)" else s"$b.getDouble($i)"
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $dot = 0.0;
         |double $na = 0.0;
         |double $nb = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $xi = $getX;
         |  double $yi = $getY;
         |  $dot += $xi * $yi;
         |  $na += $xi * $xi;
         |  $nb += $yi * $yi;
         |}
         |${ev.value} = $dot / (java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb));
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object CosineSimilarity {
  /** DataFrame-API door to the native expression. */
  def cosine(a: Column, b: Column): Column =
    GraftSqlBridge.column(
      CosineSimilarity(GraftSqlBridge.expression(a), GraftSqlBridge.expression(b)))
}
