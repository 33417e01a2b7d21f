package graft.functions

import org.apache.spark.sql.{Column, GraftColumns}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType}

/** Native Catalyst expression computing the squared L2 distance of two
  * double vectors as an EXACT e4-scaled integer:
  * `round(Σ (aᵢ−bᵢ)² · 10⁴)` as a long — the d143/d217 convention that
  * makes downstream sums (the PQ ADC lookup-table accumulation)
  * order-free across engines and shuffle merge orders.
  *
  * WHY an Expression (the [[CosineSim]] reasoning): the column
  * formulation — `round(aggregate(zip_with(a, b, (x,y) ⇒ (x−y)²), 0.0,
  * _+_) · 10⁴)` — is two interpreted higher-order functions per
  * evaluation, and squared L2 is the PQ ENCODE arithmetic: K
  * comparisons per subspace per vector at encode time (K·M per vector,
  * with production codebooks at K = 256). This runs one fused loop
  * inside whole-stage codegen. The accumulator folds in element order,
  * so every intermediate double is bit-identical to the sequential HOF
  * fold, and the final round replicates Spark's `Round` semantics
  * (decimal HALF_UP, then the long cast) — pinned by a parity test in
  * `FunctionsSpec`, so swapping it in cannot move a driver-gated hash.
  *
  * Null behavior mirrors the HOF formulation: mismatched lengths and
  * (when the element type admits them) null elements return null; the
  * element check compiles out when the input type forbids null
  * elements.
  */
case class L2SqE4(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes = Seq(ArrayType(DoubleType), ArrayType(DoubleType))
  override def dataType: DataType = LongType
  override def prettyName: String = "l2sq_e4"

  override def nullable: Boolean = true

  private def checkNulls: Boolean =
    QuantError.elementsNullable(left.dataType) ||
      QuantError.elementsNullable(right.dataType)

  override def nullSafeEval(a: Any, b: Any): Any =
    L2SqE4.compute(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData],
      checkNulls)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val cls = L2SqE4.getClass.getName.stripSuffix("$") + "$"
      val r = ctx.freshName("l2e4")
      s"""
         |java.lang.Long $r = $cls.MODULE$$.compute($a, $b, $checkNulls);
         |${ev.isNull} = ($r == null);
         |${ev.value} = ${ev.isNull} ? 0L : $r.longValue();
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): L2SqE4 =
    copy(left = newLeft, right = newRight)
}

object L2SqE4 {

  /** One fused pass accumulating (aᵢ−bᵢ)² in element order —
    * bit-identical to the sequential HOF fold — then Spark's exact
    * `Round(x·10⁴, 0)`-and-cast: decimal HALF_UP via BigDecimal, never
    * `Math.round` (whose float `x + 0.5` diverges from decimal
    * rounding on edge doubles). Null (boxed) on mismatched lengths or
    * (when `checkNulls`) a null element. Public because generated code
    * calls it. */
  def compute(a: ArrayData, b: ArrayData, checkNulls: Boolean): java.lang.Long = {
    val n = a.numElements()
    if (b.numElements() != n) return null
    if (checkNulls) {
      var i = 0
      while (i < n) {
        if (a.isNullAt(i) || b.isNullAt(i)) return null
        i += 1
      }
    }
    var acc = 0.0
    var i = 0
    while (i < n) {
      val d = a.getDouble(i) - b.getDouble(i)
      acc += d * d
      i += 1
    }
    // BigDecimal.valueOf (the Double.toString construction) is the
    // path Spark's own Round takes for DoubleType — the exact-binary
    // `new BigDecimal(double)` constructor provably agrees at scale 0
    // (half-integers are exactly representable below 2^52) but NOT at
    // nonzero scales, so match Spark's construction outright rather
    // than lean on a scale-0-only equivalence (r15 ADVICE #4)
    val rounded = java.math.BigDecimal.valueOf(acc * 10000.0)
      .setScale(0, java.math.RoundingMode.HALF_UP).doubleValue()
    java.lang.Long.valueOf(rounded.toLong)
  }

  /** Column-level entry point over two `array<double>` vector columns. */
  def apply(a: Column, b: Column): Column =
    GraftColumns.column(L2SqE4(
      GraftColumns.expression(a), GraftColumns.expression(b)))
}
