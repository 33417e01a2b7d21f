package graft.functions

import org.apache.spark.sql.{Column, GraftColumns}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Native Catalyst expression computing the cosine similarity of two
  * double vectors in a single fused pass: `dot(a,b) / (‖a‖ · ‖b‖)`,
  * unrounded (callers own the engine-parity rounding).
  *
  * WHY an Expression (same reason as [[TokenHashes]] / [[QuantError]]):
  * the column formulation — `aggregate(zip_with(a, b, _*_), 0.0, _+_)`
  * for the dot plus a `transform`+`aggregate` pair per norm — is four
  * higher-order functions, i.e. interpreted CodegenFallback, and cosine
  * runs per CANDIDATE PAIR in the similarity family (the bucket join's
  * output in d10/d12/d22, N·K cell assignment in d14), the hottest
  * arithmetic in the engine. This expression runs one fused loop inside
  * whole-stage codegen. The three accumulators are independent and fold
  * in element order, so every intermediate double is bit-identical to
  * the sequential HOF folds (pinned by a parity test in
  * `FunctionsSpec`); swapping it in cannot move the driver-gated hashes.
  *
  * Null behavior mirrors the HOF formulation: a null element poisons
  * the result (`acc + null = null`), and mismatched lengths return null
  * (`zip_with` pads the shorter side with nulls). Both only arise on
  * malformed input — the embeddings table declares `containsNull =
  * false` and fixed-width vectors — so the null branch costs nothing on
  * the gated path (the element check is compiled out when the input
  * type forbids null elements).
  */
case class CosineSim(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes = Seq(ArrayType(DoubleType), ArrayType(DoubleType))
  override def dataType: DataType = DoubleType
  override def prettyName: String = "cosine_sim"

  /** Null on mismatched lengths is possible for any input, so the
    * expression is unconditionally nullable (one compare per pair —
    * noise next to the 3·n fused multiply-adds it guards). */
  override def nullable: Boolean = true

  private def checkNulls: Boolean =
    QuantError.elementsNullable(left.dataType) ||
      QuantError.elementsNullable(right.dataType)

  override def nullSafeEval(a: Any, b: Any): Any =
    CosineSim.compute(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData],
      checkNulls)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val cls = CosineSim.getClass.getName.stripSuffix("$") + "$"
      val r = ctx.freshName("cos")
      s"""
         |java.lang.Double $r = $cls.MODULE$$.compute($a, $b, $checkNulls);
         |${ev.isNull} = ($r == null);
         |${ev.value} = ${ev.isNull} ? 0.0 : $r.doubleValue();
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CosineSim =
    copy(left = newLeft, right = newRight)
}

object CosineSim {

  /** One fused pass: dot, ‖a‖², ‖b‖² accumulate independently in
    * element order — bit-identical to the sequential HOF folds. Null
    * (boxed) on mismatched lengths or (when `checkNulls`) a null
    * element, mirroring `zip_with`/`aggregate` null semantics. Public
    * because generated code calls it. */
  def compute(a: ArrayData, b: ArrayData, checkNulls: Boolean): java.lang.Double = {
    val n = a.numElements()
    if (b.numElements() != n) return null
    if (checkNulls) {
      var i = 0
      while (i < n) {
        if (a.isNullAt(i) || b.isNullAt(i)) return null
        i += 1
      }
    }
    var dot = 0.0
    var na = 0.0
    var nb = 0.0
    var i = 0
    while (i < n) {
      val x = a.getDouble(i)
      val y = b.getDouble(i)
      dot += x * y
      na += x * x
      nb += y * y
      i += 1
    }
    java.lang.Double.valueOf(dot / (math.sqrt(na) * math.sqrt(nb)))
  }

  /** Column-level entry point over two `array<double>` vector columns. */
  def apply(a: Column, b: Column): Column =
    GraftColumns.column(CosineSim(
      GraftColumns.expression(a), GraftColumns.expression(b)))
}
