package graft.functions

import org.apache.spark.sql.{Column, GraftColumns}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, StructField, StructType}

/** Native Catalyst expression computing the int8 scalar-quantization
  * audit of one vector in a single pass: the per-vector max-abs scale
  * (`max(|x|)/127`) and the mean absolute reconstruction error of the
  * round-trip `x → clamp(floor(x/scale + 0.5), ±127) → code·scale`.
  * Returns `struct<scale: double, err: double>`; an all-zero or empty
  * vector has `scale = 0, err = 0` (nothing to quantize, nothing lost).
  *
  * WHY an Expression (same reason as [[TokenHashes]]): the column
  * formulation needs one `aggregate` fold for the scale and a
  * `transform`+`aggregate` pair for the error — higher-order functions,
  * i.e. interpreted CodegenFallback on the per-element hot path of a
  * vector-store-sized audit. This expression runs the two loops inside
  * whole-stage codegen, element order and arithmetic identical to the
  * sequential HOF folds (pinned by a parity test in `FunctionsSpec`),
  * so swapping it in cannot move the driver-gated hashes.
  *
  * `floor(x/scale + 0.5)` rather than a round() call for the same
  * engine-parity reason as the d42 oracle: Spark and DuckDB disagree on
  * rounding mode at exact halves; the explicit formula is bit-identical
  * in both (and here).
  */
case class QuantError(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes = Seq(ArrayType(DoubleType))
  override def dataType: DataType = StructType(Seq(
    StructField("scale", DoubleType, nullable = false),
    StructField("err", DoubleType, nullable = false)))
  override def prettyName: String = "quant_error"

  /** Null elements poison the whole result (the HOF formulation's
    * `acc + null = null` behavior), so the result is nullable whenever
    * the input type admits them. */
  override def nullable: Boolean =
    child.nullable || QuantError.elementsNullable(child.dataType)

  override def nullSafeEval(vec: Any): Any =
    QuantError.compute(vec.asInstanceOf[ArrayData],
      QuantError.elementsNullable(child.dataType))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, vec => {
      val cls = QuantError.getClass.getName.stripSuffix("$") + "$"
      val checkNulls = QuantError.elementsNullable(child.dataType)
      // compute() returns null iff checkNulls and an element is null;
      // with containsNull = false input (the embeddings path) the
      // expression is non-nullable and ev.isNull is a literal — no
      // assignment is emitted (and compute cannot return null)
      val setNull =
        if (nullable) s"${ev.isNull} = ${ev.value} == null;" else ""
      s"""
         |${ev.value} = $cls.MODULE$$.compute($vec, $checkNulls);
         |$setNull
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): QuantError =
    copy(child = newChild)
}

object QuantError {

  private[functions] def elementsNullable(dt: DataType): Boolean = dt match {
    case ArrayType(_, containsNull) => containsNull
    case _ => true
  }

  /** Both quantization loops over one vector. Element order and
    * arithmetic match the sequential HOF folds exactly (max-abs fold,
    * then sum-of-abs-error fold, division last). Public because
    * generated code calls it. */
  def compute(arr: ArrayData, checkNulls: Boolean): InternalRow = {
    val n = arr.numElements()
    if (checkNulls) {
      var i = 0
      while (i < n) {
        if (arr.isNullAt(i)) return null
        i += 1
      }
    }
    var maxAbs = 0.0
    var i = 0
    while (i < n) {
      val a = math.abs(arr.getDouble(i))
      if (a > maxAbs) maxAbs = a
      i += 1
    }
    val scale = maxAbs / 127.0
    var err = 0.0
    if (scale > 0) {
      var sum = 0.0
      i = 0
      while (i < n) {
        val x = arr.getDouble(i)
        var code = math.floor(x / scale + 0.5)
        if (code > 127.0) code = 127.0
        if (code < -127.0) code = -127.0
        sum += math.abs(x - code * scale)
        i += 1
      }
      err = sum / n
    }
    new GenericInternalRow(Array[Any](scale, err))
  }

  /** Column-level entry point over an `array<double>` vector column. */
  def apply(vec: Column): Column =
    GraftColumns.column(QuantError(GraftColumns.expression(vec)))
}
