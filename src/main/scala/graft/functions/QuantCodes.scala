package graft.functions

import org.apache.spark.sql.{Column, GraftColumns}
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, ByteType, DataType, DoubleType}

/** Native Catalyst expression emitting a vector's int8 scalar-
  * quantization CODES in a single pass: per-vector max-abs scale
  * (`max(|x|)/127` — the same scheme [[QuantError]] audits), codes
  * `clamp(floor(x/scale + 0.5), ±127)` as `array<tinyint>` — the 4×
  * storage representation itself, not just its error report. An
  * all-zero or empty vector yields all-zero codes (scale 0 — nothing
  * to quantize).
  *
  * The downstream consumer that makes this worth shipping: cosine is
  * SCALE-INVARIANT, so similarity search over the codes equals search
  * over the reconstructed `code·scale` vectors exactly — the per-vector
  * scale cancels out of `cos(a·s₁, b·s₂)`. A quantized vector store
  * therefore serves top-k directly from the tinyint codes
  * ([[graft.ops.Similarity]] d51), reading a quarter of the bytes.
  *
  * WHY an Expression (same reason as [[QuantError]]): the column
  * formulation needs an `aggregate` fold for the scale plus a
  * `transform` for the codes — interpreted higher-order functions on
  * the per-element hot path of a vector-store-sized scan. This runs
  * both loops inside whole-stage codegen, arithmetic identical to the
  * sequential HOF folds (`floor(x/scale + 0.5)` instead of round() for
  * engine parity at exact halves — Spark and DuckDB disagree on the
  * half mode, the explicit formula is bit-identical in both).
  */
case class QuantCodes(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes = Seq(ArrayType(DoubleType))
  override def dataType: DataType = ArrayType(ByteType, containsNull = false)
  override def prettyName: String = "quant_codes"

  /** Null elements poison the whole result, mirroring [[QuantError]]. */
  override def nullable: Boolean =
    child.nullable || QuantError.elementsNullable(child.dataType)

  override def nullSafeEval(vec: Any): Any =
    QuantCodes.compute(vec.asInstanceOf[ArrayData],
      QuantError.elementsNullable(child.dataType))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, vec => {
      val cls = QuantCodes.getClass.getName.stripSuffix("$") + "$"
      val checkNulls = QuantError.elementsNullable(child.dataType)
      val setNull =
        if (nullable) s"${ev.isNull} = ${ev.value} == null;" else ""
      s"""
         |${ev.value} = $cls.MODULE$$.compute($vec, $checkNulls);
         |$setNull
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): QuantCodes =
    copy(child = newChild)
}

object QuantCodes {

  /** Scale fold + code loop over one vector; element order and
    * arithmetic match the sequential HOF folds exactly. Public because
    * generated code calls it. */
  def compute(arr: ArrayData, checkNulls: Boolean): ArrayData = {
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
    val out = new Array[Byte](n)
    if (scale > 0) {
      i = 0
      while (i < n) {
        var code = math.floor(arr.getDouble(i) / scale + 0.5)
        if (code > 127.0) code = 127.0
        if (code < -127.0) code = -127.0
        out(i) = code.toByte
        i += 1
      }
    }
    new GenericArrayData(out)
  }

  /** Column-level entry point over an `array<double>` vector column. */
  def apply(vec: Column): Column =
    GraftColumns.column(QuantCodes(GraftColumns.expression(vec)))
}
