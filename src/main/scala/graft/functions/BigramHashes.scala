package graft.functions

import org.apache.spark.sql.{Column, GraftColumns}
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StructField, StructType}

/** Native Catalyst expression forming the hashed-bigram pairs of a
  * token-hash array in one pass: element i of the output is
  * `struct(h1 = hs[i], h12 = (hs[i]·K1 + hs[i+1]) mod M)` — the
  * (conditioning unigram, combined bigram) key pair the bigram-LM
  * surprisal scorer (d41) joins its frequency tables on. Fewer than two
  * tokens yields an empty array (the caller's LEFT join keeps the doc).
  *
  * K1/M are [[ShingleHashes]]'s rolling-poly constants — the SAME
  * combination the d41 DuckDB oracle writes inline
  * (`(hs[i] * K1 + hs[i+1]) % M`), so the two engines agree bit-for-bit.
  *
  * WHY an Expression (same reason as [[TokenHashes]]): the column
  * formulation — `zip_with(hs, slice(hs, 2, …), …)` then a `filter` on
  * the null tail — is a pair of higher-order functions, i.e.
  * interpreted CodegenFallback on the per-element hot path of a scorer
  * that touches every token of the corpus. This expression emits the
  * pairs inside whole-stage codegen; a parity test in `FunctionsSpec`
  * pins it against the HOF formulation.
  */
case class BigramHashes(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes = Seq(ArrayType(LongType))
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("h1", LongType, nullable = false),
    StructField("h12", LongType, nullable = false))),
    containsNull = false)
  override def prettyName: String = "bigram_hashes"

  override def nullSafeEval(hs: Any): Any =
    BigramHashes.compute(hs.asInstanceOf[ArrayData],
      BigramHashes.elementsNullable(child.dataType))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, hs => {
      val cls = BigramHashes.getClass.getName.stripSuffix("$") + "$"
      val checkNulls = BigramHashes.elementsNullable(child.dataType)
      s"""
         |${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData)
         |  $cls.MODULE$$.compute($hs, $checkNulls);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): BigramHashes =
    copy(child = newChild)
}

object BigramHashes {

  private[functions] def elementsNullable(dt: DataType): Boolean = dt match {
    case ArrayType(_, containsNull) => containsNull
    case _ => true
  }

  /** Pair formation over one token-hash array. A pair whose either side
    * is a null element is skipped — the behavior of the HOF
    * formulation's `filter(isNotNull)` tail (the usual producer,
    * [[TokenHashes]], declares containsNull = false, so the check is
    * compiled out of the hot path). Public because generated code calls
    * it. */
  def compute(arr: ArrayData, checkNulls: Boolean): ArrayData = {
    val n = arr.numElements()
    if (n < 2) return new GenericArrayData(Array.empty[Any])
    val k1 = ShingleHashes.K1
    val m = ShingleHashes.M
    if (!checkNulls) {
      val out = new Array[Any](n - 1)
      var i = 0
      while (i < n - 1) {
        val h1 = arr.getLong(i)
        out(i) = new GenericInternalRow(
          Array[Any](h1, (h1 * k1 + arr.getLong(i + 1)) % m))
        i += 1
      }
      new GenericArrayData(out)
    } else {
      val buf = new scala.collection.mutable.ArrayBuffer[Any](n - 1)
      var i = 0
      while (i < n - 1) {
        if (!arr.isNullAt(i) && !arr.isNullAt(i + 1)) {
          val h1 = arr.getLong(i)
          buf += new GenericInternalRow(
            Array[Any](h1, (h1 * k1 + arr.getLong(i + 1)) % m))
        }
        i += 1
      }
      new GenericArrayData(buf.toArray)
    }
  }

  /** Column-level entry point over an `array<long>` token-hash column
    * (typically [[TokenHashes]] output, already reduced mod M). */
  def apply(hs: Column): Column =
    GraftColumns.column(BigramHashes(GraftColumns.expression(hs)))
}
