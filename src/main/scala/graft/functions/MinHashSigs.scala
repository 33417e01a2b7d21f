package graft.functions

import org.apache.spark.sql.{Column, GraftColumns}
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Native Catalyst expression computing all MinHash signatures of one
  * shingle-hash array in a single pass: `sig_s = min over shingles h of
  * (h · A_s + B_s) mod M`, for the fixed linear-permutation family
  * [[MinHashSigs.PermA]]/[[MinHashSigs.PermB]] (the constants live here,
  * beside the code that computes with them; the d2/d15 DuckDB oracles
  * interpolate the same values).
  *
  * WHY an Expression (same reason as [[TokenHashes]] / [[CosineSim]]):
  * the column formulation — one `array_min(transform(shingles, …))` per
  * signature — is [[MinHashSigs.NumHashes]] interpreted CodegenFallback
  * passes over every document's shingle array, on the banding hot path
  * of the d2/d15 dedup family. This expression unrolls the permutation
  * family into ONE codegen'd loop (8 multiply-add-mod-min per element,
  * all exact long arithmetic — value-equal to the HOFs by definition,
  * pinned by a parity test in `FunctionsSpec`).
  *
  * Input contract: produced by [[ShingleHashes]], so elements are
  * non-null longs in [0, M) and the array is non-empty. Defensively: a
  * null element is skipped (matching `array_min` null semantics), and
  * an empty array (or one of only nulls) returns null — `array_min`
  * would return a null PER SIGNATURE; callers that could ever see an
  * empty shingle array must handle the null before banding.
  */
case class MinHashSigs(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes = Seq(ArrayType(LongType))
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_sigs"

  /** Null on an empty (or all-null) input array, so unconditionally
    * nullable — unreachable from [[ShingleHashes]] output but honest. */
  override def nullable: Boolean = true

  private def checkNulls: Boolean =
    QuantError.elementsNullable(child.dataType)

  override def nullSafeEval(arr: Any): Any =
    MinHashSigs.compute(arr.asInstanceOf[ArrayData], checkNulls)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, arr => {
      val cls = MinHashSigs.getClass.getName.stripSuffix("$") + "$"
      val r = ctx.freshName("sigs")
      s"""
         |org.apache.spark.sql.catalyst.util.GenericArrayData $r =
         |  $cls.MODULE$$.compute($arr, $checkNulls);
         |${ev.isNull} = ($r == null);
         |${ev.value} = $r;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): MinHashSigs =
    copy(child = newChild)
}

object MinHashSigs {

  /** Signature count: 8 hashes banded 2×4 downstream — see the
    * probability analysis on the d2 class doc. */
  val NumHashes = 8

  /** The linear-permutation family h_s = (A_s·h + B_s) mod M — one md5
    * per shingle plus 8 multiply-adds, 8× less hashing than
    * seed-concatenated md5s. M = [[ShingleHashes.M]] = 2^31−1 keeps
    * every product < 2^62 (no overflow in either engine); the constants
    * are fixed odd multipliers so the DuckDB oracle reproduces values
    * exactly. */
  val PermA: Seq[Long] = Seq(1103515245L, 1140671485L, 214013L, 69069L,
    1664525L, 22695477L, 134775813L, 1099087573L)
  val PermB: Seq[Long] = Seq(12345L, 12820163L, 2531011L, 362437L,
    1013904223L, 1L, 1L, 12345L)

  private val M = ShingleHashes.M

  /** All [[NumHashes]] signature mins in one pass. Exact long
    * arithmetic — identical to the per-signature
    * `array_min(transform(…))` folds. Null elements are skipped
    * (`array_min` semantics); returns null when no non-null element
    * exists. Public because generated code calls it. */
  def compute(arr: ArrayData, checkNulls: Boolean): GenericArrayData = {
    val n = arr.numElements()
    val acc = Array.fill(NumHashes)(Long.MaxValue)
    var seen = false
    var i = 0
    while (i < n) {
      if (!checkNulls || !arr.isNullAt(i)) {
        seen = true
        val h = arr.getLong(i)
        var s = 0
        while (s < NumHashes) {
          val v = (h * PermA(s) + PermB(s)) % M
          if (v < acc(s)) acc(s) = v
          s += 1
        }
      }
      i += 1
    }
    if (!seen) null else new GenericArrayData(acc)
  }

  /** Column-level entry point over an `array<long>` shingle-hash
    * column. */
  def apply(shingles: Column): Column =
    GraftColumns.column(MinHashSigs(GraftColumns.expression(shingles)))
}
