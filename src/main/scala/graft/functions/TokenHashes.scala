package graft.functions

import org.apache.spark.sql.{Column, GraftColumns}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression, Literal}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** Native Catalyst expression mapping a token array to its 60-bit
  * md5-prefix hashes (`('0x'||substr(md5(t),1,15))::BIGINT` in the
  * DuckDB oracle), optionally reduced mod `m` (`m = 0` → unreduced).
  *
  * WHY an Expression (same reason as [[ShingleHashes]]): the
  * `transform(tokens, t => hash60(t))` column formulation is interpreted
  * (higher-order functions are CodegenFallback) and — worse — is only
  * O(tokens) while the optimizer keeps the producing projection intact;
  * if the array ever feeds `explode` alongside another consumer,
  * CollapseProject re-inlines the transform into every reference. A
  * native expression hashes each token exactly once inside whole-stage
  * codegen, making the cost guarantee structural rather than dependent
  * on a checkpoint staying adjacent.
  */
case class TokenHashes(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes = Seq(ArrayType(StringType), LongType)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "token_hashes"

  override def nullSafeEval(tokens: Any, mod: Any): Any = {
    val arr = tokens.asInstanceOf[ArrayData]
    val m = mod.asInstanceOf[Long]
    val n = arr.numElements()
    val out = new Array[Long](n)
    var i = 0
    while (i < n) {
      val h =
        if (arr.isNullAt(i)) TokenHashes.EmptyHash
        else TokenHashes.hash60(arr.getUTF8String(i).getBytes)
      out(i) = if (m > 0) h % m else h
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (tokens, mod) => {
      val n = ctx.freshName("n")
      val out = ctx.freshName("out")
      val i = ctx.freshName("i")
      val h = ctx.freshName("h")
      val cls = TokenHashes.getClass.getName.stripSuffix("$") + "$"
      // the per-element null branch is emitted only when the input
      // array's type admits null elements — the common producers
      // (regexp_extract_all, split) declare containsNull = false, and
      // this loop is the hot path of every token-level operator
      val hashExpr = left.dataType match {
        case ArrayType(_, true) =>
          s"""$tokens.isNullAt($i)
             |    ? $cls.MODULE$$.EmptyHash()
             |    : $cls.MODULE$$.hash60($tokens.getUTF8String($i).getBytes())""".stripMargin
        case _ =>
          s"$cls.MODULE$$.hash60($tokens.getUTF8String($i).getBytes())"
      }
      s"""
         |int $n = $tokens.numElements();
         |long[] $out = new long[$n];
         |for (int $i = 0; $i < $n; $i++) {
         |  long $h = $hashExpr;
         |  $out[$i] = ($mod > 0L) ? $h % $mod : $h;
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): TokenHashes =
    copy(left = newLeft, right = newRight)
}

object TokenHashes {
  /** Hash assigned to a null array element: the hash of the empty
    * string. The declared input type accepts `containsNull = true`, so
    * the expression must not NPE on a null token; mapping null to the
    * empty-string hash keeps the output array positionally aligned with
    * the input (no silent drops) and `containsNull = false` honest.
    * Public because generated code calls it. */
  val EmptyHash: Long = hash60(Array.emptyByteArray)

  /** Unreduced 60-bit md5-prefix hash. Public because generated code
    * calls it. */
  def hash60(utf8Bytes: Array[Byte]): Long =
    java.lang.Long.parseLong(
      org.apache.commons.codec.digest.DigestUtils.md5Hex(utf8Bytes)
        .substring(0, 15), 16)

  /** Column-level entry point; `mod = 0` leaves hashes unreduced. */
  def apply(tokens: Column, mod: Long): Column =
    GraftColumns.column(TokenHashes(
      GraftColumns.expression(tokens), Literal(mod)))
}
