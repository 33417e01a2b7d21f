package graft.functions

import org.apache.spark.sql.{Column, GraftColumns}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression computing the character-3-gram hashes of
  * a string: consecutive code-point triples combined by the rolling
  * polynomial `((c0·131 + c1) mod M)·131 + c2 mod M`. Strings shorter
  * than 3 code points fall back to a single-element array holding
  * `fallback` (the caller passes the whole-text hash).
  *
  * WHY an Expression: the column formulation
  * (`transform(split(text, ""), c => ascii(c))` + a second transform
  * for the rolling poly) materializes one single-character STRING per
  * character and interprets two lambdas per gram — the same
  * CodegenFallback cost as the shingle path. This walks the UTF-8
  * code points once per row inside codegen, allocating only the output
  * array. Semantics (code-point values) match `ascii()` per character
  * in both engines for the BMP; the gate corpus is ASCII (enforced by
  * an OpsSpec test).
  */
case class CharGramHashes(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes = Seq(StringType, LongType)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "char_gram_hashes"

  override def nullSafeEval(text: Any, fallback: Any): Any = {
    val cps = CharGramHashes.codePoints(text.asInstanceOf[UTF8String])
    if (cps.length < 3) new GenericArrayData(Array(fallback.asInstanceOf[Long]))
    else {
      val out = new Array[Long](cps.length - 2)
      var i = 0
      while (i < cps.length - 2) {
        out(i) = ((cps(i) * 131L + cps(i + 1)) % CharGramHashes.M * 131L +
          cps(i + 2)) % CharGramHashes.M
        i += 1
      }
      new GenericArrayData(out)
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (text, fallback) => {
      val cps = ctx.freshName("cps")
      val out = ctx.freshName("out")
      val i = ctx.freshName("i")
      val cls = CharGramHashes.getClass.getName.stripSuffix("$") + "$"
      s"""
         |long[] $cps = $cls.MODULE$$.codePoints($text);
         |long[] $out;
         |if ($cps.length < 3) {
         |  $out = new long[] { $fallback };
         |} else {
         |  $out = new long[$cps.length - 2];
         |  for (int $i = 0; $i < $cps.length - 2; $i++) {
         |    $out[$i] = (($cps[$i] * 131L + $cps[$i + 1]) % ${CharGramHashes.M}L * 131L
         |      + $cps[$i + 2]) % ${CharGramHashes.M}L;
         |  }
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CharGramHashes =
    copy(left = newLeft, right = newRight)
}

object CharGramHashes {
  val M = 2147483647L

  /** Code points of a UTF8String as longs. Public because generated
    * code calls it. */
  def codePoints(s: UTF8String): Array[Long] = {
    val str = s.toString
    val out = new Array[Long](str.codePointCount(0, str.length))
    var i = 0
    var k = 0
    while (i < str.length) {
      val cp = str.codePointAt(i)
      out(k) = cp.toLong
      k += 1
      i += Character.charCount(cp)
    }
    out
  }

  def apply(text: Column, fallback: Column): Column =
    GraftColumns.column(CharGramHashes(
      GraftColumns.expression(text), GraftColumns.expression(fallback)))
}
