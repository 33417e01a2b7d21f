package graft.functions

import org.apache.spark.sql.{Column, GraftColumns}
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Native Catalyst expression computing the 48-bit SimHash of an array
  * of token hashes: every token votes its low 48 bits; output bit i is
  * set when the set-votes for bit i are a strict majority of the tokens.
  *
  * WHY an Expression and not `aggregate`/`transform`: Spark's
  * higher-order array functions are CodegenFallback — every lambda
  * application is interpreted, and a fold carrying a 48-element vote
  * array allocates and boxes per TOKEN (measured: 4.9 s for the simhash
  * map stage at sf0.1, 37 s for the banded join that computes it on
  * both sides). This expression walks the array once per row with a
  * primitive `int[48]` inside whole-stage codegen — same semantics,
  * no per-element allocation (measured after: the map stage drops to
  * scan speed; see BENCH_r4).
  *
  * Semantics are pinned by [[graft.ops.FuzzyDedup.d3Oracle]] (the
  * DuckDB per-bit CASE formulation) through the driver gate, and by a
  * unit test against an independent Scala reimplementation.
  */
case class SimHash48(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  // AbstractDataType is private[sql]; the refined override type is fine
  override def inputTypes = Seq(ArrayType(LongType))
  override def dataType: DataType = LongType
  override def prettyName: String = "simhash48"

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val votes = new Array[Int](48)
    var k = 0
    while (k < n) {
      val h = arr.getLong(k)
      var i = 0
      while (i < 48) {
        votes(i) += ((h >>> i) & 1L).toInt
        i += 1
      }
      k += 1
    }
    var out = 0L
    var i = 0
    while (i < 48) {
      if (votes(i) * 2 > n) out |= 1L << i
      i += 1
    }
    out
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val votes = ctx.freshName("votes")
      val n = ctx.freshName("n")
      val k = ctx.freshName("k")
      val i = ctx.freshName("i")
      val h = ctx.freshName("h")
      val out = ctx.freshName("out")
      s"""
         |int $n = $c.numElements();
         |int[] $votes = new int[48];
         |for (int $k = 0; $k < $n; $k++) {
         |  long $h = $c.getLong($k);
         |  for (int $i = 0; $i < 48; $i++) {
         |    $votes[$i] += (int) (($h >>> $i) & 1L);
         |  }
         |}
         |long $out = 0L;
         |for (int $i = 0; $i < 48; $i++) {
         |  if ($votes[$i] * 2 > $n) $out |= 1L << $i;
         |}
         |${ev.value} = $out;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): SimHash48 =
    copy(child = newChild)
}

object SimHash48 {
  /** Column-level entry point: `SimHash48(tokenHashes)`. */
  def apply(tokenHashes: Column): Column =
    GraftColumns.column(SimHash48(GraftColumns.expression(tokenHashes)))
}
