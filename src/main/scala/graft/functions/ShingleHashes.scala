package graft.functions

import org.apache.spark.sql.{Column, GraftColumns}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** Native Catalyst expression computing the `window`-word shingle
  * hashes of a token array: each token is md5-hashed once (first 15 hex
  * chars as a 60-bit long, mod M — bit-identical to the DuckDB oracle's
  * `('0x'||substr(md5(t),1,15))::BIGINT % M`), and each run of `window`
  * consecutive token hashes combines by the alternating rolling
  * polynomial `h ← (h·K + tⱼ) mod M` (K = K1 for odd j, K2 for even j).
  * At the default `window = 3` — the dedup family's gated
  * configuration — this is exactly the historical
  * `((t0·K1 + t1) mod M)·K2 + t2 mod M`; production decontamination
  * runs the same expression at 8–13-token windows for precision.
  * Fewer than `window` tokens falls back to a single-element array
  * holding `fallback` (the caller passes the whole-text hash, so short
  * docs still dedup exactly).
  *
  * WHY an Expression: the column formulation — a `transform` binding
  * token hashes to a column, then `element_at` reads inside a second
  * `transform` — is correct only while the optimizer keeps the binding
  * projection intact. When the array feeds `explode`, CollapseProject
  * re-inlines the producing transform into every `element_at`, turning
  * the stage O(tokens²·md5) (measured: 48 s to explode the sf0.1
  * corpus's shingles vs 1.5 s to compute them). A native expression has
  * no projection to collapse: one pass, one md5 per token, inside
  * whole-stage codegen.
  *
  * Semantics are pinned by the d2/d15/d17 DuckDB oracles through the
  * driver gate and by a unit test against the fold formulation.
  */
case class ShingleHashes(left: Expression, right: Expression,
    window: Int = 3)
    extends BinaryExpression with ExpectsInputTypes {

  require(window >= 2, s"shingle window must be >= 2, got $window")

  override def inputTypes = Seq(ArrayType(StringType), LongType)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "shingle_hashes"

  override def nullSafeEval(tokens: Any, fallback: Any): Any = {
    val arr = tokens.asInstanceOf[ArrayData]
    val n = arr.numElements()
    if (n < window) {
      new GenericArrayData(Array(fallback.asInstanceOf[Long]))
    } else {
      val th = new Array[Long](n)
      var i = 0
      while (i < n) {
        th(i) =
          if (arr.isNullAt(i)) ShingleHashes.EmptyHash
          else ShingleHashes.tokenHash(arr.getUTF8String(i).getBytes)
        i += 1
      }
      val out = new Array[Long](n - window + 1)
      i = 0
      while (i < n - window + 1) {
        var h = th(i)
        var j = 1
        while (j < window) {
          val k = if (j % 2 == 1) ShingleHashes.K1 else ShingleHashes.K2
          h = (h * k + th(i + j)) % ShingleHashes.M
          j += 1
        }
        out(i) = h
        i += 1
      }
      new GenericArrayData(out)
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (tokens, fallback) => {
      val n = ctx.freshName("n")
      val th = ctx.freshName("th")
      val out = ctx.freshName("out")
      val i = ctx.freshName("i")
      val cls = ShingleHashes.getClass.getName.stripSuffix("$") + "$"
      // per-element null branch only when the input type admits null
      // elements (see TokenHashes.doGenCode — same hot-loop reasoning)
      val hashExpr = left.dataType match {
        case ArrayType(_, true) =>
          s"""$tokens.isNullAt($i)
             |      ? $cls.MODULE$$.EmptyHash()
             |      : $cls.MODULE$$.tokenHash($tokens.getUTF8String($i).getBytes())""".stripMargin
        case _ =>
          s"$cls.MODULE$$.tokenHash($tokens.getUTF8String($i).getBytes())"
      }
      // `window` is a plan-time constant, so the rolling polynomial is
      // unrolled straight into the generated source — no inner loop
      val poly = (1 until window).foldLeft(s"$th[$i]") { (acc, j) =>
        val k = if (j % 2 == 1) ShingleHashes.K1 else ShingleHashes.K2
        s"(($acc) * ${k}L + $th[$i + $j]) % ${ShingleHashes.M}L"
      }
      s"""
         |int $n = $tokens.numElements();
         |long[] $out;
         |if ($n < $window) {
         |  $out = new long[] { $fallback };
         |} else {
         |  long[] $th = new long[$n];
         |  for (int $i = 0; $i < $n; $i++) {
         |    $th[$i] = $hashExpr;
         |  }
         |  $out = new long[$n - $window + 1];
         |  for (int $i = 0; $i < $n - $window + 1; $i++) {
         |    $out[$i] = $poly;
         |  }
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ShingleHashes =
    copy(left = newLeft, right = newRight)
}

object ShingleHashes {
  /** Modulus / rolling-poly constants — MUST stay in sync with the
    * DuckDB oracle strings in [[graft.ops.FuzzyDedup]]. */
  val M = 2147483647L
  val K1 = 1000003L
  val K2 = 999983L

  /** The DuckDB twin of this expression as a th/sh CTE block over
    * `documents`, keyed by `key` — owned HERE, beside the constants it
    * interpolates, so the shingle scheme has exactly one SQL rendering
    * for every oracle that needs it (d17/d29/d34/d35/d38/d40/d45
    * compose it). The rolling polynomial is unrolled per window by the
    * same fold as [[doGenCode]], so the two renderings cannot drift. */
  def sqlCtes(key: String, window: Int = 3): String = {
    // 1-based like DuckDB lists; alternation matches doGenCode's fold
    val poly = (1 until window).foldLeft("th[i]") { (acc, j) =>
      val k = if (j % 2 == 1) K1 else K2
      s"(($acc) * $k + th[i+$j]) % $M"
    }
    s"""th AS (
         SELECT $key, text,
           list_transform(regexp_extract_all(text, '\\S+'),
                          t -> ('0x'||substr(md5(t),1,15))::BIGINT % $M) AS th
         FROM documents),
       sh AS (
         SELECT $key,
           CASE WHEN len(th) >= $window
             THEN list_transform(range(1, len(th) - ${window - 2}),
                    i -> $poly)
             ELSE [('0x'||substr(md5(text),1,15))::BIGINT % $M] END AS shingles
         FROM th)"""
  }

  /** Hash assigned to a null array element (the empty-string hash):
    * the declared input type accepts `containsNull = true`, so the
    * expression must not NPE on a null token. Positional alignment with
    * the input is preserved and `containsNull = false` stays honest.
    * Public because generated code calls it. */
  val EmptyHash: Long = tokenHash(Array.emptyByteArray)

  /** 60-bit md5-prefix hash mod M — `('0x'||substr(md5(t),1,15))::BIGINT
    * % M` in the oracle. Public because generated code calls it. */
  def tokenHash(utf8Bytes: Array[Byte]): Long =
    java.lang.Long.parseLong(
      org.apache.commons.codec.digest.DigestUtils.md5Hex(utf8Bytes)
        .substring(0, 15), 16) % M

  /** Column-level entry point at the gated default window (3).
    * `fallback` is the value used for docs with fewer than `window`
    * tokens (pass the whole-text hash). */
  def apply(tokens: Column, fallback: Column): Column =
    apply(tokens, fallback, 3)

  /** Column-level entry point with an explicit shingle window —
    * production decontamination runs 8–13-token windows for precision
    * (d17's docstring); the hashing machinery is identical. */
  def apply(tokens: Column, fallback: Column, window: Int): Column =
    GraftColumns.column(ShingleHashes(
      GraftColumns.expression(tokens), GraftColumns.expression(fallback),
      window))
}
