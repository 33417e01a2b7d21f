package graft.functions

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Cast, Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.types.{ByteType, IntegerType, LongType, ShortType}

/** SQL registration for the engine's native Catalyst expressions.
  *
  * The Column API reaches these expressions through their `onColumn`
  * constructors ([[GraftColumns]] bridges `Expression ⇄ Column`), but a
  * SQL-only client — JDBC/Thrift, a notebook `%%sql` cell, a saved SQL
  * pipeline — has no Column API. Registering each expression in the
  * session's `FunctionRegistry` closes that gap: the SQL text
  * `graft_simhash48(graft_token_hashes(...))` compiles to the exact same
  * codegen'd operators as the Scala call, so the SQL surface inherits
  * every hot-loop property the expressions were built for (one md5 per
  * token, fused cosine loop, no interpreted higher-order functions).
  *
  * Two registration paths, both exercised by `ExtensionsSpec`:
  *  - [[GraftFunctions.register]] installs into a LIVE session's
  *    registry (works on any session, however it was built — the common
  *    embedded-library case);
  *  - [[GraftExtensions]] is the `SparkSessionExtensions` injector for
  *    cluster-wide installs via `spark.sql.extensions=graft.functions.
  *    GraftExtensions` (spark-defaults.conf / spark-submit --conf), so
  *    every session on the cluster — including ones the library's Scala
  *    code never touches — resolves the functions.
  *
  * Argument conventions: integral scalar arguments (mod, fallback) are
  * accepted at any integer width and cast to BIGINT here — SQL literals
  * default to INT, and `ExpectsInputTypes` (deliberately, see
  * [[TokenHashes]]) performs no implicit coercion. Array arguments must
  * already have the exact element type (`ARRAY<STRING>`,
  * `ARRAY<BIGINT>`, `ARRAY<DOUBLE>`): an implicit float→double array
  * cast would silently re-plan the caller's scan, so the caller writes
  * `CAST(embedding AS ARRAY<DOUBLE>)` and owns where the cast runs.
  * The shingle window is a compile-time parameter of [[ShingleHashes]]
  * (it shapes the unrolled codegen loop), so the SQL argument must be a
  * foldable integer — a non-literal window raises an analysis-time
  * error, not a runtime one.
  */
object GraftFunctions {

  type Builder = Seq[Expression] => Expression
  type Registration = (FunctionIdentifier, ExpressionInfo, Builder)

  /** Widen an integral scalar argument to BIGINT (SQL `0` is INT; the
    * expressions take LongType). Non-integral types pass through and
    * fail the expression's own input-type check with its message. */
  private def toLong(e: Expression): Expression = e.dataType match {
    case ByteType | ShortType | IntegerType => Cast(e, LongType)
    case _ => e
  }

  /** The shingle window must be a foldable integer: it is a constructor
    * parameter (the codegen loop is shaped by it), not a per-row value. */
  private def windowOf(e: Expression): Int =
    if (!e.foldable)
      throw new IllegalArgumentException(
        "graft_shingle_hashes: the window argument must be a literal integer " +
          "(it parameterizes the generated code, it cannot vary per row)")
    else toLong(e).eval() match {
      case l: java.lang.Long =>
        // A BIGINT literal outside Int range must fail here, not wrap:
        // `CAST(5000000000 AS BIGINT)` silently truncating to 705032704
        // would betray the fail-loudly-at-analysis contract.
        if (l < 1L || l > Int.MaxValue.toLong)
          throw new IllegalArgumentException(
            s"graft_shingle_hashes: the window argument must be between 1 and ${Int.MaxValue}, got $l")
        l.toInt
      case other => throw new IllegalArgumentException(
        s"graft_shingle_hashes: the window argument must be a literal integer, got $other")
    }

  private def bad(name: String, expected: String, got: Int): Nothing =
    throw new IllegalArgumentException(
      s"$name expects $expected argument(s), got $got")

  private def reg(name: String, clazz: Class[_])(b: Builder): Registration =
    (FunctionIdentifier(name), new ExpressionInfo(clazz.getName, null, name), b)

  /** Every native expression under its `graft_`-prefixed SQL name.
    * One entry per expression in `graft.functions` (the prefix keeps the
    * names clear of current and future Spark builtins). */
  val all: Seq[Registration] = Seq(
    reg("graft_token_hashes", classOf[TokenHashes]) {
      case Seq(tokens) => TokenHashes(tokens, Literal(0L))
      case Seq(tokens, mod) => TokenHashes(tokens, toLong(mod))
      case args => bad("graft_token_hashes", "1 (tokens) or 2 (tokens, mod)", args.length)
    },
    reg("graft_shingle_hashes", classOf[ShingleHashes]) {
      case Seq(tokens, fallback) => ShingleHashes(tokens, toLong(fallback))
      case Seq(tokens, fallback, window) =>
        ShingleHashes(tokens, toLong(fallback), windowOf(window))
      case args =>
        bad("graft_shingle_hashes", "2 (tokens, fallback) or 3 (tokens, fallback, window)", args.length)
    },
    reg("graft_chargram_hashes", classOf[CharGramHashes]) {
      case Seq(text, fallback) => CharGramHashes(text, toLong(fallback))
      case args => bad("graft_chargram_hashes", "2 (text, fallback)", args.length)
    },
    reg("graft_bigram_hashes", classOf[BigramHashes]) {
      case Seq(hashes) => BigramHashes(hashes)
      case args => bad("graft_bigram_hashes", "1 (token hashes)", args.length)
    },
    reg("graft_minhash_sigs", classOf[MinHashSigs]) {
      case Seq(hashes) => MinHashSigs(hashes)
      case args => bad("graft_minhash_sigs", "1 (shingle hashes)", args.length)
    },
    reg("graft_simhash48", classOf[SimHash48]) {
      case Seq(hashes) => SimHash48(hashes)
      case args => bad("graft_simhash48", "1 (token hashes)", args.length)
    },
    reg("graft_cosine_sim", classOf[CosineSim]) {
      case Seq(a, b) => CosineSim(a, b)
      case args => bad("graft_cosine_sim", "2 (vector, vector)", args.length)
    },
    reg("graft_quant_error", classOf[QuantError]) {
      case Seq(vec) => QuantError(vec)
      case args => bad("graft_quant_error", "1 (vector)", args.length)
    },
    reg("graft_quant_codes", classOf[QuantCodes]) {
      case Seq(vec) => QuantCodes(vec)
      case args => bad("graft_quant_codes", "1 (vector)", args.length)
    },
    reg("graft_nfc_clean", classOf[NfcClean]) {
      case Seq(text) => NfcClean(text)
      case args => bad("graft_nfc_clean", "1 (text)", args.length)
    },
    // The bloom build/probe pair behind d43's semi-join prefilter
    // ([[BloomFilters]]), as SQL: build the sketch with an aggregate
    // (typically in a scalar subquery), probe it on the scan side of
    // the exchange. Catalyst's own expressions — the build inserts with
    // putLong and the probe reads with mightContainLong, the same
    // contract BloomFilters pins — but Spark registers neither in SQL
    // (they exist for the optimizer's InjectRuntimeFilter rule, which
    // only fires on its size/selectivity heuristics; this makes the
    // pattern explicit). The probe's filter argument must be a constant
    // or scalar subquery — enforced by the expression's own
    // analysis-time check, so a per-row filter column fails loudly.
    reg("graft_bloom_agg",
      classOf[org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate]) {
      case Seq(value) =>
        new org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate(value)
      case Seq(value, estItems) =>
        new org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate(
          value, toLong(estItems))
      case Seq(value, estItems, numBits) =>
        new org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate(
          value, toLong(estItems), toLong(numBits))
      case args =>
        bad("graft_bloom_agg", "1 (value), 2 (value, estimated items) or 3 (value, estimated items, bits)", args.length)
    },
    reg("graft_bloom_might_contain",
      classOf[org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain]) {
      case Seq(filter, value) =>
        org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain(filter, value)
      case args =>
        bad("graft_bloom_might_contain", "2 (filter, value)", args.length)
    },
    // Frequency sibling of the bloom pair: build with Spark's own
    // `count_min_sketch` aggregate (already a SQL builtin), probe with
    // this estimate — `graft_cms_estimate(sketch, value) >= threshold`
    // below the exchange is d71's heavy-hitter prefilter as pure SQL.
    // Sketch argument must be a constant or scalar subquery (the
    // expression's own analysis-time check, same as the bloom probe).
    reg("graft_cms_estimate", classOf[CmsEstimate]) {
      case Seq(sketch, value) => CmsEstimate(sketch, toLong(value))
      case args => bad("graft_cms_estimate", "2 (sketch, value)", args.length)
    },
    // Bounded per-group top-k (score DESC, tie ASC) — the aggregate
    // form of `QUALIFY row_number() OVER (...) <= k` that shuffles
    // k·mapPartitions rows per group instead of the whole input. k
    // shapes the heap, so it must be a literal (same contract as the
    // shingle window).
    reg("graft_topk_by_score", classOf[TopKByScore]) {
      case Seq(kArg, score, tie, payload) =>
        TopKByScore(intLitOf("graft_topk_by_score", kArg), score, tie,
          payload)
      case args =>
        bad("graft_topk_by_score", "4 (k, score, tie, payload)", args.length)
    })

  /** A small foldable integer argument (the top-k heap bound): same
    * fail-loudly-at-analysis contract as [[windowOf]]. */
  private def intLitOf(name: String, e: Expression): Int =
    if (!e.foldable)
      throw new IllegalArgumentException(
        s"$name: the k argument must be a literal integer " +
          "(it bounds the aggregation buffer, it cannot vary per row)")
    else toLong(e).eval() match {
      case l: java.lang.Long if l >= 1L && l <= Int.MaxValue.toLong =>
        l.toInt
      case other => throw new IllegalArgumentException(
        s"$name: the k argument must be a positive literal integer, got $other")
    }

  /** Install all functions into a live session's registry. Idempotent
    * (re-registration replaces the identical builder), so callers on a
    * shared session — e.g. every [[graft.ops.SqlSurface]] query — can
    * invoke it unconditionally. */
  def register(spark: SparkSession): Unit = {
    val registry = org.apache.spark.sql.GraftColumns.functionRegistry(spark)
    all.foreach { case (ident, info, builder) =>
      registry.registerFunction(ident, info, builder)
    }
  }
}

/** `SparkSessionExtensions` injector — the config-driven twin of
  * [[GraftFunctions.register]] for sessions the library's code never
  * constructs: `--conf spark.sql.extensions=graft.functions.GraftExtensions`
  * (or spark-defaults.conf) makes every session on the cluster resolve
  * the `graft_*` functions at analysis time. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(extensions: SparkSessionExtensions): Unit =
    GraftFunctions.all.foreach(extensions.injectFunction)
}
