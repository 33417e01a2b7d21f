package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Reusable relational operators Spark lacks as built-ins, packaged as
  * library functions (the query registry exercises them; users call them
  * directly). */
object Relational {

  /** AS-OF JOIN: attach to every `left` row the timestamp of the most
    * recent `right` row with the same key and a STRICTLY earlier
    * timestamp (the classic "match each trade to the latest prior
    * quote").
    *
    * Spark has no asof operator; the join-shaped encodings (range join,
    * or join + groupBy-max) shuffle both sides and then fight skew on
    * the range predicate. This is the window encoding instead: tag the
    * two inputs, UNION them, and take `last(right ts, ignoreNulls)` over
    * a per-key range frame ending at −1 — ONE shuffle on the key, no
    * join node at all (plan-pinned via q21's test). The range frame (not
    * rows) pins strict `<` semantics independent of same-timestamp tie
    * order.
    *
    * @param left  rows to annotate (any columns; must contain `key`, `ts`)
    * @param right rows looked up as-of (`key`, `ts` used; rest dropped)
    * @param key   equi-key column name, both sides
    * @param ts    integral timestamp column name, both sides (use
    *              `unix_micros` upstream — range frames need numeric
    *              order)
    * @param out   name of the attached as-of timestamp column (null when
    *              no earlier right row exists)
    */
  def asofJoin(left: DataFrame, right: DataFrame, key: String, ts: String,
      out: String): DataFrame = {
    val extra = left.columns.filterNot(c => c == key || c == ts)
    val rAligned = extra.foldLeft(right.select(col(key), col(ts))) {
      (d, c) => d.withColumn(c, lit(null).cast(left.schema(c).dataType))
    }.withColumn("_is_left", lit(false))
    val u = left.withColumn("_is_left", lit(true)).unionByName(rAligned)
    asofTagged(u, col("_is_left"), key, ts, out).drop("_is_left")
  }

  /** [[asofJoin]]'s single-frame core: when both sides already live in
    * ONE frame (e.g. an events table where a type column distinguishes
    * them), pass that frame plus the `isLeft` predicate — the input is
    * scanned ONCE, where the two-frame API necessarily scans its source
    * twice if both sides derive from the same table. Left rows get the
    * latest strictly-earlier non-left timestamp per key. */
  def asofTagged(df: DataFrame, isLeft: Column, key: String, ts: String,
      out: String): DataFrame = {
    val w = Window.partitionBy(key).orderBy(col(ts))
      .rangeBetween(Window.unboundedPreceding, -1)
    df.withColumn(out,
        last(when(!isLeft, col(ts)), ignoreNulls = true).over(w))
      .filter(isLeft)
  }

  /** [[asofTagged]]'s PAYLOAD-CARRYING, INCLUSIVE-BOUNDARY sibling —
    * the feature-store form: attach the `payload` column (and
    * timestamp) of the most recent non-left row AT-OR-BEFORE each left
    * row. Two deliberate contract differences from [[asofTagged]]:
    * the boundary is inclusive (a feature written in the same instant
    * as the label row is knowable at label time — pandas merge_asof's
    * default, DuckDB ASOF's `>=`), and the match's VALUE rides the
    * same window pass — with the ts-only form, recovering the payload
    * costs a join back on (key, ts), i.e. exactly the join the window
    * encoding exists to avoid. Tie order is pinned by sorting non-left
    * rows before left rows at equal timestamps (a rows frame, not a
    * range frame, so the tag order is what resolves the boundary);
    * callers with multiple non-left rows in the same instant should
    * pre-aggregate them to keep the answer engine-independent. */
  def asofValueTagged(df: DataFrame, isLeft: Column, key: String,
      ts: String, payload: String, outVal: String, outTs: String)
      : DataFrame = {
    val w = Window.partitionBy(key)
      .orderBy(col(ts), isLeft.cast("int"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn(outVal,
        last(when(!isLeft, col(payload)), ignoreNulls = true).over(w))
      .withColumn(outTs,
        last(when(!isLeft, col(ts)), ignoreNulls = true).over(w))
      .filter(isLeft)
  }

  /** GAP-BASED SESSIONIZATION: assign a per-key `session_id` (1-based,
    * in time order) that increments whenever the gap to the previous
    * event exceeds `gapUs`. One shuffle on the key; the lag and the
    * running session counter share the same partitioning (no second
    * exchange). Batch twin of the streaming
    * [[graft.streaming.EventStreams]] sessionizers.
    *
    * @param ts    timestamp column (TimestampType; compared in micros)
    * @param order extra columns making the within-key order total (ties
    *              in `ts` otherwise make session ids nondeterministic)
    */
  def sessionize(df: DataFrame, key: String, ts: String, gapUs: Long,
      order: Seq[Column] = Nil): DataFrame = {
    val w = Window.partitionBy(key).orderBy(col(ts) +: order: _*)
    val tsUs = unix_micros(col(ts))
    df.withColumn("_prev_us", lag(tsUs, 1).over(w))
      .withColumn("_new_session",
        when(col("_prev_us").isNull || tsUs - col("_prev_us") > gapUs, 1L)
          .otherwise(0L))
      .withColumn("session_id", sum("_new_session")
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .drop("_prev_us", "_new_session")
  }

  /** TOP-K PER GROUP: the `row_number ≤ k` idiom packaged (Spark 4 plans
    * it as a map-side WindowGroupLimit before the shuffle, so only ≤k
    * rows per group per partition move).
    *
    * @param order within-group ranking (make it total for determinism)
    */
  def topKPerGroup(df: DataFrame, k: Int, keys: Seq[String],
      order: Seq[Column], rankCol: String = "rk"): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*).orderBy(order: _*)
    df.withColumn(rankCol, row_number().over(w)).filter(col(rankCol) <= k)
  }

  /** SALTED equi-join for a SKEWED left side: when the join key has few
    * (or heavy-hitter) values, a plain shuffle join funnels each hot
    * key's rows through one task. Salting splits every left key into
    * `salts` sub-keys — `salt = pmod(saltSrc, salts)` — and replicates
    * the (small, but too large or too dynamic to broadcast) right side
    * once per salt with a generator, so the exchange partitions on
    * (key..., salt) and each hot key spreads over `salts` tasks. Result
    * rows are identical to the plain join (pinned by test); the cost is
    * the ×salts replication of the right side — the standard trade.
    *
    * AQE's skew-join handles sort-merge skew adaptively at runtime;
    * this is the PLANNED form for when the skew is structural and known
    * (a `source` column with four values, a power-law domain key), or
    * when AQE's post-shuffle splitting is unavailable (it cannot split
    * a partition that a single key fills — exactly the
    * few-distinct-keys case this primitive exists for).
    *
    * @param saltSrc per-row integral expression over `left`'s columns
    *                deciding the sub-key (a row-id hash; must be
    *                deterministic for re-run-stable results)
    */
  def saltedJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
      saltSrc: Column, salts: Int): DataFrame = {
    require(salts >= 1, s"salts must be >= 1, got $salts")
    val l = left.withColumn("__salt", pmod(saltSrc, lit(salts)).cast("int"))
    val r = right.withColumn("__salt",
      explode(sequence(lit(0), lit(salts - 1))))
    l.join(r, keys :+ "__salt").drop("__salt")
  }
}
