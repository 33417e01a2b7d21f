package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed TOTAL-ORDER rank — global `row_number()` without the
  * single-partition window.
  *
  * The naive formulation — `row_number().over(Window.orderBy(...))` with
  * no partition key — is the classic 100 TB scale-killer: Spark warns
  * "No Partition Defined for Window operation" and funnels the ENTIRE
  * dataset through one task to number it. This primitive produces the
  * identical ranks from three scale-safe pieces:
  *
  *  1. `repartitionByRange` on the sort key — a range exchange (the same
  *     machinery as a distributed sort: sampled boundaries, ~even
  *     buckets), after which bucket i's rows all order before bucket
  *     i+1's;
  *  2. a per-bucket `row_number` — the window HAS a partition key now,
  *     so every bucket numbers its own rows in parallel;
  *  3. bucket offsets — per-bucket counts (one tiny aggregate: one row
  *     per bucket) cumulatively summed and broadcast back, so
  *     `rank = offset(bucket) + local row_number`.
  *
  * The ranks are invariant to WHERE the sampled range boundaries land:
  * any split of a total order into ordered buckets yields the same
  * global positions (callers must pass a TOTAL order — tie-break the
  * sort columns — or rows equal on the key may rank nondeterministically
  * across runs, exactly as a bare `row_number` would). The only
  * driver-sized structure is the offset table, one row per bucket.
  *
  * The bucketed frame is checkpointed: both the count branch and the
  * numbering branch consume it, and `spark_partition_id()` (the bucket
  * id) must be read off ONE materialized exchange — re-executing the
  * range partitioner on a second pass could legally re-sample different
  * boundaries, and the two branches would disagree on bucket membership.
  */
object GlobalOrder {

  /** Append a 1-based `rank` column giving each row's global position
    * under `sortCols` (which must define a total order).
    *
    * @param buckets range-bucket count; defaults to the session's
    *                shuffle partitioning. At 100 TB raise it so each
    *                bucket's sort fits one task comfortably — the offset
    *                table stays one row per bucket either way. */
  def rank(df: DataFrame, sortCols: Seq[Column], buckets: Int = 0): DataFrame =
    ordered(df, sortCols, None, buckets)

  /** Append `rank` AND `running` — the inclusive global prefix sum of
    * `valueCol` in rank order — with the same machinery: the per-bucket
    * offset table carries (count, value-sum) pairs, the in-bucket
    * window computes both functions over ONE sort. The global
    * running-total is what budget-capped selection needs ("keep ranked
    * docs until the token budget"): naively it is a second
    * single-partition window on top of the rank's. */
  def runningTotal(df: DataFrame, sortCols: Seq[Column], valueCol: Column,
      buckets: Int = 0): DataFrame =
    ordered(df, sortCols, Some(valueCol), buckets)

  private def ordered(df: DataFrame, sortCols: Seq[Column],
      value: Option[Column], buckets: Int): DataFrame = {
    val n =
      if (buckets > 0) buckets
      else df.sparkSession.conf.get("spark.sql.shuffle.partitions").toInt
    val withV = value.foldLeft(df.repartitionByRange(n, sortCols: _*)
      .withColumn("__bucket", spark_partition_id())) {
      // the value column is materialized only when a running total is
      // requested — rank-only callers don't pay 8 bytes/row for zeros
      (d, v) => d.withColumn("__v", v.cast("long"))
    }
    val bucketed = withV.localCheckpoint()
    // the prefix sum over the per-bucket (count, sum) pairs is computed
    // ARRAY-side on one collapsed aggregate row (the d19-vocab idiom
    // for already-reduced data) rather than with an unpartitioned
    // window — same reason d19 re-derives rank: the surface bans empty
    // window partition specs outright, and a "this one is small, trust
    // me" exemption would blunt the guard. The O(buckets²) slice-sum
    // runs once, on one row of `buckets` elements.
    val offsets = bucketed.groupBy("__bucket")
      .agg(count(lit(1)).as("__cnt"),
        sum(if (value.isDefined) col("__v") else lit(0L)).as("__sum"))
      .agg(array_sort(collect_list(struct(col("__bucket").as("b"),
        col("__cnt").as("c"), col("__sum").as("s")))).as("rows"))
      .select(explode(transform(col("rows"), (r, i) =>
        struct(r.getField("b").as("b"),
          aggregate(slice(col("rows"), lit(1), i), lit(0L),
            (a, x) => a + x.getField("c")).as("o"),
          aggregate(slice(col("rows"), lit(1), i), lit(0L),
            (a, x) => a + x.getField("s")).as("so")))).as("x"))
      .select(col("x.b").as("__bucket"), col("x.o").as("__offset"),
        col("x.so").as("__sumoff"))
    val w = Window.partitionBy("__bucket").orderBy(sortCols: _*)
    val ranked = bucketed
      .withColumn("__rn", row_number().over(w))
      .join(broadcast(offsets), "__bucket")
      .withColumn("rank", col("__offset") + col("__rn"))
    val out = value match {
      case None => ranked
      case Some(_) => ranked.withColumn("running",
        col("__sumoff") + sum(col("__v")).over(
          w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    }
    out.drop("__bucket", "__rn", "__offset", "__sumoff", "__v")
  }
}
