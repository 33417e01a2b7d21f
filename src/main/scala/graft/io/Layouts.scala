package graft.io

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Storage-layout strategies — the part of the 100 TB story that lives
  * in how data is WRITTEN, not how queries are planned:
  *
  *  - BUCKETING: tables that are repeatedly joined or aggregated on the
  *    same key are written `bucketBy(n, key).sortBy(key)`. Both sides
  *    bucketed on the join key with the same bucket count give a
  *    SortMergeJoin with ZERO Exchange — the shuffle (the scale-dominant
  *    cost) is paid once at write time and amortized over every
  *    subsequent join. A per-bucket LOCAL sort remains: since 3.1 Spark
  *    ignores written bucket sort order at scan time (gated behind the
  *    legacy `bucketedTableScanOutputOrdering` flag), but that sort
  *    operates on one pre-clustered bucket with no data movement.
  *    Pinned by `LayoutSpec`.
  *  - PARTITIONING: low-cardinality, high-selectivity columns
  *    (date, event_type, lang, source) become directory partitions via
  *    `partitionBy`; selective filters then prune entire directories at
  *    planning time (`PartitionFilters` in the scan, not post-scan
  *    `Filter`). Pinned by `LayoutSpec`.
  *
  * Bucket metadata lives in the session catalog (`saveAsTable` — plain
  * `parquet(path)` cannot record it), so the helpers speak table names,
  * not paths.
  */
object Layouts {

  /** Write `df` as a bucketed, per-bucket-sorted catalog table. At 100 TB
    * pick `buckets` so a bucket ≈ one comfortable task
    * (rows·rowWidth/buckets ≲ executor-memory/4); bucket counts must
    * MATCH across tables that join, so fix them per key domain, not per
    * table size. */
  def writeBucketed(df: DataFrame, table: String, buckets: Int,
      key: String): Unit = {
    val spark = df.sparkSession
    // the default in-memory catalog forgets tables across sessions but
    // the warehouse DIRECTORY persists — a later session's saveAsTable
    // (even mode=overwrite) refuses with LOCATION_ALREADY_EXISTS. Drop
    // any catalog entry, then clear the stale location, so the write is
    // idempotent across sessions (Verify/Bench re-runs).
    spark.sql(s"DROP TABLE IF EXISTS `$table`")
    // the stale location is derived from the CURRENT database's layout
    // (default db writes <warehouse>/<table>, any other writes
    // <warehouse>/<db>.db/<table>) — hardcoding the default-db shape
    // would miss the stale dir after USE somedb and could delete an
    // unrelated same-named default-db table's directory
    val db = spark.catalog.currentDatabase
    val warehouse = new org.apache.hadoop.fs.Path(
      spark.conf.get("spark.sql.warehouse.dir"))
    val loc =
      if (db == "default")
        new org.apache.hadoop.fs.Path(warehouse, table.toLowerCase)
      else new org.apache.hadoop.fs.Path(
        new org.apache.hadoop.fs.Path(warehouse, s"$db.db"),
        table.toLowerCase)
    val fs = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(loc)) fs.delete(loc, true)
    // repartition on the SAME hash the bucketizer uses so every bucket
    // is written as exactly ONE file — without it each write task emits
    // a file per bucket it touches (tasks × buckets tiny files at scale)
    df.repartition(buckets, df(key))
      .write.mode("overwrite")
      .bucketBy(buckets, key).sortBy(key)
      .format("parquet").saveAsTable(table)
  }

  /** Equi-join two tables previously written with [[writeBucketed]] on
    * their respective keys (same bucket count): exchange-free
    * SortMergeJoin. */
  def bucketedJoin(spark: SparkSession, leftTable: String, leftKey: String,
      rightTable: String, rightKey: String): DataFrame = {
    val l = spark.table(leftTable)
    val r = spark.table(rightTable)
    l.join(r, l(leftKey) === r(rightKey))
  }

  /** Count ShuffleExchange nodes in a frame's executed plan (AQE root
    * unwrapped to its initial plan — the adaptive root is a LEAF node,
    * so a naive walk would count zero vacuously). The write-time
    * layouts above exist to make this zero on the read path; the d93
    * gate and LayoutSpec both assert through here. */
  def exchangeCount(df: DataFrame): Int = {
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    def walk(p: SparkPlan): Seq[SparkPlan] = p match {
      case a: AdaptiveSparkPlanExec => a +: walk(a.initialPlan)
      case q => q +: q.children.flatMap(walk)
    }
    walk(df.queryExecution.executedPlan)
      .count(_.isInstanceOf[ShuffleExchangeExec])
  }

  /** Write `df` partitioned by a low-cardinality column — the directory
    * layout that turns selective filters into partition pruning. */
  def writePartitioned(df: DataFrame, path: String, column: String): Unit =
    df.write.mode("overwrite").partitionBy(column).parquet(path)

  /** Write the frame as `numShards` deterministic TRAINING SHARDS —
    * the terminal step of the corpus pipeline (the thing data loaders
    * actually read). Shard assignment is hash-based
    * (`xxhash64(key) mod numShards`), so shard sizes stay balanced for
    * ANY key distribution — a range split would inherit whatever skew
    * the id space has. Within-shard row order is deterministic either
    * way, so a re-run writes byte-stable shards (reproducible training
    * inputs): by key, or — `shuffled = true`, what training actually
    * wants — by `xxhash64(key, seed)`, a reproducible PSEUDO-RANDOM
    * permutation (sequential loaders then see decorrelated examples
    * without a separate shuffle job; reshuffling between epochs is a
    * new seed). One shuffle total, clustered on the shard id so each
    * output directory is written by as few tasks as possible. At 100 TB
    * pick `numShards` so a shard ≈ a few GB (loader-friendly, and small
    * enough to re-download on preemption). */
  def writeShards(df: DataFrame, path: String, numShards: Int,
      key: String = "doc_id", shuffled: Boolean = false,
      seed: Long = 0L,
      assign: Option[org.apache.spark.sql.Column] = None): Unit = {
    import org.apache.spark.sql.functions._
    val order =
      if (shuffled) xxhash64(df(key), lit(seed)) else df(key)
    // default assignment is xxhash64 (fastest); `assign` lets a caller
    // swap in an engine-portable hash when the assignment itself must
    // be recomputable outside Spark (the d126 gate recomputes it in
    // DuckDB — xxhash64's seed-42 XXH64 has no DuckDB equivalent)
    df.withColumn("shard",
        assign.getOrElse(pmod(xxhash64(df(key)), lit(numShards.toLong))))
      .withColumn("_ord", order)
      .repartition(numShards, col("shard"))
      .sortWithinPartitions(col("shard"), col("_ord"))
      .drop("_ord")
      .write.mode("overwrite").partitionBy("shard").parquet(path)
  }

  /** Write `df` as `numShards` RANGE shards: `repartitionByRange` on
    * the key (sampled, balanced boundaries), locally sorted, one
    * directory per shard — the sorted-run export whose shard key
    * ranges are strictly disjoint and ordered by shard id, so a
    * consumer can merge-read globally ordered data or binary-search a
    * shard by key. Complements [[writeShards]] (hash assignment:
    * balanced for any key distribution, but unordered). Boundaries
    * come from the range sampler, so placement is balanced but not
    * byte-reproducible run-to-run — the d146 gate pins the ordering
    * contract, not the placement. */
  def writeRangeShards(df: DataFrame, path: String, numShards: Int,
      key: String): Unit = {
    import org.apache.spark.sql.functions._
    df.repartitionByRange(numShards, df(key))
      .withColumn("shard", spark_partition_id())
      .sortWithinPartitions(key)
      .write.mode("overwrite").partitionBy("shard").parquet(path)
  }

  /** Morton (Z-order) interleave of two 16-bit dimensions as a SQL
    * expression string — bit `i` of `a` lands at position `2i`, bit `i`
    * of `b` at `2i+1`. Emitted as a plain `>>`/`&`/`<<` integer formula
    * so the SAME text evaluates identically in Spark SQL and in the
    * DuckDB oracle. Inputs must be pre-masked to 0..65535 AND be
    * BIGINT-typed: bit 15 of `b` lands at position 31, where 32-bit
    * INT arithmetic wraps negative — cast before masking (as
    * [[writeZOrdered]] does).
    *
    * WHY Z-order: min/max zone maps (parquet row-group stats) prune on
    * the leading sort column only — a lexicographic (a, b) sort leaves
    * b-range filters unprunable. Interleaving the bits makes every
    * z-key range a small rectangle in (a, b) space, so row groups stay
    * tight in BOTH dimensions and either filter prunes — the standard
    * multi-dimensional clustering trick for scan-heavy tables. */
  def mortonSql(a: String, b: String): String =
    (0 until 16).map(i =>
      s"((($a >> $i) & 1) << ${2 * i}) + ((($b >> $i) & 1) << ${2 * i + 1})")
      .mkString("(", " + ", ")")

  /** Write Z-ORDERED shards: range-partition and sort by the morton key
    * of two query dimensions, so parquet row-group min/max stats prune
    * range filters on EITHER dimension. The range exchange samples the
    * key distribution (balanced output files even for skewed keys);
    * within-file order is fully deterministic. */
  def writeZOrdered(df: DataFrame, path: String, numShards: Int,
      dimA: String, dimB: String): Unit = {
    import org.apache.spark.sql.functions._
    // BIGINT casts are load-bearing: on an IntegerType dim, bit 15 of
    // dim B lands at position 31 and `<< 31` wraps in INT arithmetic —
    // b = 40000 produced a NEGATIVE zkey and destroyed the clustering
    df.withColumn("_zkey", expr(mortonSql(
        s"(CAST($dimA AS BIGINT) & 65535)", s"(CAST($dimB AS BIGINT) & 65535)")))
      .repartitionByRange(numShards, col("_zkey"))
      .sortWithinPartitions(col("_zkey"))
      .drop("_zkey")
      .write.mode("overwrite").parquet(path)
  }
}
