package graft.io

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Storage-layout strategies — the part of the 100 TB story that lives
  * in how data is WRITTEN, not how queries are planned:
  *
  *  - BUCKETING: tables that are repeatedly joined or aggregated on the
  *    same key are written `bucketBy(n, key).sortBy(key)`. Both sides
  *    bucketed on the join key with the same bucket count give a
  *    SortMergeJoin with ZERO Exchange (and zero Sort, buckets are
  *    pre-sorted) — the shuffle is paid once at write time and amortized
  *    over every subsequent join. Pinned by `LayoutSpec`.
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
      key: String): Unit =
    df.write.mode("overwrite")
      .bucketBy(buckets, key).sortBy(key)
      .format("parquet").saveAsTable(table)

  /** Equi-join two tables previously written with [[writeBucketed]] on
    * their respective keys (same bucket count): exchange-free
    * SortMergeJoin. */
  def bucketedJoin(spark: SparkSession, leftTable: String, leftKey: String,
      rightTable: String, rightKey: String): DataFrame = {
    val l = spark.table(leftTable)
    val r = spark.table(rightTable)
    l.join(r, l(leftKey) === r(rightKey))
  }

  /** Write `df` partitioned by a low-cardinality column — the directory
    * layout that turns selective filters into partition pruning. */
  def writePartitioned(df: DataFrame, path: String, column: String): Unit =
    df.write.mode("overwrite").partitionBy(column).parquet(path)
}
