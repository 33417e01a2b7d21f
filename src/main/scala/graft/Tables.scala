package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

/** Parquet table catalog over a scale-factor directory
  * (`/root/testdata/sf*` layout — see TESTDATA.md).
  *
  * Every query in [[SparkEntry.queries]] loads its inputs through here so
  * that filter pushdown / column pruning reach the parquet scan (plain
  * `spark.read.parquet`, no driver-side materialization).
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, sfDir: String, table: String): DataFrame = {
    val df = spark.read.parquet(s"$sfDir/$table.parquet")
    // events.ts has shipped as two physical forms across testdata
    // generations: TIMESTAMP(NANOS) (Spark reads it only as a raw nanos
    // long, under spark.sql.legacy.parquet.nanosAsLong — set by our
    // session builders) and TIMESTAMP(MICROS, isAdjustedToUTC=false)
    // (read as TIMESTAMP_NTZ). Normalize both to TimestampType right at
    // the scan so every downstream operator sees one timestamp type; the
    // session timezone is pinned to UTC, so the NTZ cast preserves the
    // wall clock — the same value the DuckDB oracle reads natively.
    if (table == "events")
      df.schema.fields.find(_.name == "ts").map(_.dataType) match {
        case Some(LongType) =>
          df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
        case Some(TimestampNTZType) =>
          df.withColumn("ts", col("ts").cast(TimestampType))
        case _ => df
      }
    else df
  }

  /** Register all tables as temp views for `spark.sql` paths. */
  def registerAll(spark: SparkSession, sfDir: String): Unit =
    names.foreach(n => load(spark, sfDir, n).createOrReplaceTempView(n))
}
