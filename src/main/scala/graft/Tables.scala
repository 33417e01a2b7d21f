package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

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
    // events.ts is parquet TIMESTAMP(NANOS), which Spark only reads as a
    // raw long (spark.sql.legacy.parquet.nanosAsLong — set by our session
    // builders). Normalize to TimestampType (µs, truncating) right at the
    // scan so every downstream operator sees a real timestamp.
    if (table == "events" &&
        df.schema.fields.exists(f => f.name == "ts" && f.dataType == LongType))
      df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
    else df
  }

  /** Register all tables as temp views for `spark.sql` paths. */
  def registerAll(spark: SparkSession, sfDir: String): Unit =
    names.foreach(n => load(spark, sfDir, n).createOrReplaceTempView(n))
}
