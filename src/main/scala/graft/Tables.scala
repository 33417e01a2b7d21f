package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

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

  def load(spark: SparkSession, sfDir: String, table: String): DataFrame =
    spark.read.parquet(s"$sfDir/$table.parquet")

  /** Register all tables as temp views for `spark.sql` paths. */
  def registerAll(spark: SparkSession, sfDir: String): Unit =
    names.foreach(n => load(spark, sfDir, n).createOrReplaceTempView(n))
}
