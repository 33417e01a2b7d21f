package graft

import org.scalatest.funsuite.AnyFunSuite

/** Invariants of the gated-query registry itself — the layer the
  * driver's correctness harness trusts blindly.
  *
  * The registry is assembled by `Map ++` over per-module maps
  * (`Queries.all`), and `++` SILENTLY keeps the right-hand entry on a
  * key collision: two modules registering the same gate name would
  * shadow one operator with zero signal anywhere — the shadowed op
  * simply stops being verified. These tests make that (and oracle
  * drift) a build failure instead.
  */
class RegistrySpec extends AnyFunSuite {

  private val modules: Seq[(String, Set[String])] = Seq(
    "relational" -> Queries.relational.keySet,
    "TextOps" -> ops.TextOps.queries.keySet,
    "FuzzyDedup" -> ops.FuzzyDedup.queries.keySet,
    "Similarity" -> ops.Similarity.queries.keySet,
    "Multimodal" -> ops.Multimodal.queries.keySet,
    "CorpusOps" -> ops.CorpusOps.queries.keySet,
    "GraphOps" -> ops.GraphOps.queries.keySet,
    "SqlSurface" -> ops.SqlSurface.queries.keySet,
    "StreamGates" -> streaming.StreamGates.queries.keySet,
    "ValidationQueries" -> validate.ValidationQueries.queries.keySet)

  test("no gate name is registered by two modules (Map ++ would shadow one)") {
    val collisions = modules.combinations(2).flatMap {
      case Seq((ma, ka), (mb, kb)) =>
        (ka & kb).map(k => s"$k (in $ma AND $mb)")
    }.toSeq
    assert(collisions.isEmpty,
      s"gate names registered twice — one implementation is silently " +
        s"shadowed:\n${collisions.mkString("\n")}")
    assert(modules.map(_._2.size).sum == SparkEntry.queries.size)
  }

  test("every gated query carries a DuckDB oracle, and no oracle is orphaned") {
    val queries = SparkEntry.queries.keySet
    val oracles = SparkEntry.oracleSql.keySet
    assert((queries -- oracles).isEmpty,
      s"queries without an oracle (driver falls back to a weak rows>0 " +
        s"check): ${(queries -- oracles).toSeq.sorted.mkString(", ")}")
    assert((oracles -- queries).isEmpty,
      s"oracles with no query: ${(oracles -- queries).toSeq.sorted.mkString(", ")}")
  }

  test("gate names follow the driver convention q*/v*/d* with unique numbers") {
    val pat = "^([qvd])(\\d+)_[a-z0-9_]+$".r
    val parsed = SparkEntry.queries.keySet.toSeq.map {
      case n @ pat(series, num) => (n, series, num.toInt)
      case n => fail(s"gate name '$n' does not match ^[qvd]<num>_<slug>$$")
    }
    val dupNums = parsed.groupBy(p => (p._2, p._3)).filter(_._2.size > 1)
    assert(dupNums.isEmpty,
      s"series numbers reused: ${dupNums.keys.mkString(", ")}")
  }
}

/** The events.ts scan normalization — load-bearing and testdata-
  * generation-dependent (the physical encoding changed once already:
  * TIMESTAMP(NANOS) → TIMESTAMP(MICROS, NTZ)), so each accepted form
  * is pinned here against a hand-written file. */
class TablesSpec extends AnyFunSuite with SparkSpec {
  import org.apache.spark.sql.functions._

  private def roundTrip(write: org.apache.spark.sql.DataFrame): Seq[java.sql.Timestamp] = {
    val dir = java.nio.file.Files.createTempDirectory("graft-ts").toString
    write.coalesce(1).write.mode("overwrite").parquet(s"$dir/events.parquet")
    val got = Tables.load(spark, dir, "events")
    assert(got.schema("ts").dataType ==
      org.apache.spark.sql.types.TimestampType,
      s"ts must normalize to TimestampType, got ${got.schema("ts").dataType}")
    got.orderBy("event_id").collect().map(_.getTimestamp(1)).toSeq
  }

  test("events.ts normalizes from nanos-long and micros-NTZ to one TimestampType") {
    import spark.implicits._
    val micros = Seq((1L, 1700000000000000L), (2L, 1700000000500000L))
    // form 1: TIMESTAMP(NANOS), which Spark surfaces as a raw nanos long
    // under spark.sql.legacy.parquet.nanosAsLong — modeled by a plain
    // long column, exactly what the scan sees
    val nanos = roundTrip(
      micros.toDF("event_id", "us")
        .select(col("event_id"), (col("us") * 1000).as("ts")))
    // form 2: TIMESTAMP(MICROS, isAdjustedToUTC=false) = TIMESTAMP_NTZ
    val ntz = roundTrip(
      micros.toDF("event_id", "us")
        .select(col("event_id"),
          timestamp_micros(col("us")).cast("timestamp_ntz").as("ts")))
    // both forms land on the identical UTC instants (session is UTC)
    assert(nanos == ntz)
    assert(nanos.head.getTime == 1700000000000L)
  }
}
