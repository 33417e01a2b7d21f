package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.ops.CorpusOps

/** The hot-key-safe sessionization must be INDISTINGUISHABLE from the
  * canonical single-window definition — on exactly the distribution
  * the single window cannot survive at scale: one bot user holding
  * half the event log, with sessions that span many time chunks
  * (chained boundary merges), plus exact-gap and exact-chunk-boundary
  * edge events. */
class SkewSessionSpec extends SparkSpec {

  // ~2023-11-14, nowhere near a 6 h chunk boundary
  private val Base = 1700000000000000L
  private val Gap = 1800000000L // 30 min in µs (the session gap)

  /** (event_id, us, user_id, event_type) rows → events.parquet dir. */
  private def writeEvents(rows: Seq[(Long, Long, Long, String)]): String = {
    val dir = Files.createTempDirectory("skewfix").toString
    import spark.implicits._
    rows.toDF("event_id", "us", "user_id", "event_type")
      .select(col("event_id"), timestamp_micros(col("us")).as("ts"),
        col("user_id"), col("event_type"))
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    dir
  }

  private def fixture: String = {
    // HOT USER 1 — 3000 events (50% of the log): runs of 17-minute
    // spacing (continuation) broken by a 57-minute gap every 97 events
    // → sessions of ~97 events spanning ~27 h ≈ 4-5 six-hour chunks
    // each, so nearly every chunk transition is a MERGE and long
    // sessions chain merges across many chunks.
    val hot = (0 until 3000).map { i =>
      val us = Base + i.toLong * 1020L * 1000000L +
        (i / 97).toLong * 2400L * 1000000L
      (i.toLong, us, 1L, s"t${i % 5}")
    }
    // COLD USERS 2..50 — sparse: one event per ~62 min per user, so
    // almost every event is its own session (plenty of non-merged
    // chunk transitions too).
    val cold = (0 until 2990).map { i =>
      val u = 2L + (i % 49)
      val us = Base + (i / 49).toLong * 3720L * 1000000L +
        (i % 49).toLong * 123456789L
      (10000L + i, us, u, s"t${i % 3}")
    }
    // EDGE USER 99 — exact boundaries: two events 1 µs apart straddling
    // an exact chunk boundary (must merge), then a gap of EXACTLY the
    // session threshold (continuation: the rule is strictly >), then
    // threshold+1 (new session).
    val b0 = (Base / CorpusOps.SessChunkUs + 40) * CorpusOps.SessChunkUs
    val edge = Seq(
      (20000L, b0 - 1L, 99L, "a"),
      (20001L, b0, 99L, "b"),
      (20002L, b0 + Gap, 99L, "c"),
      (20003L, b0 + Gap + Gap + 1L, 99L, "d"))
    writeEvents(hot ++ cold ++ edge)
  }

  test("skew-safe sessionization equals the single-window baseline " +
      "on a planted 50%-hot-user log") {
    val dir = fixture
    val cols = Seq("user_id", "session_idx", "event_id", "event_type", "us")
    val base = CorpusOps.sessionizedEvents(spark, dir)
      .orderBy(cols.map(col): _*).collect()
    val safe = CorpusOps.sessionizedEventsSkewSafe(spark, dir)
      .orderBy(cols.map(col): _*).collect()
    assert(base.length == 5994 + 49 * 0) // 3000 + 2990 + 4
    assert(base.sameElements(safe),
      "skew-safe sessions diverge from the canonical definition")
    // sanity on the plant itself: the hot user's sessions really do
    // straddle chunks (otherwise this test exercises nothing)
    val hotSessions = CorpusOps.sessionizedEventsSkewSafe(spark, dir)
      .filter(col("user_id") === 1L)
      .groupBy("session_idx")
      .agg(((max(col("us") - (col("us") % CorpusOps.SessChunkUs)) -
        min(col("us") - (col("us") % CorpusOps.SessChunkUs))) /
        CorpusOps.SessChunkUs).as("chunks_spanned"))
    assert(hotSessions.filter(col("chunks_spanned") >= 3).count() > 10,
      "planted hot user must have many multi-chunk sessions")
  }

  test("skew-safe path windows on (user_id, chunk), not user_id alone") {
    val dir = fixture
    val plan = CorpusOps.sessionizedEventsSkewSafe(spark, dir)
      .queryExecution.optimizedPlan.toString
    assert("windowspecdefinition\\(user_id#\\d+L?, ck#".r
        .findFirstIn(plan).isDefined,
      s"local window must partition on (user_id, ck); plan:\n$plan")
  }
}
