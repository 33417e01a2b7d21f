package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main (driver-run per round → BENCH_r{N}.json).
  *
  * Harness rules (VERDICT r2 "what's wrong" #1):
  *  - the action is a `noop`-format write, which executes the FULL plan —
  *    including final sorts and all output columns — unlike `count()`,
  *    which lets Catalyst prune both;
  *  - one untimed warmup pass over every query absorbs session/JIT
  *    startup so the first measured query isn't inflated;
  *  - queries run in sorted-name order (stable across JVMs — Map order
  *    is not);
  *  - a failing query is reported in an `errors` map, never as a fake
  *    timing;
  *  - each query is timed THREE times and the MEDIAN is reported
  *    (VERDICT r8 "what's wrong" #1): two consecutive rounds produced
  *    phantom 2–4x regressions on unchanged queries because a single
  *    timed pass is defenseless against external box load landing
  *    mid-suite; a per-query median survives one noisy window.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // SPARK_GRAFT_ONLY=d15_dedup_clusters,d22_… restricts the suite —
    // an iteration convenience (time one query without 70 others); the
    // driver never sets it, so the gated run is always the full suite.
    val only = sys.env.get("SPARK_GRAFT_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    val names = SparkEntry.queries.keys.toSeq.sorted
      .filter(n => only.forall(_.contains(n)))
    def runOnce(name: String): Option[String] =
      try {
        SparkEntry.queries(name)(spark, sfDir)
          .write.format("noop").mode("overwrite").save()
        None
      } catch {
        case e: Throwable =>
          Some(Option(e.getMessage).getOrElse(e.getClass.getName).take(200))
      }

    // Several ops localCheckpoint() intermediates; the blocks outlive the
    // query (freed only when the driver GCs the RDD handle), so over a
    // 70-query run they pile up in the block manager and later queries
    // inherit eviction/GC pressure from earlier ones — measured as
    // occasional 3x outliers (e.g. d34 0.7 s alone vs 2.9 s mid-suite).
    // Dropping them between queries (untimed) makes timings independent.
    // Blocking so the removal work lands in the untimed gap, not under
    // the next query.
    // clearCache additionally frees CACHE TABLE entries (the SQL-script
    // queries, e.g. d49) — those live in the CacheManager, which
    // getPersistentRDDs does not see.
    def releaseCheckpoints(): Unit = {
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = true))
      spark.catalog.clearCache()
    }

    names.foreach { n => runOnce(n); releaseCheckpoints() } // warmup (untimed)

    val errors = scala.collection.mutable.LinkedHashMap[String, String]()
    val passes = 3
    val times = names.flatMap { name =>
      var lastErr: Option[String] = None
      val samples = (1 to passes).flatMap { _ =>
        val t0 = System.nanoTime()
        val r = runOnce(name)
        val dt = (System.nanoTime() - t0) / 1e9
        releaseCheckpoints()
        r match {
          case None => Some(dt)
          case Some(msg) => lastErr = Some(msg); None
        }
      }
      // Median of the successful passes: robust to one contaminated
      // window; an even count (a pass errored) averages the middle two.
      // A query lands in `errors` only if EVERY pass failed — a query
      // that succeeds at all is a timing, not an error.
      if (samples.isEmpty) {
        errors(name) = lastErr.getOrElse("unknown"); None
      } else {
        val s = samples.sorted
        val mid =
          if (s.length % 2 == 1) s(s.length / 2)
          else (s(s.length / 2 - 1) + s(s.length / 2)) / 2
        Some(name -> mid)
      }
    }

    def jstr(s: String): String =
      "\"" + s.flatMap {
        case '"' => "\\\""
        case '\\' => "\\\\"
        case c if c < ' ' => f"\\u${c.toInt}%04x"
        case c => c.toString
      } + "\""
    val qs = times.map { case (k, v) => s"${jstr(k)}:$v" }.mkString("{", ",", "}")
    val es = errors.map { case (k, v) => s"${jstr(k)}:${jstr(v)}" }.mkString("{", ",", "}")
    val total = times.map(_._2).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"errors":$es,"sf":${jstr(sfDir)}}""")
    spark.stop()
  }
}
