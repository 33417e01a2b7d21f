package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.FormattedMode

/** Optimization-round measurement tool (guide §1): for each registered
  * query, write `.explain("formatted")` to `plans/<round>/<name><suffix>.txt`
  * and print a per-query profile line — wall seconds, Spark job count,
  * stage count, and summed task time — from a registered listener. The
  * job/stage counts localize machinery cost (each `localCheckpoint`,
  * `collect`, staged parquet write, and micro-batch is its own job),
  * which wall time alone cannot. Runs each query ONCE via the noop sink
  * (same action as Bench); not a timing artifact — Bench stays the
  * bench.
  *
  * Env: SPARK_GRAFT_SF_DIR, SPARK_GRAFT_CPUS, SPARK_GRAFT_ONLY as in
  * Bench; SPARK_GRAFT_PLAN_DIR (default plans/r17), SPARK_GRAFT_PLAN_SUFFIX
  * (default "_before").
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val planDir = sys.env.getOrElse("SPARK_GRAFT_PLAN_DIR", "plans/r17")
    val suffix = sys.env.getOrElse("SPARK_GRAFT_PLAN_SUFFIX", "_before")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Files.createDirectories(Paths.get(planDir))

    // per-query counters, reset between queries (queries run serially)
    val jobs = new java.util.concurrent.atomic.AtomicLong()
    val stages = new java.util.concurrent.atomic.AtomicLong()
    val taskTimeMs = new java.util.concurrent.atomic.AtomicLong()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit =
        jobs.incrementAndGet()
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit = {
        stages.incrementAndGet()
        taskTimeMs.addAndGet(s.stageInfo.taskMetrics.executorRunTime)
      }
    })

    val only = sys.env.get("SPARK_GRAFT_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    val names = SparkEntry.queries.keys.toSeq.sorted
      .filter(n => only.forall(_.contains(n)))
    names.foreach { name =>
      jobs.set(0); stages.set(0); taskTimeMs.set(0)
      val t0 = System.nanoTime()
      try {
        val df = SparkEntry.queries(name)(spark, sfDir)
        // plan first (cheap), then execute with the bench's action
        Files.writeString(Paths.get(s"$planDir/$name$suffix.txt"),
          df.queryExecution.explainString(FormattedMode))
        spark.sparkContext.setJobDescription(name)
        df.write.format("noop").mode("overwrite").save()
        spark.sparkContext.setJobDescription(null)
        val dt = (System.nanoTime() - t0) / 1e9
        println(f"PROFILE $name%-28s wall=$dt%7.2fs jobs=${jobs.get()}%4d " +
          f"stages=${stages.get()}%4d taskTime=${taskTimeMs.get() / 1000.0}%8.2fs")
      } catch {
        case e: Throwable =>
          println(s"PROFILE $name ERROR ${Option(e.getMessage).getOrElse(e.getClass.getName).take(160)}")
      }
      // same inter-query hygiene as Bench
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = true))
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
