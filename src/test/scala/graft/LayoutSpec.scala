package graft

import java.nio.file.Files

import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.execution.SparkPlan

import graft.io.Layouts

/** Storage-layout guarantees: bucketed joins are exchange-free, and
  * partition layout turns selective filters into directory pruning.
  * These are write-time scale levers — the shuffle is paid once, then
  * every downstream join/scan benefits. */
class LayoutSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def collect(plan: SparkPlan): Seq[SparkPlan] =
    plan +: plan.children.flatMap(collect)

  test("bucketed tables join with zero exchange and zero sort") {
    val orders = Tables.load(spark, dir, "orders")
      .select("o_orderkey", "o_custkey", "o_totalprice")
    val lineitem = Tables.load(spark, dir, "lineitem")
      .select("l_orderkey", "l_quantity")
    Layouts.writeBucketed(orders, "orders_b", 8, "o_orderkey")
    Layouts.writeBucketed(lineitem, "lineitem_b", 8, "l_orderkey")
    try {
      val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      try {
        val joined = Layouts.bucketedJoin(spark,
          "orders_b", "o_orderkey", "lineitem_b", "l_orderkey")
        val nodes = collect(joined.queryExecution.executedPlan)
        val exchanges = nodes.filter(_.isInstanceOf[ShuffleExchangeExec])
        assert(exchanges.isEmpty,
          s"bucketed join must not shuffle, found ${exchanges.map(_.nodeName)}")
        val sorts = nodes.filter(
          _.isInstanceOf[org.apache.spark.sql.execution.SortExec])
        assert(sorts.isEmpty,
          "sortBy'd buckets must not re-sort at join time")
        // and it is still the right answer
        val expected = orders.join(lineitem,
          orders("o_orderkey") === lineitem("l_orderkey")).count()
        assert(joined.count() == expected)
      } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    } finally {
      spark.sql("DROP TABLE IF EXISTS orders_b")
      spark.sql("DROP TABLE IF EXISTS lineitem_b")
    }
  }

  test("partitioned layout prunes directories for selective filters") {
    import org.apache.spark.sql.functions.col
    val out = Files.createTempDirectory("graft-part").toString
    Layouts.writePartitioned(
      Tables.load(spark, dir, "events")
        .select("event_id", "user_id", "event_type", "value"),
      out, "event_type")
    val q = spark.read.parquet(out).filter(col("event_type") === "click")
    val scan = q.queryExecution.executedPlan.collectLeaves().collectFirst {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f
    }
    assert(scan.isDefined, "expected a FileSourceScanExec leaf")
    assert(scan.get.partitionFilters.nonEmpty,
      "the event_type filter must reach the scan as a partition filter")
    // pruning actually happened: only the 'click' directory is read
    assert(scan.get.relation.location.inputFiles.forall(_.contains("event_type=")))
    val read = scan.get.selectedPartitions.partitionCount
    assert(read == 1, s"expected exactly 1 pruned partition, got $read")
  }
}
