package graft

import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.joins.{BroadcastNestedLoopJoinExec, CartesianProductExec}
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.{FuzzyDedup, Multimodal, Similarity, TextOps}

/** LLM-pipeline operators: semantics + physical-plan guarantees on
  * sf0.001. The value-level correctness gate is the driver's DuckDB
  * compare; these tests pin the scale-critical plan shapes (bucketed
  * joins, no all-pairs) and the multimodal decode plumbing. */
class OpsSpec extends AnyFunSuite with SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def collectPlans(plan: SparkPlan): Seq[SparkPlan] =
    plan +: (plan.children.flatMap(collectPlans) ++
      plan.subqueries.flatMap(collectPlans))

  private def assertNoAllPairs(name: String,
      df: org.apache.spark.sql.DataFrame): Unit = {
    val nodes = collectPlans(df.queryExecution.executedPlan)
    val bad = nodes.filter {
      case _: CartesianProductExec => true
      // 1-row scalar broadcasts are deliberate; an all-pairs BNLJ over the
      // corpus is not. Candidate generation must be an equi-join.
      case _: BroadcastNestedLoopJoinExec => true
      case _ => false
    }
    assert(bad.isEmpty,
      s"$name plan contains all-pairs join nodes: ${bad.map(_.nodeName)}")
  }

  test("minhash dedup plan is bucketed — no cartesian / nested-loop join") {
    assertNoAllPairs("d2_minhash_dedup", FuzzyDedup.d2MinhashDedup(spark, dir))
  }

  test("ann lsh plan is bucketed — no cartesian / nested-loop join") {
    assertNoAllPairs("d10_ann_lsh", Similarity.d10AnnLsh(spark, dir))
  }

  test("embedding dedup plan is bucketed — no cartesian / nested-loop join") {
    assertNoAllPairs("d12_embedding_dedup", Similarity.d12EmbeddingDedup(spark, dir))
  }

  test("exact dedup keeps one row per distinct text, lowest doc_id") {
    val docs = Tables.load(spark, dir, "documents")
    val out = TextOps.d1ExactDedup(spark, dir).collect()
    val distinctTexts = docs.select("text").distinct().count()
    assert(out.length == distinctTexts)
    assert(out.map(_.getLong(0)).toSeq == out.map(_.getLong(0)).toSeq.sorted)
  }

  test("minhash candidates are verified near-dups (jaccard >= 0.5)") {
    val rows = FuzzyDedup.d2MinhashDedup(spark, dir).collect()
    rows.foreach { r =>
      assert(r.getLong(0) < r.getLong(1), "pairs must be ordered doc_a < doc_b")
      assert(r.getDouble(2) >= 0.5)
    }
  }

  test("cosine topk: probe itself ranks first with similarity 1") {
    val top = Similarity.d9CosineTopk(spark, dir).head()
    assert(top.getLong(0) == 0L)
    assert(math.abs(top.getDouble(2) - 1.0) < 1e-9)
  }

  test("multimodal decode: frame counts and feature shape") {
    val blobs = Multimodal.blobs(spark, dir)
    val frames = Multimodal.decodeFrames(blobs).collect()
    val byDoc = frames.groupBy(_.doc_id)
    val lens = blobs.collect().map(b => b.doc_id -> b.data.length).toMap
    assert(byDoc.keySet == lens.keySet)
    byDoc.foreach { case (id, fs) =>
      val expected = math.ceil(lens(id).toDouble / Multimodal.FrameBytes).toInt
      assert(fs.length == expected, s"doc $id frame count")
      assert(fs.map(_.frame_idx).sorted.toSeq == (0 until expected))
      fs.foreach(f => assert(f.feature.length == Multimodal.FeatureDim))
    }
    // determinism: same bytes → same feature
    val f1 = Multimodal.fakeFeature("abcdef".getBytes)
    val f2 = Multimodal.fakeFeature("abcdef".getBytes)
    assert(f1.toSeq == f2.toSeq)
  }
}
