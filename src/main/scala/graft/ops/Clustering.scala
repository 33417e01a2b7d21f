package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed connected components — the pair→cluster primitive behind
  * the dedup surface (text near-dups in
  * [[FuzzyDedup.d15DedupClusters]], embedding near-dups in
  * [[Similarity.d22EmbeddingClusters]]).
  *
  * Algorithm: iterative min-label propagation WITH pointer jumping.
  * Labels start as self; each round every node takes the min of its own
  * and its neighbors' labels (one equi-join edges⋈labels + one
  * min-aggregate, both keyed on node id — small-key shuffles over the
  * EDGE set, which is O(duplicate pairs), not the corpus), then
  * compresses paths by one hop of `label := label(label)` (a self-join
  * of the label table). The compression step turns O(component
  * diameter) rounds into O(log diameter) — a 10^4-hop boilerplate-drift
  * chain converges in ~14 rounds instead of never finishing inside the
  * round guard. Each round is localCheckpoint'd to cut lineage; the
  * convergence probe is a count(), never a collect.
  */
object Clustering {

  /** Connected-component labels for an undirected pair list.
    *
    * @param pairs two numeric columns `a`, `b` (one row per edge)
    * @return (node, label) — label = minimum node id in the component;
    *         only nodes appearing in `pairs` are returned (isolated
    *         nodes are their own cluster: left-join and coalesce at the
    *         call site)
    */
  def minLabelComponents(pairs: DataFrame): DataFrame = {
    // partition the edge set on the propagation key ONCE — every round's
    // join then reuses the checkpointed partitioning instead of
    // re-shuffling the edges
    val edges = pairs.select(col("a").as("s"), col("b").as("dd"))
      .union(pairs.select(col("b").as("s"), col("a").as("dd")))
      .repartition(col("s"))
      .localCheckpoint()

    var labels = edges.select(col("s").as("node")).distinct()
      .withColumn("label", col("node"))
      .localCheckpoint()
    val labelType = labels.schema("label").dataType
    var changed = 1L
    var rounds = 0
    val maxRounds = 100 // with pointer jumping: reached only at diameter ~2^100
    while (changed > 0 && rounds < maxRounds) {
      // carry each node's previous label through the aggregate (max over
      // {prev, null…} = the unique previous value) so convergence falls
      // out of the SAME pass — no per-round next⋈labels probe join
      val prop = edges.join(labels, col("s") === col("node"))
        .select(col("dd").as("node"), col("label"),
          lit(null).cast(labelType).as("prev"))
      // checkpointed: the jump self-join below consumes `next` twice,
      // and ReuseExchange only dedups the shuffle write — the final
      // aggregate would otherwise execute on both sides
      val next = labels.select(col("node"), col("label"),
          col("label").as("prev"))
        .union(prop)
        .groupBy("node").agg(min("label").as("label"), max("prev").as("prev"))
        .localCheckpoint()
      // pointer jumping: label := label(label). Every label IS a node
      // (labels are mins over node ids), so the inner self-join is
      // total; label(label(x)) ≤ label(x) by monotonicity, `least` only
      // guards the invariant.
      val jumped = next
        .join(next.select(col("node").as("ln"), col("label").as("l2")),
          col("label") === col("ln"))
        .select(col("node"),
          least(col("label"), col("l2")).as("label"), col("prev"))
        .localCheckpoint()
      changed = jumped.filter(col("label") < col("prev")).count()
      labels = jumped.select("node", "label")
      rounds += 1
    }
    // fail LOUDLY rather than emit silently-wrong clusters: with path
    // compression, exceeding the guard needs a component of diameter
    // ~2^100 — i.e. broken input, not scale
    require(changed == 0,
      s"label propagation did not converge within $maxRounds rounds")
    labels
  }
}
