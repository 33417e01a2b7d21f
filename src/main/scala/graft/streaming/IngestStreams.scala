package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming-ingest operators for the documents pipeline — the
  * streaming counterparts of the batch corpus-hygiene ops, applied in
  * cheapest-first order BEFORE any expensive downstream stage (shingle
  * hashing, embedding, decode), same rule as the batch pipeline.
  */
object IngestStreams {

  /** Cheap quality gate at ingest: token count and length window —
    * the streaming twin of the d6 scoring thresholds. Pure map, no
    * state. */
  def qualityFiltered(docs: DataFrame, minTokens: Int = 3,
      maxChars: Int = 1 << 20): DataFrame =
    docs.filter(
      // TextOps.tokens is THE tokenizer definition — reusing it keeps
      // this gate's token counts in lock-step with the batch operators
      size(graft.ops.TextOps.tokens(col("text"))) >= minTokens &&
        length(col("text")) <= maxChars)

  /** Exact content dedup at ingest — the streaming counterpart of the
    * batch d1: any document whose md5(text) was already seen within the
    * watermark horizon is dropped, keeping the FIRST arrival.
    * `dropDuplicatesWithinWatermark` bounds the hash-set state to the
    * horizon (a plain `dropDuplicates` would grow state forever), which
    * is the right trade at ingest: at-least-once re-deliveries and
    * boilerplate bursts arrive close in time; corpus-wide exact dedup
    * remains the batch d1/d15 pass. The state payload is the 16-byte
    * hash, never the text. */
  def dedupedDocs(docs: DataFrame): DataFrame =
    docs
      .withColumn("text_hash", md5(col("text")))
      .withWatermark("ingest_ts", "1 hour")
      .dropDuplicatesWithinWatermark("text_hash")

  /** Streaming DECONTAMINATION gate — the streaming twin of the batch
    * d17 scan: any arriving document whose distinct-shingle overlap with
    * the benchmark/eval set reaches `threshold` is dropped before it can
    * enter the corpus.
    *
    * Shape: the benchmark side is an EVAL SET, i.e. tiny by definition,
    * so it collapses to a single array row broadcast to every task; the
    * per-document overlap is then `array_intersect` in a stateless map —
    * no stream-stream join, no state store, nothing to expire. Overlap
    * semantics (distinct shingles, same rolling-poly hashes) match d17
    * exactly, so batch and streaming agree on what "contaminated" means.
    *
    * @param docs streaming (doc_id, text, …) frame
    * @param bench static benchmark documents (doc_id, text)
    */
  def decontaminated(docs: DataFrame, bench: DataFrame,
      threshold: Double = 0.5): DataFrame = {
    val benchSet = graft.ops.FuzzyDedup.shingleHashes(bench)
      .agg(array_distinct(flatten(collect_list("shingles"))).as("bench_sh"))
    // every input column survives — the gate sits mid-pipeline, so the
    // surviving documents must still carry text & friends downstream
    docs
      .withColumn("_sh", graft.ops.FuzzyDedup.shingleSetCol(col("text")))
      .join(broadcast(benchSet))
      .withColumn("_ov",
        size(array_intersect(col("_sh"), col("bench_sh"))).cast("double") /
          greatest(size(col("_sh")), lit(1)))
      .filter(col("_ov") < threshold)
      .withColumn("overlap", round(col("_ov"), 4))
      .drop("_sh", "bench_sh", "_ov")
  }

  /** SPLIT ROUTING at ingest — tags every surviving document with its
    * train/val/test assignment ([[graft.ops.CorpusOps.splitOf]], the
    * SAME salted doc_id hash as the batch d33 report), so the stream
    * writer can `partitionBy("split")` and documents land in their
    * shard directly. Stateless narrow map; because the assignment is a
    * pure function of the id, a document gets the identical split
    * whether it arrives via this stream or a batch backfill — provided
    * ids are stable across paths. A re-ingest under a NEW id past the
    * dedup watermark horizon would be re-assigned independently; a
    * pipeline without stable ids should route on the content key
    * instead (`splitOf(md5(col("text")))` — same function, content-
    * keyed), trading split stability under document edits for immunity
    * to id churn. */
  def routed(docs: DataFrame): DataFrame =
    docs.withColumn("split", graft.ops.CorpusOps.splitOf(col("doc_id")))

  /** The composed ingest front: quality gate → exact dedup → split. */
  def ingest(docs: DataFrame): DataFrame =
    routed(dedupedDocs(qualityFiltered(docs)))
}
