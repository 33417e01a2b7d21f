package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Similarity search over the `embeddings` table
  * (vec_id, embedding: Array[Float] (64-dim), label).
  *
  * Two tiers (BASELINE.json north-star "similarity search"):
  *  - d9: brute-force cosine top-k — the exact baseline, a narrow map +
  *    TakeOrderedAndProject; right answer, O(corpus) per query.
  *  - d10: sign-LSH bucketed ANN — the scale path: candidates come from
  *    an equi-join on a hyperplane-sign bucket, so each query only scores
  *    its bucket (expected corpus/2^bits of the data), never all rows.
  *
  * All arithmetic is promoted to double BEFORE any sum so results are
  * engine-reproducible (float accumulation order would diverge);
  * `functions.aggregate` folds sequentially, matching the oracle's
  * element-order sum.
  */
object Similarity {

  private def emb(spark: SparkSession, dir: String): DataFrame =
    Tables.load(spark, dir, "embeddings")
      .select(col("vec_id"), col("label"),
        transform(col("embedding"), x => x.cast("double")).as("v"))

  private def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

  private def norm(a: Column): Column =
    sqrt(aggregate(transform(a, x => x * x), lit(0.0), (acc, x) => acc + x))

  /** Cosine similarity, rounded to 4dp (the rounding absorbs any last-ulp
    * difference between engines' summation). */
  private def cosine(a: Column, b: Column): Column =
    round(dot(a, b) / (norm(a) * norm(b)), 4)

  /** The same cosine in DuckDB SQL (explicit formula, not
    * list_cosine_similarity, so both engines run the identical
    * double-precision expression tree). */
  private def cosineSql(a: String, b: String): String =
    s"""round(list_sum(list_transform(range(1, len($a)+1), i -> $a[i] * $b[i]))
       / (sqrt(list_sum(list_transform($a, x -> x*x)))
          * sqrt(list_sum(list_transform($b, x -> x*x)))), 4)"""

  // ---------------------------------------------------------------- d9
  /** Brute-force cosine top-10 for one probe vector (vec_id 0). The probe
    * is a one-row broadcast; the scan stays narrow and the top-k compiles
    * to per-partition heaps (TakeOrderedAndProject) — no global sort. */
  def d9CosineTopk(spark: SparkSession, dir: String): DataFrame = {
    val e = emb(spark, dir)
    val probe = e.filter(col("vec_id") === 0).select(col("v").as("qv"))
    e.crossJoin(broadcast(probe))
      .select(col("vec_id"), col("label"), cosine(col("v"), col("qv")).as("cos_sim"))
      .orderBy(col("cos_sim").desc, col("vec_id"))
      .limit(10)
  }

  val d9Oracle: String =
    s"""WITH e AS (SELECT vec_id, label, embedding::DOUBLE[] AS v FROM embeddings),
       probe AS (SELECT v AS qv FROM e WHERE vec_id = 0)
       SELECT vec_id, label, ${cosineSql("v", "qv")} AS cos_sim
       FROM e, probe
       ORDER BY cos_sim DESC, vec_id LIMIT 10"""

  // --------------------------------------------------------------- d10
  /** Sign-LSH bucketed ANN: bucket = sign bits of the first 8 dimensions
    * (8 axis-aligned hyperplanes → 256 buckets). Queries (vec_id < 8)
    * join candidates on bucket EQUALITY — a hash join keyed on the
    * bucket, never a cross product — then score and keep top-3 per query.
    *
    * At 100 TB both sides shuffle/broadcast on `bucket`: work per query
    * is |bucket| ≈ N/256, and recall is tunable by probing neighboring
    * buckets (Hamming-1 expansion) — the structure, not the constants, is
    * what survives the scale-up. */
  def d10AnnLsh(spark: SparkSession, dir: String): DataFrame = {
    val bucket = (1 to 8)
      .map(i => when(element_at(col("v"), i) > 0, lit(1 << (i - 1))).otherwise(lit(0)))
      .reduce(_ + _)
    val e = emb(spark, dir).withColumn("bucket", bucket)
    val qs = e.filter(col("vec_id") < 8)
      .select(col("vec_id").as("q_id"), col("v").as("qv"), col("bucket"))
    val w = Window.partitionBy("q_id").orderBy(col("cos_sim").desc, col("vec_id"))
    e.join(qs, Seq("bucket"))
      .filter(col("vec_id") =!= col("q_id"))
      .select(col("q_id"), col("vec_id"), cosine(col("v"), col("qv")).as("cos_sim"))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= 3)
      .select("q_id", "rk", "vec_id", "cos_sim")
      .orderBy("q_id", "rk")
  }

  val d10Oracle: String = {
    // sign(embedding[i]) is identical before/after the double cast, so the
    // bucket can be computed straight off the float column
    val bucketSql = (1 to 8)
      .map(i => s"CASE WHEN embedding[$i] > 0 THEN ${1 << (i - 1)} ELSE 0 END")
      .mkString(" + ")
    s"""WITH e AS (
         SELECT vec_id, embedding::DOUBLE[] AS v, $bucketSql AS bucket
         FROM embeddings),
       qs AS (SELECT vec_id AS q_id, v AS qv, bucket FROM e WHERE vec_id < 8),
       scored AS (
         SELECT qs.q_id, e.vec_id, ${cosineSql("e.v", "qs.qv")} AS cos_sim
         FROM e JOIN qs ON e.bucket = qs.bucket AND e.vec_id <> qs.q_id)
       SELECT q_id, rk, vec_id, cos_sim FROM (
         SELECT q_id, vec_id, cos_sim,
           row_number() OVER (PARTITION BY q_id ORDER BY cos_sim DESC, vec_id) AS rk
         FROM scored)
       WHERE rk <= 3 ORDER BY q_id, rk"""
  }

  // --------------------------------------------------------------- d12
  /** Embedding-cosine near-dup dedup: candidate pairs come from a
    * self-equi-join on the sign-LSH bucket (same 256-bucket scheme as
    * d10 — agreeing on all 8 sign bits strongly correlates with high
    * cosine), then pairs at or above the threshold are reported as
    * duplicates. The join is keyed on the bucket — worst case quadratic
    * only within a bucket, like d2's banding.
    *
    * Threshold note: the synthetic embeddings are near-orthogonal (max
    * pairwise cosine ≈0.51 at sf0.01, no cluster structure), so a
    * realistic 0.95 near-dup threshold would select nothing at test
    * scale; 0.4 exercises the full candidate→verify path. The threshold
    * is the operator's tuning parameter, not part of its structure. */
  def d12EmbeddingDedup(spark: SparkSession, dir: String): DataFrame = {
    val bucket = (1 to 8)
      .map(i => when(element_at(col("v"), i) > 0, lit(1 << (i - 1))).otherwise(lit(0)))
      .reduce(_ + _)
    val e = emb(spark, dir).withColumn("bucket", bucket)
      .select(col("vec_id"), col("v"), col("bucket"))
    val r = e.select(col("vec_id").as("vec_b"), col("v").as("vb"), col("bucket"))
    e.join(r, Seq("bucket"))
      .filter(col("vec_id") < col("vec_b"))
      .select(col("vec_id").as("vec_a"), col("vec_b"),
        cosine(col("v"), col("vb")).as("cos_sim"))
      .filter(col("cos_sim") >= 0.4)
      .orderBy("vec_a", "vec_b")
  }

  val d12Oracle: String = {
    val bucketSql = (1 to 8)
      .map(i => s"CASE WHEN embedding[$i] > 0 THEN ${1 << (i - 1)} ELSE 0 END")
      .mkString(" + ")
    s"""WITH e AS (
         SELECT vec_id, embedding::DOUBLE[] AS v, $bucketSql AS bucket
         FROM embeddings)
       SELECT vec_a, vec_b, cos_sim FROM (
         SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
           ${cosineSql("a.v", "b.v")} AS cos_sim
         FROM e a JOIN e b ON a.bucket = b.bucket AND a.vec_id < b.vec_id)
       WHERE cos_sim >= 0.4
       ORDER BY vec_a, vec_b"""
  }

  // --------------------------------------------------------------- d14
  /** IVF-style ANN: a coarse quantizer (K fixed centroids; here the
    * first 8 vectors stand in for trained k-means centers — training IS
    * this same assignment primitive iterated driver-side) assigns every
    * vector to its nearest cell, and each probe searches only its own
    * cell's inverted list via an equi-join on the cell id.
    *
    * Scale shape: the centroid table is O(K) and broadcast (the one
    * deliberate K-row nested-loop in this file — K is a constant, not
    * data-scaled); the corpus-sized side moves exactly once, shuffled on
    * its cell id. Recall is tuned by probing the nProbe nearest cells —
    * structure unchanged. */
  def d14AnnIvf(spark: SparkSession, dir: String): DataFrame = {
    val e = emb(spark, dir)
    val cents = e.filter(col("vec_id") < 8)
      .select(col("vec_id").as("cent_id"), col("v").as("cv"))
    val wAssign = Window.partitionBy("vec_id")
      .orderBy(col("sim").desc, col("cent_id"))
    val assigned = e.crossJoin(broadcast(cents))
      .withColumn("sim", cosine(col("v"), col("cv")))
      .withColumn("rk", row_number().over(wAssign))
      .filter(col("rk") === 1)
      .select(col("vec_id"), col("v"), col("cent_id").as("cell"))
    val probes = assigned.filter(col("vec_id") < 3)
      .select(col("vec_id").as("q_id"), col("v").as("qv"), col("cell"))
    val wTop = Window.partitionBy("q_id").orderBy(col("cos_sim").desc, col("vec_id"))
    assigned.join(probes, Seq("cell"))
      .filter(col("vec_id") =!= col("q_id"))
      .select(col("q_id"), col("vec_id"), cosine(col("v"), col("qv")).as("cos_sim"))
      .withColumn("rk", row_number().over(wTop))
      .filter(col("rk") <= 3)
      .select("q_id", "rk", "vec_id", "cos_sim")
      .orderBy("q_id", "rk")
  }

  val d14Oracle: String =
    s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
       cents AS (SELECT vec_id AS cent_id, v AS cv FROM e WHERE vec_id < 8),
       assigned AS (
         SELECT vec_id, v, cent_id AS cell FROM (
           SELECT e.vec_id, e.v, cents.cent_id,
             row_number() OVER (PARTITION BY e.vec_id
               ORDER BY ${cosineSql("e.v", "cents.cv")} DESC, cents.cent_id) AS rk
           FROM e, cents)
         WHERE rk = 1),
       probes AS (SELECT vec_id AS q_id, v AS qv, cell FROM assigned WHERE vec_id < 3),
       scored AS (
         SELECT q_id, a.vec_id, ${cosineSql("a.v", "probes.qv")} AS cos_sim
         FROM assigned a JOIN probes ON a.cell = probes.cell AND a.vec_id <> probes.q_id)
       SELECT q_id, rk, vec_id, cos_sim FROM (
         SELECT q_id, vec_id, cos_sim,
           row_number() OVER (PARTITION BY q_id ORDER BY cos_sim DESC, vec_id) AS rk
         FROM scored)
       WHERE rk <= 3 ORDER BY q_id, rk"""

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "d9_cosine_topk" -> (d9CosineTopk _),
    "d10_ann_lsh" -> (d10AnnLsh _),
    "d12_embedding_dedup" -> (d12EmbeddingDedup _),
    "d14_ann_ivf" -> (d14AnnIvf _)
  )

  val oracles: Map[String, String] = Map(
    "d9_cosine_topk" -> d9Oracle,
    "d10_ann_lsh" -> d10Oracle,
    "d12_embedding_dedup" -> d12Oracle,
    "d14_ann_ivf" -> d14Oracle
  )
}
