package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.Tables
import graft.functions.GraftFunctions

/** The engine's pure-SQL surface: pipelines expressed entirely as SQL
  * text over the registered `graft_*` functions
  * ([[graft.functions.GraftFunctions]]) and the table catalog as temp
  * views — the path a JDBC/Thrift client or a saved SQL pipeline runs,
  * with no Column API anywhere.
  *
  * Each gated query here re-expresses an already-gated Column-API
  * operator and is pinned to THAT operator's DuckDB oracle (precedent:
  * d43 runs against d17's oracle): the gate then proves the SQL text,
  * the analysis-time function resolution, and the Column API all
  * produce bit-identical results — i.e. the SQL surface is the same
  * engine, not a parallel implementation. Scale shape is inherited
  * from the mirrored operator (identical physical plans, pinned by
  * `ExtensionsSpec`), so per-query scale notes live with the original.
  */
object SqlSurface {

  /** Last directory registered as temp views, per session. Re-running
    * `Tables.registerAll` on every query re-reads all ten parquet
    * footers driver-side (~0.5 s — measured as 2–5× on these
    * sub-second queries in the bench suite), so registration is
    * memoized and repeated only when the target directory changes
    * (the verify/test harnesses drive several scale factors through
    * one session). */
  private val registeredDir: java.util.Map[SparkSession, String] =
    java.util.Collections.synchronizedMap(
      // weak keys: don't pin dead sessions in a long-running service
      new java.util.WeakHashMap[SparkSession, String]())

  private def run(spark: SparkSession, dir: String, query: String): DataFrame = {
    GraftFunctions.register(spark) // idempotent, registry-map puts only
    if (registeredDir.put(spark, dir) != dir) Tables.registerAll(spark, dir)
    spark.sql(query)
  }

  // --------------------------------------------------------------- d46
  /** d3's simhash fingerprint pipeline as one SQL statement: whitespace
    * tokens → native 60-bit token hashes → native 48-bit simhash. Same
    * plan as d3 (narrow map over the documents scan, both expressions
    * inside whole-stage codegen); gated against d3's oracle. */
  def d46SqlSimhash(spark: SparkSession, dir: String): DataFrame =
    run(spark, dir,
      """SELECT doc_id,
           graft_simhash48(graft_token_hashes(
             regexp_extract_all(text, '\\S+', 0))) AS simhash
         FROM documents
         ORDER BY doc_id""")

  val d46Oracle: String = FuzzyDedup.d3Oracle

  // --------------------------------------------------------------- d47
  /** d9's brute-force cosine top-10 as one SQL statement: the one-row
    * probe is broadcast (hinted, same as d9's `broadcast(probe)`), the
    * store scan stays narrow, the fused-loop cosine runs per row inside
    * codegen, and ORDER BY + LIMIT compile to per-partition top-k heaps
    * (TakeOrderedAndProject — no global sort). The float→double
    * widening is the caller-owned array CAST on the scan, exactly where
    * the Column API puts it; gated against d9's oracle. */
  def d47SqlCosine(spark: SparkSession, dir: String): DataFrame =
    run(spark, dir,
      """WITH e AS (SELECT vec_id, label,
                      CAST(embedding AS ARRAY<DOUBLE>) AS v
                    FROM embeddings),
           probe AS (SELECT v AS qv FROM e WHERE vec_id = 0)
         SELECT /*+ BROADCAST(probe) */
           vec_id, label, round(graft_cosine_sim(v, qv), 4) AS cos_sim
         FROM e CROSS JOIN probe
         ORDER BY cos_sim DESC, vec_id
         LIMIT 10""")

  val d47Oracle: String = Similarity.d9Oracle

  // --------------------------------------------------------------- d48
  /** d20's intra-document repetition ratio as one SQL statement:
    * whitespace tokens → native rolling-poly 3-shingle hashes (the
    * whole-text hash mod the shingle modulus as the short-doc
    * fallback, exactly d20's fallback expression) → duplicate-shingle
    * fraction. Chosen as the shingle-family SQL gate BECAUSE it is a
    * pure narrow map (one scan, no reuse): d17/d40's shape depends on
    * a `localCheckpoint()` of the shingle projection, which SQL text
    * cannot express — a SQL client wanting decontamination calls the
    * library entry point (or accepts the re-scan); pinning d20 keeps
    * the gated SQL surface to plans that are AS GOOD as their Column
    * twins. Gated against d20's oracle. */
  def d48SqlRepetition(spark: SparkSession, dir: String): DataFrame =
    run(spark, dir,
      s"""WITH sh AS (
           SELECT doc_id,
             graft_shingle_hashes(
               regexp_extract_all(text, '\\\\S+', 0),
               CAST(conv(substring(md5(text), 1, 15), 16, 10) AS BIGINT)
                 % ${graft.functions.ShingleHashes.M}) AS s
           FROM documents)
         SELECT doc_id,
           size(s) AS n_shingles,
           round(1.0 - CAST(size(array_distinct(s)) AS DOUBLE) / size(s), 4)
             AS rep_ratio,
           CASE WHEN rep_ratio > 0.2 THEN 1 ELSE 0 END AS flagged
         FROM sh
         ORDER BY doc_id""")

  val d48Oracle: String = FuzzyDedup.d20Oracle

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "d46_sql_simhash" -> (d46SqlSimhash _),
    "d47_sql_cosine" -> (d47SqlCosine _),
    "d48_sql_repetition" -> (d48SqlRepetition _))

  val oracles: Map[String, String] = Map(
    "d46_sql_simhash" -> d46Oracle,
    "d47_sql_cosine" -> d47Oracle,
    "d48_sql_repetition" -> d48Oracle)
}
