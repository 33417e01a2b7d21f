package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Near-duplicate detection over `documents` — the fuzzy half of the
  * dedup surface (BASELINE.json north-star; SURVEY.md §7.1 step 5).
  *
  * Scale design rule: NEVER all-pairs. Candidate generation is always a
  * bucketed equi-join (shuffle on a band/bucket hash), so the worst case
  * is quadratic only WITHIN a bucket, and the expected bucket size is
  * O(1) for non-duplicate content. Verified by `OpsPlanSpec`: the
  * physical plan contains no CartesianProduct/BroadcastNestedLoopJoin.
  *
  * Hashing uses md5 prefixes (see [[TextOps.hash60]]) rather than Spark's
  * murmur3 so the DuckDB oracle can reproduce values bit-for-bit.
  */
object FuzzyDedup {

  private def docs(spark: SparkSession, dir: String): DataFrame =
    Tables.load(spark, dir, "documents")

  /** MinHash parameters: 8 signatures → 4 bands × 2 rows. With the
    * band-collision probability 1-(1-j^2)^4, pairs at Jaccard 0.9 are
    * caught with p≈0.995 while 0.2-similar pairs collide with p≈0.16 —
    * and every candidate is then exactly verified, so false positives
    * only cost compute, never correctness. */
  private val NumHashes = 8
  private val BandSize = 2
  private val NumBands = NumHashes / BandSize

  /** The 8 signatures come from ONE md5 per shingle plus a linear
    * permutation family h_s = (A_s·h + B_s) mod M — 8× less hashing than
    * seed-concatenated md5s (measured: the md5 was the whole cost of the
    * stage). M = 2^31-1 keeps every product < 2^62 (no overflow in either
    * engine); constants are fixed odd multipliers so the oracle
    * reproduces values exactly. */
  private val M = 2147483647L
  private val PermA = Seq(1103515245L, 1140671485L, 214013L, 69069L,
    1664525L, 22695477L, 134775813L, 1099087573L)
  private val PermB = Seq(12345L, 12820163L, 2531011L, 362437L,
    1013904223L, 1L, 1L, 12345L)

  /** Rolling-hash constants for combining token hashes into 3-word
    * shingle hashes (order-sensitive polynomial; all intermediates stay
    * under 2^62). */
  private val K1 = 1000003L
  private val K2 = 999983L

  /** 3-word shingle HASHES of the text. Shingle strings are never
    * materialized (measured: building ~n_tokens concat'd strings per doc
    * was 8× the cost of everything else in this pipeline) — instead each
    * token is hashed once (md5, engine-reproducible) and consecutive
    * triples combine by rolling polynomial:
    * h = ((t0·K1 + t1) mod M)·K2 + t2 mod M. Documents with fewer than 3
    * tokens fall back to one whole-text hash so they still dedup exactly.
    * Downstream (minhash signatures, Jaccard verify) operates on these
    * 31-bit shingle hashes; deterministic and identical in the oracle. */
  /** doc_id + shingle-hash array. Token hashes are bound to a named
    * column (`th`) in their own projection so each is computed once per
    * row — inlining the transform into every `element_at` would re-hash
    * the whole token list per shingle. */
  private def shingled(spark: SparkSession, dir: String): DataFrame = {
    val th = col("th")
    docs(spark, dir)
      .select(col("doc_id"), col("text"),
        transform(TextOps.tokens(col("text")), t => TextOps.hash60(t) % M).as("th"))
      .select(col("doc_id"),
        when(size(th) >= 3,
          transform(sequence(lit(1), size(th) - 2),
            i => (((element_at(th, i) * K1 + element_at(th, i + 1)) % M) * K2 +
              element_at(th, i + 2)) % M))
          .otherwise(array(TextOps.hash60(col("text")) % M)).as("shingles"))
  }

  // ---------------------------------------------------------------- d2
  /** MinHash + LSH banding dedup:
    * shingle → 8 min-hashes → 4 band hashes → explode → equi-join on
    * (band, band_hash) → candidate pairs → exact shingle-Jaccard verify.
    *
    * At 100 TB: the only shuffles are (a) the band-hash exchange, whose
    * payload is (doc_id, 32-byte hash) — not document text — and (b) the
    * verify join, which touches only the candidate pairs (a vanishing
    * fraction of the corpus). Duplicate-heavy buckets are exactly the
    * pairs we must examine, so there is no wasted skew. For repeated runs
    * the shingle stage would be checkpointed; here it is recomputed (two
    * scans of a columnar source beat materializing shingle arrays). */
  def d2MinhashDedup(spark: SparkSession, dir: String): DataFrame = {
    val sh = shingled(spark, dir)

    val mhCols = (0 until NumHashes).map { s =>
      array_min(transform(col("shingles"),
        h => (h * PermA(s) + PermB(s)) % M)).as(s"mh$s")
    }
    val withMh = sh.select(col("doc_id") +: mhCols: _*)

    val bandStructs = (0 until NumBands).map { b =>
      struct(
        lit(b).as("band"),
        md5(concat_ws(",",
          col(s"mh${BandSize * b}").cast("string"),
          col(s"mh${BandSize * b + 1}").cast("string"))).as("bh"))
    }
    val bands = withMh
      .select(col("doc_id"), explode(array(bandStructs: _*)).as("e"))
      .select(col("doc_id"), col("e.band").as("band"), col("e.bh").as("bh"))

    val pairs = bands.as("l")
      .join(bands.as("r"),
        col("l.band") === col("r.band") && col("l.bh") === col("r.bh") &&
          col("l.doc_id") < col("r.doc_id"))
      .select(col("l.doc_id").as("doc_a"), col("r.doc_id").as("doc_b"))
      .distinct()

    val sets = sh.select(col("doc_id"), array_distinct(col("shingles")).as("s"))
    pairs
      .join(sets.select(col("doc_id").as("doc_a"), col("s").as("sa")), "doc_a")
      .join(sets.select(col("doc_id").as("doc_b"), col("s").as("sb")), "doc_b")
      .select(col("doc_a"), col("doc_b"),
        round(size(array_intersect(col("sa"), col("sb"))).cast("double") /
          size(array_union(col("sa"), col("sb"))), 4).as("jaccard"))
      .filter(col("jaccard") >= 0.5)
      .orderBy("doc_a", "doc_b")
  }

  /** The same pipeline in DuckDB SQL (band hashes written out: 4 bands of
    * 2 md5-minhashes each). */
  val d2Oracle: String = {
    val mhDefs = (0 until NumHashes).map(s =>
      s"list_min(list_transform(shingles, h -> (h * ${PermA(s)} + ${PermB(s)}) % $M)) AS mh$s")
      .mkString(",\n         ")
    val bandCases = (0 until NumBands).map(b =>
      s"WHEN $b THEN md5(mh${2 * b}::VARCHAR||','||mh${2 * b + 1}::VARCHAR)")
      .mkString(" ")
    s"""WITH th AS (
         SELECT doc_id, text,
           list_transform(regexp_extract_all(text, '\\S+'),
                          t -> ('0x'||substr(md5(t),1,15))::BIGINT % $M) AS th
         FROM documents),
       sh AS (
         SELECT doc_id,
           CASE WHEN len(th) >= 3
             THEN list_transform(range(1, len(th)-1),
                    i -> (((th[i] * $K1 + th[i+1]) % $M) * $K2 + th[i+2]) % $M)
             ELSE [('0x'||substr(md5(text),1,15))::BIGINT % $M] END AS shingles
         FROM th),
       mh AS (
         SELECT doc_id,
         $mhDefs
         FROM sh),
       bands AS (
         SELECT doc_id, b,
           CASE b $bandCases END AS bh
         FROM mh, (SELECT unnest([0,1,2,3]) AS b)),
       pairs AS (
         SELECT DISTINCT l.doc_id AS doc_a, r.doc_id AS doc_b
         FROM bands l JOIN bands r
           ON l.b = r.b AND l.bh = r.bh AND l.doc_id < r.doc_id)
       SELECT doc_a, doc_b, jaccard FROM (
         SELECT doc_a, doc_b,
           round(len(list_intersect(list_distinct(a.shingles), list_distinct(b.shingles))) * 1.0
                 / len(list_distinct(list_concat(a.shingles, b.shingles))), 4) AS jaccard
         FROM pairs JOIN sh a ON a.doc_id = doc_a JOIN sh b ON b.doc_id = doc_b)
       WHERE jaccard >= 0.5
       ORDER BY doc_a, doc_b"""
  }

  // ---------------------------------------------------------------- d3
  /** 16-bit SimHash per document: each token's 60-bit hash votes ±1 on
    * every bit; a bit is set when set-votes are the strict majority.
    * Pure map stage (token hashes computed once per doc, then 16
    * codegen'd bit-count filters); near-dup docs land on equal or
    * 1-bit-distant hashes, making simhash the cheap grouping key for a
    * banded dedup join. */
  def d3Simhash(spark: SparkSession, dir: String): DataFrame = {
    val hs = transform(TextOps.tokens(col("text")), t => TextOps.hash60(t))
    val bits = (0 until 16).map { i =>
      when(size(filter(col("hs"),
        h => shiftright(h, i).bitwiseAND(lit(1L)) === 1L)) * 2 > size(col("hs")),
        lit(1 << i)).otherwise(lit(0))
    }
    docs(spark, dir)
      .withColumn("hs", hs)
      .select(col("doc_id"), bits.reduce(_ + _).as("simhash"))
      .orderBy("doc_id")
  }

  val d3Oracle: String = {
    val terms = (0 until 16).map(i =>
      s"CASE WHEN 2 * len(list_filter(h, x -> ((x >> $i) & 1) = 1)) > len(h) THEN ${1 << i} ELSE 0 END")
      .mkString("\n         + ")
    s"""WITH hs AS (
         SELECT doc_id,
           list_transform(regexp_extract_all(text, '\\S+'),
                          t -> ('0x'||substr(md5(t),1,15))::BIGINT) AS h
         FROM documents)
       SELECT doc_id,
         $terms AS simhash
       FROM hs ORDER BY doc_id"""
  }

  // ---------------------------------------------------------------- d4
  /** Character-3-gram Jaccard similarity of every document against a
    * fixed probe document (doc_id 0) — the "find near-dups of this item"
    * scan. The probe's gram set is a one-row broadcast (deliberate: a
    * scalar query side), so the pass stays a narrow map over the corpus;
    * for many probes at once, use the d2 banding shape instead.
    *
    * Grams are HASHED, never materialized as strings (same measured 3.5×
    * win as the d2 shingles): char codes once per doc, consecutive
    * triples combined by rolling polynomial into 31-bit gram hashes;
    * set ops then compare longs, not strings. */
  def d4NgramJaccard(spark: SparkSession, dir: String): DataFrame = {
    val cc = col("cc")
    val gramHashes =
      when(size(cc) >= 3,
        transform(sequence(lit(1), size(cc) - 2),
          i => (((element_at(cc, i) * 131L + element_at(cc, i + 1)) % M) * 131L +
            element_at(cc, i + 2)) % M))
        .otherwise(array(TextOps.hash60(col("tl")) % M))
    val g = docs(spark, dir)
      .withColumn("tl", lower(col("text")))
      .select(col("doc_id"), col("tl"),
        transform(split(col("tl"), ""), c => ascii(c).cast("long")).as("cc"))
      .select(col("doc_id"), array_distinct(gramHashes).as("g"))
    val probe = g.filter(col("doc_id") === 0).select(col("g").as("qg"))
    g.crossJoin(broadcast(probe))
      .select(col("doc_id"),
        round(size(array_intersect(col("g"), col("qg"))).cast("double") /
          size(array_union(col("g"), col("qg"))), 4).as("jaccard"))
      .orderBy(col("jaccard").desc, col("doc_id"))
      .limit(20)
  }

  val d4Oracle: String =
    s"""WITH cc AS (
         SELECT doc_id, lower(text) AS tl,
           list_transform(range(1, length(lower(text)) + 1),
                          i -> ascii(lower(text)[i:i])::BIGINT) AS cc
         FROM documents),
       g AS (
         SELECT doc_id,
           list_distinct(CASE WHEN len(cc) >= 3
             THEN list_transform(range(1, len(cc) - 1),
                    i -> (((cc[i] * 131 + cc[i+1]) % $M) * 131 + cc[i+2]) % $M)
             ELSE [('0x'||substr(md5(tl),1,15))::BIGINT % $M] END) AS g
         FROM cc),
       probe AS (SELECT g AS qg FROM g WHERE doc_id = 0)
       SELECT doc_id,
         round(len(list_intersect(g, qg)) * 1.0
               / len(list_distinct(list_concat(g, qg))), 4) AS jaccard
       FROM g, probe
       ORDER BY jaccard DESC, doc_id LIMIT 20"""

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "d2_minhash_dedup" -> (d2MinhashDedup _),
    "d3_simhash" -> (d3Simhash _),
    "d4_ngram_jaccard" -> (d4NgramJaccard _)
  )

  val oracles: Map[String, String] = Map(
    "d2_minhash_dedup" -> d2Oracle,
    "d3_simhash" -> d3Oracle,
    "d4_ngram_jaccard" -> d4Oracle
  )
}
