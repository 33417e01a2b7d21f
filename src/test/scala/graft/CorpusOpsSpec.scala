package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.CorpusOps

/** Corpus-prep operators (d23–d26): semantics on sf0.001 plus the
  * planted-PII cases the all-clean fixture corpus cannot exercise. Value
  * parity with DuckDB is the driver gate; these pin behavior. */
class CorpusOpsSpec extends AnyFunSuite with SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("chunking reconstructs every document (stride-overlap contract)") {
    import spark.implicits._
    val chunks = CorpusOps.d23Chunking(spark, dir).collect()
      .groupBy(_.getLong(0))
    val docs = Tables.load(spark, dir, "documents")
      .select($"doc_id", $"text").collect()
    assert(chunks.size == docs.length, "every doc must produce chunks")
    docs.foreach { r =>
      val toks = r.getString(1).split("\\s+").filter(_.nonEmpty)
      val cs = chunks(r.getLong(0)).sortBy(_.getLong(1))
      // first 24 (stride) tokens of each chunk, then the final chunk's
      // tail, concatenate back to the original token stream
      val rebuilt = cs.flatMap { c =>
        val t = c.getString(3).split(" ").filter(_.nonEmpty)
        if (c eq cs.last) t else t.take(24)
      }
      assert(rebuilt.toSeq == toks.toSeq, s"doc ${r.getLong(0)} not rebuilt")
      // recorded lengths are honest; every non-last chunk is exactly
      // full; each successor starts with its predecessor's 8-token
      // overlap tail AND contributes new tokens beyond it (no chunk is
      // ever fully contained in its predecessor)
      cs.foreach { c =>
        assert(c.getInt(2) <= 32)
        assert(c.getString(3).split(" ").count(_.nonEmpty) == c.getInt(2))
      }
      cs.init.foreach(c => assert(c.getInt(2) == 32,
        s"non-last chunk must be full, got ${c.getInt(2)}"))
      cs.init.zip(cs.tail).foreach { case (a, b) =>
        val ov = a.getString(3).split(" ").drop(24)
        assert(b.getString(3).split(" ").take(8).toSeq == ov.toSeq)
        assert(b.getInt(2) > 8, "a chunk must add tokens past the overlap")
      }
    }
  }

  test("chunking contract holds for EVERY doc length 0..200") {
    import spark.implicits._
    // one synthetic doc per length; tokens are position-labeled so any
    // misalignment is visible
    val docs = (0 to 200)
      .map(n => (n.toLong, (0 until n).map(i => s"t$i").mkString(" ")))
      .toDF("doc_id", "text")
    val byDoc = CorpusOps.chunks(docs).collect()
      .groupBy(_.getLong(0)).view.mapValues(_.sortBy(_.getLong(1))).toMap
    (0 to 200).foreach { n =>
      val cs = byDoc(n.toLong)
      val toks = (0 until n).map(i => s"t$i")
      // lossless reconstruction: stride prefix of each chunk + last tail
      val rebuilt = cs.flatMap { c =>
        val t = c.getString(3).split(" ").filter(_.nonEmpty)
        if (c eq cs.last) t else t.take(24)
      }
      assert(rebuilt.toSeq == toks, s"n=$n not rebuilt")
      // expected chunk count: 1 + ceil(max(n-32,0)/24)
      val want = 1 + math.ceil(math.max(n - 32, 0) / 24.0).toInt
      assert(cs.length == want, s"n=$n chunks=${cs.length} want=$want")
      // non-last chunks full; every later chunk adds new tokens
      cs.init.foreach(c => assert(c.getInt(2) == 32, s"n=$n partial mid-chunk"))
      cs.tail.foreach(c => assert(c.getInt(2) > 8, s"n=$n contained chunk"))
    }
  }

  test("tfidf: rank-1 term has max weight; common-to-all terms weigh 0") {
    val rows = CorpusOps.d24Tfidf(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getLong(0)).foreach { case (_, rs) =>
      val byRank = rs.sortBy(_.getInt(1)).map(_.getDouble(3))
      assert(byRank.zip(byRank.tail).forall { case (a, b) => a >= b })
    }
    // a term present in EVERY doc has idf = ln(1) = 0 → never a top term
    // unless everything ties at 0; on this fixture top-1 weights are > 0
    assert(rows.filter(_.getInt(1) == 1).forall(_.getDouble(3) > 0))
  }

  test("surprisal: a rare-token doc scores above a common-token doc") {
    import spark.implicits._
    // 99 docs of a common token, one doc of a rare token
    val d = ((0L until 99L).map(i => (i, "common common common")) :+
      (99L, "rarity rarity rarity")).toDF("doc_id", "text")
    val tok = d.select(col("doc_id"),
      explode(graft.ops.TextOps.tokens(col("text"))).as("term"))
    val freq = tok.groupBy("term").agg(count(lit(1)).as("cnt"))
    val total = freq.agg(sum("cnt").as("total"))
    val out = tok.join(freq, "term").crossJoin(broadcast(total))
      .groupBy("doc_id")
      .agg(round(avg(-log(col("cnt").cast("double") / col("total"))), 4)
        .as("surprisal"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(out(99L) > out(0L))
  }

  test("pii: planted emails/phones/ssns are counted and redacted") {
    import spark.implicits._
    val d = Seq(
      ("s1", "contact john.doe+x@corp-mail.example.com today"),
      ("s1", "call 555-867-5309 or 555.867.5309 now"),
      ("s2", "ssn 123-45-6789 on file"),
      ("s2", "clean document with no pii at all")
    ).toDF("source", "text")
    val stats = CorpusOps.piiStats(d).collect()
      .map(r => r.getString(0) -> (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))
      .toMap
    assert(stats("s1") == ((1L, 2L, 0L, 2L)), s"got ${stats("s1")}")
    assert(stats("s2") == ((0L, 0L, 1L, 1L)), s"got ${stats("s2")}")

    val red = d.select(CorpusOps.piiRedact(col("text")).as("t"))
      .collect().map(_.getString(0))
    assert(red.exists(_ == "contact [EMAIL] today"))
    assert(red.exists(_ == "call [PHONE] or [PHONE] now"))
    assert(red.exists(_ == "ssn [SSN] on file"))
    assert(red.exists(_ == "clean document with no pii at all"))
    // a phone-shaped span must never be consumed by the SSN pattern
    // (the exact-match asserts above already pin "[PHONE] or [PHONE]",
    // so any SSN mis-redaction of a phone fails there)
    assert(!red.exists(r => r.contains("555") && r.contains("[SSN]")))
  }

  test("pii counts mirror sequential redaction on overlapping spans") {
    import spark.implicits._
    // SSN-shaped local part inside an email: redaction emits one
    // [EMAIL]; the audit must NOT also claim an SSN was found
    val d = Seq(("s", "reach 123-45-6789@corp.example.com now"))
      .toDF("source", "text")
    val r = CorpusOps.piiStats(d).collect().head
    assert((r.getLong(2), r.getLong(3), r.getLong(4)) == ((1L, 0L, 0L)),
      s"email only, got ${(r.getLong(2), r.getLong(3), r.getLong(4))}")
    val red = d.select(CorpusOps.piiRedact(col("text"))).head.getString(0)
    assert(red == "reach [EMAIL] now")
  }

  test("cardinality counts zero-token docs (explode_outer contract)") {
    import spark.implicits._
    val d = Seq(
      (1L, "s", "a b a"),
      (2L, "s", ""), // zero tokens: counted as a doc, adds no tokens
      (3L, "s", "b c")
    ).toDF("doc_id", "source", "text")
    val r = CorpusOps.cardinality(d).collect().head
    assert(r.getLong(1) == 3, "n_docs must include the empty doc")
    assert(r.getLong(2) == 5, "n_tokens must not count the null row")
    assert(r.getLong(3) == 3, "distinct tokens a,b,c")
    assert(r.getLong(4) == 3, "three distinct texts")
  }

  test("cardinality sketches land within 5% of exact counts") {
    val exact = CorpusOps.d28Cardinality(spark, dir).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(3), r.getLong(4)))
      .toMap
    val approx = CorpusOps
      .cardinalityApprox(Tables.load(spark, dir, "documents")).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(3), r.getLong(4)))
      .toMap
    assert(exact.keySet == approx.keySet)
    def close(a: Long, b: Long): Boolean =
      math.abs(a - b) <= math.max(1L, (0.05 * b).toLong)
    exact.foreach { case (src, (ed, et, eh)) =>
      val (ad, at, ah) = approx(src)
      assert(close(ad, ed) && close(at, et) && close(ah, eh),
        s"$src sketch drifted: approx=($ad,$at,$ah) exact=($ed,$et,$eh)")
    }
  }

  test("fixture corpus is PII-free (gate pins the zero-false-positive side)") {
    val rows = CorpusOps.d26PiiScrub(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(2) == 0 && r.getLong(3) == 0 && r.getLong(4) == 0)
    }
  }

  test("train split partitions the corpus 90/5/5 and is content-stable") {
    import spark.implicits._
    val rows = CorpusOps.d33TrainSplit(spark, dir).collect()
    val bySplit = rows.groupBy(_.getString(1))
      .view.mapValues(_.map(_.getLong(2)).sum).toMap
    val total = bySplit.values.sum
    val nDocs = Tables.load(spark, dir, "documents").count()
    assert(total == nDocs, "every doc lands in exactly one split")
    assert(bySplit.keySet == Set("train", "val", "test"))
    // binomial tolerance at 500 docs: 90% ± ~4σ
    assert(bySplit("train") >= (nDocs * 0.84).toLong &&
      bySplit("train") <= (nDocs * 0.96).toLong,
      s"train fraction drifted: $bySplit")
    // content stability: assignment depends only on doc_id, so a
    // truncated corpus (simulating the pre-append state of an
    // incremental pipeline) assigns every surviving doc identically
    val full = Tables.load(spark, dir, "documents")
      .select($"doc_id", CorpusOps.splitOf($"doc_id").as("s")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val half = Tables.load(spark, dir, "documents")
      .filter($"doc_id" % 2 === 0)
      .select($"doc_id", CorpusOps.splitOf($"doc_id").as("s")).collect()
    half.foreach(r => assert(full(r.getLong(0)) == r.getString(1)))
  }

  test("split salt decorrelates split from the sampling hash") {
    import spark.implicits._
    // d18 samples on hash60(doc_id) % 100 < rate; the split hashes a
    // SALTED id. If the salt were dropped, every doc with bucket < 20
    // (a 20%-rate stratum's kept set) would land in 'train' en masse —
    // the kept set would never see 'test'. With the salt, the kept set's
    // split fractions must stay ~90/5/5.
    val ids = (0L until 10000L).toDF("doc_id")
    val sampled = ids.filter(
      ops.TextOps.hash60($"doc_id".cast("string")) % 100 < 20)
    val bySplit = sampled
      .select(CorpusOps.splitOf($"doc_id").as("s"))
      .groupBy("s").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val n = bySplit.values.sum.toDouble
    assert(bySplit.keySet == Set("train", "val", "test"),
      s"sampled stratum must still contain all splits: $bySplit")
    val trainFrac = bySplit("train") / n
    assert(trainFrac > 0.85 && trainFrac < 0.95,
      s"split fractions skewed within the sampled stratum: $bySplit")
    // and at 10k ids the full-population proportions are tight
    val full = ids.select(CorpusOps.splitOf($"doc_id").as("s"))
      .groupBy("s").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(math.abs(full("train") - 9000L) < 300, s"train drifted: $full")
    assert(math.abs(full("val") - 500L) < 150 &&
      math.abs(full("test") - 500L) < 150, s"val/test drifted: $full")
  }

  test("boilerplate: a phrase stamped across docs is flagged; unique text is not") {
    import spark.implicits._
    // 10 docs share a stamped footer phrase; 5 docs are fully unique.
    // Fillers are position-labeled so no cross-doc shingle repeats by
    // accident.
    val stamped = (0 until 10).map(i =>
      (i.toLong, s"u${i}a u${i}b u${i}c all rights reserved acme u${i}d u${i}e u${i}f"))
    val unique = (10 until 15).map(i =>
      (i.toLong, s"u${i}a u${i}b u${i}c u${i}d u${i}e u${i}f u${i}g"))
    val d = (stamped ++ unique).toDF("doc_id", "text")
    val rows = CorpusOps.boilerplate(d).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    (0 until 10).foreach { i =>
      val (n, b) = rows(i.toLong)
      // "all rights reserved", "rights reserved acme" appear in 10 docs
      // (>= BoilerMinDf); the boundary shingles mixing unique fillers
      // with the stamp do not
      assert(b >= 2, s"stamped doc $i: $b of $n shingles flagged")
    }
    (10 until 15).foreach { i =>
      val (_, b) = rows(i.toLong)
      assert(b == 0, s"unique doc $i wrongly flagged")
    }
  }

  test("boilerplate on the fixture corpus: ratios well-formed, signal nonzero") {
    val rows = CorpusOps.d34Boilerplate(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (n, b, ratio) = (r.getLong(1), r.getLong(2), r.getDouble(3))
      assert(n >= 1 && b >= 0 && b <= n)
      assert(ratio >= 0.0 && ratio <= 1.0)
    }
    // sf0.001 has shingles with df up to 9 (>= BoilerMinDf), so the
    // corpus-wide filter must fire somewhere
    assert(rows.exists(_.getLong(2) > 0), "no boilerplate detected at all")
  }

  test("source overlap: shared phrases attribute pairs; ubiquitous content is excluded") {
    import spark.implicits._
    // srcA and srcB share a 5-token phrase (3 shingles); srcC is unique;
    // a second phrase is stamped into ALL six sources (> MaxOverlapSources)
    // and must not contribute to any pair
    val ubiq = "every site has this exact footer line"
    val d = Seq(
      ("srcA", s"a1 a2 copied paragraph shared verbatim here a3 a4. $ubiq"),
      ("srcB", s"b1 b2 copied paragraph shared verbatim here b3 b4. $ubiq"),
      ("srcC", s"c1 c2 c3 c4 c5 c6 c7 c8. $ubiq"),
      ("srcD", s"d1 d2 d3 d4 d5 d6 d7 d8. $ubiq"),
      ("srcE", s"e1 e2 e3 e4 e5 e6 e7 e8. $ubiq"),
      ("srcF", s"f1 f2 f3 f4 f5 f6 f7 f8. $ubiq")
    ).toDF("source", "text")
    val rows = CorpusOps.sourceOverlap(d).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(rows.contains(("srcA", "srcB")), "shared phrase not attributed")
    // "copied paragraph shared", "paragraph shared verbatim",
    // "shared verbatim here" — 3 interior shingles survive the boundary
    assert(rows(("srcA", "srcB")) >= 3)
    // the ubiquitous footer is in 6 > 4 sources: no other pair exists
    assert(rows.keySet == Set(("srcA", "srcB")),
      s"ubiquitous content leaked into pairs: ${rows.keySet}")
  }

  test("bm25: higher tf ranks higher; shorter doc beats longer at equal tf") {
    import spark.implicits._
    // same length, tf 3 vs 1 → doc 1 wins; same tf, 4 vs 12 tokens →
    // shorter doc 3 beats longer doc 4 (length normalization); doc 5
    // has no query term and must not appear
    val d = Seq(
      (1L, "column column column f1 f2 f3"),
      (2L, "column g1 g2 g3 g4 g5"),
      (3L, "scan h1 h2 h3"),
      (4L, "scan i1 i2 i3 i4 i5 i6 i7 i8 i9 i10 i11"),
      (5L, "j1 j2 j3 j4 j5 j6")
    ).toDF("doc_id", "text")
    val s = CorpusOps.bm25(d, CorpusOps.Bm25Query).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(!s.contains(5L), "doc without query terms must not score")
    assert(s(1L) > s(2L), s"tf=3 must outrank tf=1 at equal length: $s")
    assert(s(3L) > s(4L), s"shorter doc must outrank longer at equal tf: $s")
    // the gate pins exact values; the ordering contract is pinned here
    val fixture = CorpusOps.d37Bm25(spark, dir).collect()
    assert(fixture.length == 20 && fixture.head.getDouble(1) > 0.0)
    fixture.map(r => (r.getDouble(1), r.getLong(0))).sliding(2).foreach {
      case Array((s1, d1), (s2, d2)) =>
        assert(s1 > s2 || (s1 == s2 && d1 < d2), "top-k not bm25-ordered")
    }
  }

  test("boilerplate and overlap survive sub-3-token docs (whole-text fallback)") {
    import spark.implicits._
    // <3 tokens → ShingleHashes falls back to one whole-text hash; two
    // sources sharing the identical short text must still pair up, and
    // the boilerplate scorer must not divide by zero anywhere
    val d = Seq(
      (1L, "srcA", "same short"),
      (2L, "srcB", "same short"),
      (3L, "srcC", ""),
      (4L, "srcD", "one"),
      (5L, "srcE", "w1 w2 w3 w4")
    ).toDF("doc_id", "source", "text")
    val b = CorpusOps.boilerplate(d.select("doc_id", "text")).collect()
    assert(b.length == 5)
    b.foreach(r => assert(r.getLong(1) >= 1 && !r.isNullAt(3)))
    val ov = CorpusOps.sourceOverlap(d.select("source", "text")).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(ov.keySet == Set(("srcA", "srcB")),
      s"identical short texts must pair via the fallback hash: ${ov.keySet}")
  }

  test("mixture token yield: TOTAL row is the rollup; kept never exceeds corpus") {
    val rows = ops.TextOps.d39MixtureTokens(spark, dir).collect()
    val (total, srcs) = rows.partition(_.getString(0) == "TOTAL")
    assert(total.length == 1 && srcs.nonEmpty)
    val t = total.head
    assert(t.getLong(1) == srcs.map(_.getLong(1)).sum)
    assert(t.getLong(2) == srcs.map(_.getLong(2)).sum)
    assert(t.getLong(3) == srcs.map(_.getLong(3)).sum)
    rows.foreach(r => assert(r.getLong(3) <= r.getLong(2),
      s"${r.getString(0)} keeps more tokens than it has"))
    // d18's doc keep decisions and d39's token yield must agree: a
    // source keeping 0 docs keeps 0 tokens
    val docKept = ops.TextOps.d18SampleMix(spark, dir).collect()
      .map(r => r.getString(0) -> r.getLong(2)).toMap
    srcs.foreach(r => assert((docKept(r.getString(0)) == 0L) ==
      (r.getLong(3) == 0L), s"${r.getString(0)} doc/token yield disagree"))
  }

  test("bigram surprisal: scrambled word order scores above common order") {
    import spark.implicits._
    // ten docs establish "x y" as the overwhelmingly common transition;
    // doc 100 follows it, doc 101 uses the SAME unigrams in reversed
    // order ("y x" transitions are rare) — a unigram LM cannot separate
    // them, the conditional bigram LM must
    val background = (0L until 10L).map(i => (i, "x y x y x y x y"))
    val common = (100L, "x y x y x y x y")
    val scrambled = (101L, "y x y x y x y x")
    val d = (background :+ common :+ scrambled).toDF("doc_id", "text")
    val s = CorpusOps.bigramSurprisal(d).collect()
      .map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(s(101L) > s(100L),
      s"scrambled order must surprise the bigram LM: $s")
    // a one-token doc keeps its row with zero bigrams
    val tiny = CorpusOps.bigramSurprisal(
      Seq((1L, "solo"), (2L, "a b")).toDF("doc_id", "text")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(tiny(1L) == 0L && tiny(2L) == 1L)
  }

  test("int8 quantization: reconstruction error bounded by half a code step") {
    val rows = ops.Similarity.d42Quantization(spark, dir).collect()
    assert(rows.nonEmpty)
    // per-element |x - code*scale| <= scale/2 with scale = max|x|/127,
    // and the fixture embeddings are unit-ish (|x| <= ~1): the mean
    // error must be positive (floats rarely quantize exactly) and
    // below 1/254 + slack
    rows.foreach { r =>
      val err = r.getDouble(2)
      assert(err > 0.0 && err < 0.005,
        s"label ${r.getInt(0)} mean_abs_err=$err out of range")
    }
  }

  test("contamination rollup agrees with the d17 per-doc report") {
    val rollup = ops.FuzzyDedup.d40ContaminationBySource(spark, dir).collect()
    assert(rollup.nonEmpty)
    rollup.foreach { r =>
      assert(r.getLong(2) <= r.getLong(1), "contaminated cannot exceed docs")
      assert(r.getDouble(3) <= r.getDouble(4) + 1e-9,
        "mean overlap cannot exceed max")
    }
    // the rollup covers every non-bench doc exactly once
    val nDocs = Tables.load(spark, dir, "documents")
      .filter(org.apache.spark.sql.functions.col("doc_id") >= 5).count()
    assert(rollup.map(_.getLong(1)).sum == nDocs)
    // d17's top doc overlap must equal the global max of the rollup
    val top17 = ops.FuzzyDedup.d17Decontaminate(spark, dir)
      .collect().head.getDouble(3)
    assert(math.abs(rollup.map(_.getDouble(4)).max - top17) < 1e-9,
      "rollup max must equal d17's top overlap")
  }

  test("funnel: stages are monotone and splits partition the final set") {
    val rows = CorpusOps.d38Funnel(spark, dir).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val (in, q, dd) = (rows("00_ingested"), rows("10_quality_kept"),
      rows("20_dedup_kept"))
    assert(in >= q && q >= dd && dd > 0, s"funnel not monotone: $rows")
    val splits = rows.collect { case (k, v) if k.startsWith("30_split_") => v }
    assert(splits.sum == dd, "splits must partition the deduped set")
  }

  test("balanced sample: every label downsamples to the smallest label's count") {
    val rows = ops.Similarity.d36BalancedSample(spark, dir).collect()
    assert(rows.nonEmpty)
    val quota = rows.map(_.getLong(1)).min
    rows.foreach { r =>
      assert(r.getLong(2) == quota,
        s"label ${r.getInt(0)} kept ${r.getLong(2)} != quota $quota")
      assert(r.getLong(1) >= r.getLong(2))
      assert(r.getLong(3) != 0, "membership fingerprint must reflect kept ids")
    }
  }

  test("decontamination window is a real parameter: w=8 needs an 8-token leak") {
    import spark.implicits._
    val phrase8 = "alpha bravo charlie delta echo foxtrot golf hotel"
    val prefix5 = "alpha bravo charlie delta echo"
    // doc_id < 5 is the benchmark side, matching the d17 convention
    val corpus = Seq(
      (0L, "bench", s"intro $phrase8 outro closing"),
      (1L, "bench", "unrelated bench text with several distinct tokens here"),
      (2L, "bench", "more bench filler text tokens one two three four"),
      (3L, "bench", "yet another bench document with harmless content words"),
      (4L, "bench", "final bench entry padded with neutral vocabulary items"),
      (10L, "web", s"webdoc carries the full leak $phrase8 embedded in padding"),
      (11L, "web", s"webdoc shares only $prefix5 then diverges completely onto other things"),
      (12L, "web", "entirely clean web document with no benchmark overlap at all")
    ).toDF("doc_id", "source", "text")
    def sharedAt(w: Int): Map[Long, Long] =
      ops.FuzzyDedup.docOverlapOf(corpus, w).collect()
        .map(r => r.getLong(0) -> r.getLong(2)).toMap
    val w8 = sharedAt(8)
    assert(w8(10L) >= 1, "8-token window must catch the planted 8-token leak")
    assert(w8(11L) == 0, "a 5-token share must NOT trip the 8-token window")
    assert(w8(12L) == 0)
    val w3 = sharedAt(3)
    assert(w3(10L) >= 1 && w3(11L) >= 1,
      "3-token window flags both docs (recall mode)")
    // the bloom prefilter stays result-transparent at a non-default window
    val bloom = ops.FuzzyDedup.bloomDecontaminate(corpus, 8).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val exact = ops.FuzzyDedup.decontaminateTopK(corpus, 8).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(bloom == exact,
      "bloom decontamination must equal the exact scan at any window")
  }

  test("balanced sample: XOR fingerprint distinguishes equal-sum memberships") {
    // {1,4} and {2,3} have the same id SUM (the old checksum's collision
    // mode) but must fingerprint differently under XOR-of-hash; and a
    // permutation of the same membership must fingerprint identically
    // (order insensitivity).
    import spark.implicits._
    def fp(ids: Seq[Long]): Long = ids.toDF("vec_id")
      .agg(bit_xor(ops.TextOps.hash60(
        concat(lit("bal:"), col("vec_id").cast("string")))))
      .head.getLong(0)
    assert(fp(Seq(1L, 4L)) != fp(Seq(2L, 3L)),
      "equal-sum memberships must not collide")
    assert(fp(Seq(4L, 1L)) == fp(Seq(1L, 4L)),
      "fingerprint must be order-insensitive")
  }

  test("mixture weights: shares normalize; temperature flattens toward uniform") {
    val rows = ops.TextOps.d66MixtureWeights(spark, dir).collect()
    val pRaw = rows.map(_.getDouble(3))
    val pMix = rows.map(_.getDouble(4))
    // both share columns are distributions (4dp rounding → loose sum)
    assert(math.abs(pRaw.sum - 1.0) < 0.002, s"p_raw sums to ${pRaw.sum}")
    assert(math.abs(pMix.sum - 1.0) < 0.002, s"p_mix sums to ${pMix.sum}")
    // α < 1 flattens: boost = q/p ∝ p^(α-1) is monotone DECREASING in
    // token share — the smallest source gains mass (>1), the largest
    // loses (<1). Rounding is monotone, so sorted order must survive it.
    val byTokens = rows.sortBy(_.getLong(2))
    val boosts = byTokens.map(_.getDouble(5))
    assert(boosts.head > 1.0, s"smallest source must upsample, got ${boosts.head}")
    assert(boosts.last < 1.0, s"largest source must downsample, got ${boosts.last}")
    boosts.zip(boosts.tail).foreach { case (a, b) =>
      assert(a >= b, "boost must be monotone decreasing in token share") }
  }

  test("length buckets: partition the corpus; padding and truncation reconcile") {
    import spark.implicits._
    val rows = ops.TextOps.d68LengthBuckets(spark, dir).collect()
    val docs = Tables.load(spark, dir, "documents")
    assert(rows.map(_.getLong(1)).sum == docs.count(),
      "every document lands in exactly one bucket")
    val pows = Set(8, 16, 32, 64, 128, 256, 512)
    rows.foreach { r =>
      assert(pows.contains(r.getInt(0)), s"bucket ${r.getInt(0)} not a 2^k")
      assert(r.getLong(2) <= r.getLong(4), "kept tokens cannot exceed padded")
      assert(r.getDouble(5) >= 0.0, "padding waste cannot be negative")
    }
    // totals reconcile with an independent per-doc recompute
    val toks = docs
      .select(size(ops.TextOps.tokens(col("text"))).as("n")).as[Int].collect()
    assert(rows.map(_.getLong(2)).sum ==
      toks.map(t => math.min(t, 512).toLong).sum, "kept-token total")
    assert(rows.map(_.getLong(3)).sum ==
      toks.map(t => math.max(t - 512, 0).toLong).sum, "truncated-token total")
  }
}
