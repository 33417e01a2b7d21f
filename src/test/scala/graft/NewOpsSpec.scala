package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.ops.{CorpusOps, FuzzyDedup, GraphOps, TextOps}

/** Round-10 operators, each checked against an INDEPENDENT sequential
  * reimplementation in plain Scala (not a re-run of the DataFrame code)
  * on planted fixtures that exercise the edge the operator exists for:
  * dangling nodes (d98), a binding waterline (d99), out-of-vocabulary
  * mass (d100), cross-block typo pairs (d101), and a cohort gap (d103).
  */
class NewOpsSpec extends SparkSpec {

  private def tmp(): String = Files.createTempDirectory("newops").toString

  // ------------------------------------------------------------- d98
  test("d98 pagerank matches an independent power iteration, dangling included") {
    // Three users walking a 4-type graph where type "z" is a SINK:
    // every user's stream ends at z and z never transitions out, so z
    // holds dangling mass that must be redistributed — the branch a
    // dangling-free fixture would leave dead.
    val walks = Seq(
      (1L, Seq("a", "b", "a", "c", "z")),
      (2L, Seq("b", "c", "b", "a", "z")),
      (3L, Seq("a", "b", "c", "z")))
    val rows = walks.flatMap { case (u, types) =>
      types.zipWithIndex.map { case (t, i) =>
        (u * 100 + i, 1700000000000000L + i * 60000000L, u, t)
      }
    }
    val dir = tmp()
    import spark.implicits._
    rows.toDF("event_id", "us", "user_id", "event_type")
      .select(col("event_id"), timestamp_micros(col("us")).as("ts"),
        col("user_id"), col("event_type"))
      .write.mode("overwrite").parquet(s"$dir/events.parquet")

    // independent model: edge counts by hand from the walks
    val pairs = walks.flatMap { case (_, ts) => ts.zip(ts.tail) }
    val counts = pairs.groupBy(identity).map { case (p, l) => p -> l.size.toDouble }
    val outTot = counts.groupBy(_._1._1).map { case (s, m) => s -> m.values.sum }
    val nodes = walks.flatMap(_._2).distinct.sorted
    val n = nodes.size.toDouble
    var pr = nodes.map(_ -> 1.0 / n).toMap
    for (_ <- 1 to GraphOps.PrIters) {
      val dang = nodes.filterNot(outTot.contains).map(pr).sum
      pr = nodes.map { v =>
        val in = counts.collect {
          case ((s, d), c) if d == v => pr(s) * (c / outTot(s))
        }.sum
        v -> (GraphOps.PrTeleport / n + GraphOps.PrDamp * (in + dang / n))
      }.toMap
    }

    val got = GraphOps.d98PageRank(spark, dir).collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(got.keySet == nodes.toSet)
    nodes.foreach { v =>
      assert(math.abs(got(v) - pr(v)) < 1e-6, s"node $v: ${got(v)} vs ${pr(v)}")
    }
    // a proper PageRank over a row-stochastic graph with redistributed
    // dangling mass conserves total mass
    assert(math.abs(got.values.sum - 1.0) < 1e-4)
  }

  // ------------------------------------------------------------- d99
  test("d99 epoch mix equals sequential water-filling on a skewed corpus") {
    // sources with strongly skewed sizes so the waterline BINDS: the
    // small sources hit their 3-epoch cap, the large ones level at tau
    val dir = tmp()
    import spark.implicits._
    val docs = (0 until 200).map { i =>
      val src = s"s${i % 8}"
      // source k gets docs of ~ (k+1)^2 tokens -> heavy size skew
      val k = i % 8
      val words = Seq.tabulate((k + 1) * (k + 1))(j => s"w$j").mkString(" ")
      (i.toLong, words, "en", src, words.length.toLong)
    }
    docs.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")

    // independent sequential water-filling
    val toks = docs.groupBy(_._4).map { case (s, ds) =>
      s -> ds.map(_._2.split("\\s+").count(_.nonEmpty).toLong).sum
    }
    val caps = toks.map { case (s, t) => (s, t, t * TextOps.EpochCap) }.toSeq
      .sortBy(c => (c._3, c._1))
    val budget = toks.values.sum * TextOps.BudgetNum / TextOps.BudgetDen
    var remaining = budget
    var left = caps.size
    var tau = -1L
    val expected = scala.collection.mutable.Map[String, Long]()
    caps.foreach { case (s, _, cap) =>
      if (tau >= 0) expected(s) = tau
      else if (cap * left <= remaining) {
        expected(s) = cap; remaining -= cap; left -= 1
      } else { tau = remaining / left; expected(s) = tau }
    }

    val got = TextOps.d99EpochMix(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.length == 8)
    got.foreach { case (s, nTok, cap, alloc) =>
      assert(nTok == toks(s))
      assert(cap == nTok * TextOps.EpochCap)
      assert(alloc == expected(s), s"source $s: $alloc vs ${expected(s)}")
    }
    // waterline must actually bind on this fixture (else the test
    // degenerates to the all-full branch)
    assert(got.exists { case (_, _, cap, alloc) => alloc < cap })
    assert(got.exists { case (_, _, cap, alloc) => alloc == cap })
    assert(got.map(_._4).sum <= budget)
  }

  // ------------------------------------------------------------- d100
  test("d100 oov rate counts exactly the tokens outside the top-V vocab") {
    // 1100 distinct singleton tokens + a frequent core -> the 1000-cap
    // vocabulary must EXCLUDE ~the 100+ rarest; rare-heavy docs score
    // high oov. Ties at the frequency boundary break by token asc
    // (d19's order), mirrored in the reference computation.
    val dir = tmp()
    import spark.implicits._
    val core = (0 until 50).map(i => f"core$i%03d")
    val rare = (0 until 1100).map(i => f"rare$i%04d")
    val docs = (0 until 110).map { i =>
      val text =
        if (i < 100) (core ++ rare.slice(i * 10, i * 10 + 10)).mkString(" ")
        else core.take(10).mkString(" ")
      (i.toLong, text, "en", "s0", text.length.toLong)
    } :+ ((110L, "", "en", "s0", 0L)) // zero-token doc stays, NULL rate
    docs.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")

    val freq = docs.flatMap(_._2.toLowerCase.split("\\s+").filter(_.nonEmpty))
      .groupBy(identity).map { case (t, l) => t -> l.size }
    val vocab = freq.toSeq.sortBy { case (t, n) => (-n, t) }
      .take(TextOps.OovVocabSize).map(_._1).toSet
    val got = TextOps.d100OovRate(spark, dir).collect()
    assert(got.length == docs.length)
    got.foreach { r =>
      val doc = docs(r.getLong(0).toInt)
      val toks = doc._2.toLowerCase.split("\\s+").filter(_.nonEmpty)
      assert(r.getLong(1) == toks.length)
      assert(r.getLong(2) == toks.count(t => !vocab(t)),
        s"doc ${doc._1}: oov ${r.getLong(2)}")
      if (toks.isEmpty) assert(r.isNullAt(3))
    }
    assert(got.exists(r => r.getLong(2) > 0)) // OOV mass actually exists
  }

  // ------------------------------------------------------------- d101
  test("d101 multi-pass blocking catches typos in first AND last chars") {
    val dir = tmp()
    import spark.implicits._
    val names = Seq(
      "widget", "widgot",   // same first+last: both passes catch it
      "bidget",             // differs in FIRST char from widget -> only last-char pass
      "widgex",             // differs in LAST char from widget -> only first-char pass
      "unrelated thing")
    val parts = names.zipWithIndex.flatMap { case (nm, i) =>
      // duplicate rows so the exact pre-pass frequencies are > 1
      (0 to i).map(j => ((i * 10 + j).toLong, nm, s"Brand#${i % 3}",
        "t", 1, 1.0))
    }
    parts.toDF("p_partkey", "p_name", "p_brand", "p_type", "p_size",
        "p_retailprice")
      .write.mode("overwrite").parquet(s"$dir/part.parquet")

    val got = FuzzyDedup.d101FuzzyMatch(spark, dir).collect()
      .map(r => (r.getString(0), r.getString(1), r.getInt(2),
        r.getLong(3), r.getLong(4))).toSet
    val expected = Set(
      ("widget", "widgot", 1, 1L, 2L),
      ("bidget", "widget", 1, 3L, 1L),   // first chars differ
      ("widget", "widgex", 1, 1L, 4L),   // last chars differ
      ("bidget", "widgot", 2, 3L, 2L),
      ("widgex", "widgot", 2, 4L, 2L))
    // NOT expected: (bidget, widgex) differs in BOTH block keys — the
    // documented recall limit of two-pass blocking (d84's audit role).
    assert(got == expected, s"got $got")
  }

  // ------------------------------------------------------------- d102
  test("d102 dsir weights rank target-like docs above off-target docs") {
    // Target (en) docs share a distinctive phrase; off-target (zh) docs
    // share a different one. A fresh doc written in the target's
    // phrasing must outscore one written in the off-target's — the
    // ordering DSIR selection relies on. Bigram features, so the
    // discriminative signal is the adjacent PAIRS, not the words.
    val dir = tmp()
    import spark.implicits._
    val docs =
      (0 until 40).map(i => (i.toLong,
        s"alpha beta gamma delta run $i", "en", "s0", 10L)) ++
      (40 until 80).map(i => (i.toLong,
        s"uno dos tres cuatro corrida $i", "zh", "s0", 10L)) ++
      Seq((80L, "alpha beta gamma delta fresh", "fr", "s1", 10L),
          (81L, "uno dos tres cuatro fresco", "fr", "s1", 10L))
    docs.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val w = CorpusOps.d102DsirWeights(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(w(80L) > w(81L),
      s"target-phrased doc ${w(80L)} must outscore off-target ${w(81L)}")
    assert(w(0L) > w(40L)) // and the training rows themselves separate
  }

  // ------------------------------------------------------------- d109
  test("d109 retention triangle is exact on a staggered-cohort log") {
    // the sf fixture's uniform log collapses to one cohort; this plants
    // two cohorts with known dropout so every (cohort, offset) cell and
    // retention ratio is hand-checkable
    val dir = tmp()
    import spark.implicits._
    val monday = 1704067200000000L // 2024-01-01T00:00Z, a Monday
    val week = 604800000000L
    def active(u: Long): Seq[Long] = {
      val f = if (u < 10) 0L else 1L // cohorts of 10 users each
      Seq(f) ++ (if (u % 2 == 0) Seq(f + 1) else Nil) ++
        (if (u % 4 == 0) Seq(f + 2) else Nil)
    }
    val rows = (0L until 20L).flatMap { u =>
      active(u).zipWithIndex.map { case (w, i) =>
        (u * 100 + i, monday + w * week + u * 3600000000L, u, "a", 1.0, "{}")
      }
    }
    rows.toDF("event_id", "us", "user_id", "event_type", "value", "props")
      .select(col("event_id"), timestamp_micros(col("us")).as("ts"),
        col("user_id"), col("event_type"), col("value"), col("props"))
      .write.mode("overwrite").parquet(s"$dir/events.parquet")

    val got = CorpusOps.d109RetentionCohorts(spark, dir).collect()
      .map(r => (r.getTimestamp(0).getTime, r.getLong(1), r.getLong(2),
        r.getDouble(3)))
    // both cohorts: offset 0 = 10 users, offset 1 = evens (5), offset 2
    // = multiples of 4 (cohort 0 has 0,4,8 -> 3; cohort 1 has 12,16 -> 2)
    val c0 = monday / 1000; val c1 = (monday + week) / 1000 // µs -> ms
    val expected = Seq(
      (c0, 0L, 10L, 1.0), (c0, 1L, 5L, 0.5), (c0, 2L, 3L, 0.3),
      (c1, 0L, 10L, 1.0), (c1, 1L, 5L, 0.5), (c1, 2L, 2L, 0.2))
    assert(got.toSeq == expected, s"got ${got.toSeq}")
  }

  // ------------------------------------------------------------- d110
  test("d110 power iteration recovers a planted dominant direction") {
    val dir = tmp()
    import spark.implicits._
    // 40 vectors in R^4: big variance along (1,1,0,0)/sqrt(2), small
    // noise elsewhere — PC1 must align with the planted direction
    val vecs = (0 until 40).map { i =>
      val t = (i - 20).toDouble
      val noise = Seq(0.01 * (i % 3), 0.02 * (i % 5), 0.01 * (i % 7), 0.0)
      (i.toLong,
        Seq(t + noise(0), t + noise(1), noise(2), 0.1 * (i % 2) + noise(3))
          .map(_.toFloat), i % 2)
    }
    vecs.toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")

    // independent JVM power iteration on the same centered data
    val x = vecs.map(_._2.map(_.toDouble))
    val n = x.size; val dim = 4
    val mu = (0 until dim).map(d => x.map(_(d)).sum / n)
    val xc = x.map(v => v.indices.map(d => v(d) - mu(d)))
    var v = Seq.fill(dim)(1.0 / math.sqrt(dim))
    for (_ <- 1 to ops.Similarity.PcaIters) {
      val y = xc.map(r => r.indices.map(d => r(d) * v(d)).sum)
      val s = (0 until dim).map(d => xc.zip(y).map { case (r, yi) => r(d) * yi }.sum)
      val nrm = math.sqrt(s.map(e => e * e).sum)
      v = s.map(_ / nrm)
    }
    val got = ops.Similarity.d110PowerPca(spark, dir).collect()
      .map(r => r.getInt(0) -> r.getDouble(1)).toMap
    assert(got.size == dim)
    (0 until dim).foreach { d =>
      assert(math.abs(got(d + 1) - v(d)) < 1e-3,
        s"dim ${d + 1}: ${got(d + 1)} vs ${v(d)}")
    }
    // and the recovered direction is the planted one (|cos| > 0.99)
    val planted = Seq(1.0, 1.0, 0.0, 0.0).map(_ / math.sqrt(2))
    val cos = (0 until dim).map(d => v(d) * planted(d)).sum
    assert(math.abs(cos) > 0.99, s"cos=$cos")
  }

  // ------------------------------------------------------------- d108
  test("d108 poisson bootstrap matches an independent JVM recomputation") {
    val dir = tmp()
    import spark.implicits._
    val events = (0 until 60).map { u =>
      (u.toLong, 1700000000000000L + u * 1000000L, u.toLong, "a",
        5.0 + (u % 7), "{}")
    }
    events.toDF("event_id", "us", "user_id", "event_type", "value", "props")
      .select(col("event_id"), timestamp_micros(col("us")).as("ts"),
        col("user_id"), col("event_type"), col("value"), col("props"))
      .write.mode("overwrite").parquet(s"$dir/events.parquet")

    // independent path: JVM md5 -> 60-bit uniform -> Poisson weight
    def u01(s: String): Double = {
      val d = java.security.MessageDigest.getInstance("MD5")
      val hex = d.digest(s.getBytes("UTF-8"))
        .map(b => f"$b%02x").mkString.take(15)
      java.lang.Long.parseLong(hex, 16) / 1152921504606846976.0
    }
    def pw(x: Double): Int = {
      val i = CorpusOps.PoissonCdf.indexWhere(x < _)
      if (i < 0) CorpusOps.PoissonCdf.size else i
    }
    val metrics = events.groupBy(_._3).map { case (u, es) =>
      u -> es.map(_._5).sum }
    val repMeans = (1 to CorpusOps.BootReps).map { r =>
      val ws = metrics.toSeq.map { case (u, m) =>
        (pw(u01(s"boot:$r:$u")), m) }
      ws.map { case (w, m) => w * m }.sum / ws.map(_._1).sum
    }.sorted
    val row = CorpusOps.d108PoissonBootstrap(spark, dir).collect().head
    assert(row.getLong(0) == 60 && row.getInt(1) == CorpusOps.BootReps)
    assert(math.abs(row.getDouble(3) - repMeans(CorpusOps.BootLoIdx - 1)) < 1e-3)
    assert(math.abs(row.getDouble(4) - repMeans(CorpusOps.BootMedIdx - 1)) < 1e-3)
    assert(math.abs(row.getDouble(5) - repMeans(CorpusOps.BootHiIdx - 1)) < 1e-3)
    // the interval is a real interval around the mean
    assert(row.getDouble(3) < row.getDouble(2) && row.getDouble(2) < row.getDouble(5))
  }

  // ------------------------------------------------------------- d103
  test("d103 Welch t matches the closed-form computation") {
    val dir = tmp()
    import spark.implicits._
    // cohort 0 (even users): metric ~ 10 + u; cohort 1 (odd): 30 + u
    val events = (0 until 40).flatMap { u =>
      val base = if (u % 2 == 0) 10.0 else 30.0
      Seq((u.toLong * 2, 1700000000000000L, u.toLong, "a", base + u, "{}"),
        (u.toLong * 2 + 1, 1700000000100000L, u.toLong, "b", 1.0, "{}"))
    }
    events.toDF("event_id", "us", "user_id", "event_type", "value", "props")
      .select(col("event_id"), timestamp_micros(col("us")).as("ts"),
        col("user_id"), col("event_type"), col("value"), col("props"))
      .write.mode("overwrite").parquet(s"$dir/events.parquet")

    val metrics = events.groupBy(_._3).map { case (u, es) =>
      u -> es.map(_._5).sum
    }
    def stats(c: Long) = {
      val xs = metrics.collect { case (u, m) if u % 2 == c => m }.toSeq
      val n = xs.size
      val mean = xs.sum / n
      val v = xs.map(x => (x - mean) * (x - mean)).sum / (n - 1)
      (n, mean, v)
    }
    val (na, ma, va) = stats(0); val (nb, mb, vb) = stats(1)
    val sa = va / na; val sb = vb / nb
    val t = (ma - mb) / math.sqrt(sa + sb)
    val df = (sa + sb) * (sa + sb) /
      (sa * sa / (na - 1) + sb * sb / (nb - 1))

    val r = CorpusOps.d103AbTest(spark, dir).collect().head
    assert(r.getLong(0) == na && r.getLong(2) == nb)
    assert(math.abs(r.getDouble(1) - ma) < 1e-3)
    assert(math.abs(r.getDouble(3) - mb) < 1e-3)
    assert(math.abs(r.getDouble(4) - t) < 1e-3, s"t ${r.getDouble(4)} vs $t")
    assert(math.abs(r.getDouble(5) - df) < 1e-3)
  }
}
