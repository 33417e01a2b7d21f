package graft

import org.apache.spark.sql.functions._

import graft.functions.SimHash48

/** Native Catalyst expressions: semantics pinned against independent
  * Scala reimplementations (the driver's DuckDB gate pins them again,
  * end-to-end, via the d3/d16 oracles). Collect exercises the codegen
  * path; the explicit eval test covers the interpreted fallback. */
class FunctionsSpec extends SparkSpec {

  /** Straight-line reimplementation of the 48-bit majority vote. */
  private def reference(hs: Seq[Long]): Long = {
    val votes = Array.fill(48)(0)
    hs.foreach(h => (0 until 48).foreach(i =>
      if (((h >>> i) & 1L) == 1L) votes(i) += 1))
    (0 until 48).map(i => if (votes(i) * 2 > hs.length) 1L << i else 0L).sum
  }

  test("SimHash48 matches the reference implementation on random input") {
    import spark.implicits._
    val rnd = new scala.util.Random(42)
    val rows = (0 until 200).map(i =>
      (i, Seq.fill(rnd.nextInt(50) + 1)(rnd.nextLong() & ((1L << 60) - 1))))
    val got = rows.toDF("id", "hs")
      .select(col("id"), SimHash48(col("hs")).as("s"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    rows.foreach { case (i, a) =>
      assert(got(i) == reference(a), s"row $i")
    }
  }

  test("SimHash48 edge cases: empty array → 0, null → null") {
    import spark.implicits._
    val df = Seq((0, Some(Seq.empty[Long])), (1, None))
      .toDF("id", "hs")
      .select(col("id"), SimHash48(col("hs")).as("s"))
    val rows = df.collect().map(r => r.getInt(0) -> (if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap
    assert(rows(0).contains(0L))
    assert(rows(1).isEmpty)
  }

  test("ShingleHashes matches an independent reimplementation") {
    import spark.implicits._
    import graft.functions.ShingleHashes
    def md5Mod(s: String): Long =
      java.lang.Long.parseLong(
        java.security.MessageDigest.getInstance("MD5")
          .digest(s.getBytes("UTF-8"))
          .map("%02x".format(_)).mkString.substring(0, 15), 16) % ShingleHashes.M
    def refShingles(text: String): Seq[Long] = {
      val toks = text.split("\\s+").filter(_.nonEmpty).toSeq
      if (toks.length < 3) Seq(md5Mod(text))
      else {
        val th = toks.map(md5Mod)
        (0 until toks.length - 2).map(i =>
          (((th(i) * ShingleHashes.K1 + th(i + 1)) % ShingleHashes.M) *
            ShingleHashes.K2 + th(i + 2)) % ShingleHashes.M)
      }
    }
    val texts = Seq(
      "the quick brown fox jumps over the lazy dog",
      "two words",
      "one",
      "a b c",
      "repeated repeated repeated repeated")
    val got = texts.zipWithIndex.map { case (t, i) => (i, t) }
      .toDF("id", "text")
      .select($"id", ShingleHashes(
        org.apache.spark.sql.functions.regexp_extract_all(
          $"text", org.apache.spark.sql.functions.lit("\\S+"),
          org.apache.spark.sql.functions.lit(0)),
        graft.ops.TextOps.hash60($"text") % ShingleHashes.M).as("sh"))
      .collect().map(r => r.getInt(0) -> r.getSeq[Long](1)).toMap
    texts.zipWithIndex.foreach { case (t, i) =>
      assert(got(i) == refShingles(t), s"text '$t'")
    }
  }

  test("ShingleHashes window parameter generalizes the rolling polynomial") {
    import spark.implicits._
    import graft.functions.ShingleHashes
    def refWindow(toks: Seq[String], w: Int, fallback: Long): Seq[Long] = {
      val th = toks.map(t => ShingleHashes.tokenHash(t.getBytes("UTF-8")))
      if (toks.length < w) Seq(fallback)
      else (0 to toks.length - w).map { i =>
        (1 until w).foldLeft(th(i)) { (h, j) =>
          val k = if (j % 2 == 1) ShingleHashes.K1 else ShingleHashes.K2
          (h * k + th(i + j)) % ShingleHashes.M
        }
      }
    }
    val text = "one two three four five six seven eight nine ten"
    val toks = text.split(" ").toSeq
    val fb = 424242L
    val got = Seq((0, text)).toDF("id", "text")
      .select(
        Seq(2, 3, 5, 8, 11).map(w => ShingleHashes(
          regexp_extract_all(col("text"), lit("\\S+"), lit(0)),
          lit(fb), w).as(s"w$w")): _*)
      .collect().head
    Seq(2, 3, 5, 8, 11).zipWithIndex.foreach { case (w, idx) =>
      assert(got.getSeq[Long](idx) == refWindow(toks, w, fb), s"window $w")
    }
    // w = 3 must be the historical formulation (the gated dedup default)
    assert(refWindow(toks, 3, fb) == (0 until toks.length - 2).map { i =>
      val th = toks.map(t => ShingleHashes.tokenHash(t.getBytes("UTF-8")))
      (((th(i) * ShingleHashes.K1 + th(i + 1)) % ShingleHashes.M) *
        ShingleHashes.K2 + th(i + 2)) % ShingleHashes.M
    })
  }

  test("TokenHashes matches the hash60 column formulation, modded and not") {
    import spark.implicits._
    import graft.functions.{ShingleHashes, TokenHashes}
    import org.apache.spark.sql.functions.{lit, regexp_extract_all, transform}
    val texts = Seq(
      "the quick brown fox", "one", "", "répété unicode tökens", "a a a")
    val df = texts.zipWithIndex.map { case (t, i) => (i, t) }.toDF("id", "text")
    val toks = regexp_extract_all($"text", lit("\\S+"), lit(0))
    val got = df.select($"id",
        TokenHashes(toks, 0L).as("raw"),
        TokenHashes(toks, ShingleHashes.M).as("modded"),
        transform(toks, t => graft.ops.TextOps.hash60(t)).as("ref_raw"),
        transform(toks,
          t => graft.ops.TextOps.hash60(t) % ShingleHashes.M).as("ref_mod"))
      .collect()
    got.foreach { r =>
      assert(r.getSeq[Long](1) == r.getSeq[Long](3), s"raw mismatch id=${r.getInt(0)}")
      assert(r.getSeq[Long](2) == r.getSeq[Long](4), s"mod mismatch id=${r.getInt(0)}")
    }
  }

  test("property: SimHash48 and ShingleHashes match references on arbitrary input") {
    import org.scalacheck.{Gen, Prop}
    import org.scalacheck.Prop.forAll
    import graft.functions.{ShingleHashes, SimHash48}
    // interpreted-eval properties (no Spark job per case: direct eval)
    val hashGen = Gen.chooseNum(0L, (1L << 60) - 1)
    val arrGen = Gen.listOfN(40, hashGen).flatMap(l =>
      Gen.chooseNum(0, 40).map(l.take))
    val simProp = forAll(arrGen) { hs =>
      val lit = org.apache.spark.sql.catalyst.expressions.Literal.create(
        hs, org.apache.spark.sql.types.ArrayType(
          org.apache.spark.sql.types.LongType))
      SimHash48(lit).eval(null) == reference(hs)
    }
    val tokenGen = Gen.nonEmptyListOf(Gen.alphaNumChar).map(_.mkString)
    val docGen = Gen.listOfN(8, tokenGen).flatMap(l =>
      Gen.chooseNum(0, 8).map(l.take))
    def md5Mod(s: String): Long = ShingleHashes.tokenHash(s.getBytes("UTF-8"))
    val shingleProp = forAll(docGen) { toks =>
      val fallback = 12345L
      val lit = org.apache.spark.sql.catalyst.expressions.Literal.create(
        toks, org.apache.spark.sql.types.ArrayType(
          org.apache.spark.sql.types.StringType))
      val fb = org.apache.spark.sql.catalyst.expressions.Literal(fallback)
      val got = ShingleHashes(lit, fb).eval(null)
        .asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
        .toLongArray.toSeq
      val want =
        if (toks.length < 3) Seq(fallback)
        else {
          val th = toks.map(md5Mod)
          (0 until toks.length - 2).map(i =>
            (((th(i) * ShingleHashes.K1 + th(i + 1)) % ShingleHashes.M) *
              ShingleHashes.K2 + th(i + 2)) % ShingleHashes.M)
        }
      got == want
    }
    val res1 = org.scalacheck.Test.check(
      org.scalacheck.Test.Parameters.default.withMinSuccessfulTests(200), simProp)
    val res2 = org.scalacheck.Test.check(
      org.scalacheck.Test.Parameters.default.withMinSuccessfulTests(200), shingleProp)
    assert(res1.passed, s"SimHash48 property failed: ${res1.status}")
    assert(res2.passed, s"ShingleHashes property failed: ${res2.status}")
  }

  test("native expressions compile under CODEGEN_ONLY (no silent fallback)") {
    // a janino error in doGenCode would otherwise silently fall back to
    // interpreted eval — correct results, lost performance
    val prev = spark.conf.getOption("spark.sql.codegen.factoryMode")
    spark.conf.set("spark.sql.codegen.factoryMode", "CODEGEN_ONLY")
    try {
      // one query per native expression: SimHash48, ShingleHashes,
      // CharGramHashes — any of them failing to janino-compile would
      // throw here instead of silently interpreting
      val sf = "/root/testdata/sf0.001"
      assert(graft.ops.FuzzyDedup.d3Simhash(spark, sf).collect().nonEmpty)
      assert(graft.ops.FuzzyDedup.d17Decontaminate(spark, sf).collect().nonEmpty)
      assert(graft.ops.FuzzyDedup.d4NgramJaccard(spark, sf).collect().nonEmpty)
      assert(graft.ops.Similarity.d42Quantization(spark, sf).collect().nonEmpty)
      assert(graft.ops.CorpusOps.d41BigramSurprisal(spark, sf).collect().nonEmpty)
      assert(graft.ops.CorpusOps.d63Normalize(spark, sf).collect().nonEmpty)
    } finally {
      prev match {
        case Some(v) => spark.conf.set("spark.sql.codegen.factoryMode", v)
        case None => spark.conf.unset("spark.sql.codegen.factoryMode")
      }
    }
  }

  test("NfcClean: composes combining marks, strips control debris, keeps astral text") {
    import spark.implicits._
    import graft.functions.NfcClean
    import org.apache.spark.unsafe.types.UTF8String
    val decomposed = "cafe\u0301"  // e + combining acute
    val composed = "caf\u00e9"     // precomposed
    val astral = new String(Character.toChars(0x1F600)) + " ok"
    val cases = Seq(
      decomposed -> composed,                       // NFC composes
      composed -> composed,                         // already-NFC fixed point
      "ab\u0007\u0000c" -> "abc",                   // C0 control debris stripped
      "x\u0085y\u009fz\u007fw" -> "xyzw",           // C1 + DEL stripped
      "keep\tthese\nchars" -> "keep\tthese\nchars", // \t and \n survive
      astral -> astral,                             // astral plane untouched
      "" -> "")
    val out = cases.map(_._1).toDF("s")
      .select(NfcClean(col("s")).as("c")).collect().map(_.getString(0))
    cases.map(_._2).zip(out).foreach { case (want, got) =>
      assert(got == want, s"expected ${want.codePoints().toArray.toSeq} " +
        s"got ${got.codePoints().toArray.toSeq}")
    }
    // the ASCII fast path returns the INPUT OBJECT - zero allocation
    val ascii = UTF8String.fromString("plain ascii, kept as-is")
    assert(NfcClean.clean(ascii) eq ascii, "ASCII fast path must not copy")
    // null in -> null out (UnaryExpression null-safety)
    val nullOut = Seq[Option[String]](None).toDF("s")
      .select(NfcClean(col("s")).as("c")).collect().head
    assert(nullOut.isNullAt(0))
  }

  test("CharGramHashes matches an independent reimplementation") {
    import spark.implicits._
    import graft.functions.CharGramHashes
    def ref2(s: String, fallback: Long): Seq[Long] = {
      val cps = s.codePoints().toArray.map(_.toLong)
      if (cps.length < 3) Seq(fallback)
      else (0 until cps.length - 2).map(i =>
        ((cps(i) * 131L + cps(i + 1)) % CharGramHashes.M * 131L +
          cps(i + 2)) % CharGramHashes.M)
    }
    val texts = Seq("hello world", "ab", "", "aaa", "mixed case TEXT 123!")
    val fb = 777L
    val got = texts.zipWithIndex.map { case (t, i) => (i, t) }
      .toDF("id", "text")
      .select($"id", CharGramHashes($"text",
        org.apache.spark.sql.functions.lit(fb)).as("g"))
      .collect().map(r => r.getInt(0) -> r.getSeq[Long](1)).toMap
    texts.zipWithIndex.foreach { case (t, i) =>
      assert(got(i) == ref2(t, fb), s"text '$t'")
    }
  }

  test("SimHash48 interpreted eval agrees with codegen") {
    val hs = Seq(7L, 7L, 1L << 47, (1L << 47) | 3L)
    val lit = org.apache.spark.sql.catalyst.expressions.Literal.create(
      hs, org.apache.spark.sql.types.ArrayType(
        org.apache.spark.sql.types.LongType))
    val interpreted = graft.functions.SimHash48(lit).eval(null)
    assert(interpreted == reference(hs))
  }

  test("QuantError matches the HOF formulation bit-for-bit") {
    import graft.functions.QuantError
    import org.apache.spark.sql.Column
    // the exact transform/aggregate folds d42 used before the native
    // expression replaced them — the parity oracle (element order and
    // arithmetic must be identical, not just close: the driver gate
    // hashes d42's output)
    def hofScale(v: Column): Column =
      aggregate(v, lit(0.0), (acc, x) => greatest(acc, abs(x))) / 127.0
    def hofErr(v: Column, scale: Column): Column = {
      val code = (x: Column) => greatest(lit(-127.0), least(lit(127.0),
        floor(x / scale + 0.5)))
      when(scale > 0,
        aggregate(transform(v, x => abs(x - code(x) * scale)),
          lit(0.0), (acc, x) => acc + x) / size(v))
        .otherwise(0.0)
    }
    val v = col("embedding").cast("array<double>")
    val rows = graft.Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
      .select(col("vec_id"), QuantError(v).as("q"),
        hofScale(v).as("ref_scale"), hofErr(v, hofScale(v)).as("ref_err"))
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val q = r.getStruct(1)
      assert(q.getDouble(0) == r.getDouble(2),
        s"scale mismatch vec_id=${r.getLong(0)}")
      assert(q.getDouble(1) == r.getDouble(3),
        s"err mismatch vec_id=${r.getLong(0)}")
    }
  }

  test("L2SqE4 matches the HOF formulation bit-for-bit, including " +
      "subspace slices and the null contracts") {
    import graft.functions.L2SqE4
    import org.apache.spark.sql.Column
    // the exact round(aggregate(zip_with(...))·10⁴) fold d217 used
    // before the native expression replaced it — the parity oracle
    // (element order and the decimal HALF_UP round must be identical,
    // not just close: the driver gate hashes d217's ADC integers)
    def hof(a: Column, b: Column): Column =
      round(aggregate(zip_with(a, b, (x, y) => (x - y) * (x - y)),
        lit(0.0), _ + _) * 10000).cast("long")
    val e = graft.Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    val probe = e.filter(col("vec_id") === 0).select(col("v").as("qv"))
    val full = e.crossJoin(probe)
      .select(col("vec_id"), L2SqE4(col("v"), col("qv")).as("native"),
        hof(col("v"), col("qv")).as("ref"))
      .collect()
    assert(full.nonEmpty)
    full.foreach(r => assert(r.getLong(1) == r.getLong(2),
      s"full-vector mismatch vec_id=${r.getLong(0)}"))
    val sub = e.crossJoin(probe)
      .select(col("vec_id"),
        L2SqE4(slice(col("v"), 17, 16), slice(col("qv"), 17, 16)).as("native"),
        hof(slice(col("v"), 17, 16), slice(col("qv"), 17, 16)).as("ref"))
      .collect()
    sub.foreach(r => assert(r.getLong(1) == r.getLong(2),
      s"subspace mismatch vec_id=${r.getLong(0)}"))
    // null contracts: mismatched lengths → null (zip_with pads with
    // null, poisoning the HOF sum the same way)
    val mism = spark.range(1).select(
      L2SqE4(array(lit(1.0), lit(2.0)), array(lit(1.0))).as("n"),
      hof(array(lit(1.0), lit(2.0)), array(lit(1.0))).as("r"))
      .collect().head
    assert(mism.isNullAt(0) && mism.isNullAt(1))
  }

  test("QuantCodes matches the HOF formulation and round-trips within scale/2") {
    import graft.functions.QuantCodes
    import org.apache.spark.sql.Column
    def hofScale(v: Column): Column =
      aggregate(v, lit(0.0), (acc, x) => greatest(acc, abs(x))) / 127.0
    // the transform formulation the native expression replaces
    def hofCodes(v: Column): Column = {
      val scale = hofScale(v)
      when(scale > 0,
        transform(v, x => greatest(lit(-127.0), least(lit(127.0),
          floor(x / scale + 0.5))).cast("tinyint")))
        .otherwise(transform(v, _ => lit(0).cast("tinyint")))
    }
    val v = col("embedding").cast("array<double>")
    val rows = graft.Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
      .select(col("vec_id"), v.as("v"),
        QuantCodes(v).as("codes"), hofCodes(v).as("ref"),
        hofScale(v).as("scale"))
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val codes = r.getSeq[Byte](2)
      assert(codes == r.getSeq[Byte](3),
        s"code mismatch vec_id=${r.getLong(0)}")
      // round-trip bound: |x - code*scale| <= scale/2 for every element
      // (nearest-level quantization; the clamp never binds because the
      // max element maps to exactly +/-127)
      val xs = r.getSeq[Double](1)
      val scale = r.getDouble(4)
      xs.zip(codes).foreach { case (x, c) =>
        assert(math.abs(x - c * scale) <= scale / 2 + 1e-12,
          s"round-trip bound violated vec_id=${r.getLong(0)}")
      }
    }
  }

  test("cosine over QuantCodes equals cosine over reconstructed vectors (scale invariance)") {
    import graft.functions.{CosineSim, QuantCodes}
    val v = col("embedding").cast("array<double>")
    val e = graft.Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
      .select(col("vec_id"), QuantCodes(v).cast("array<double>").as("cv"),
        // reconstructed = code * scale, elementwise
        transform(QuantCodes(v).cast("array<double>"),
          c => c * (aggregate(v, lit(0.0), (a, x) => greatest(a, abs(x))) / 127.0))
          .as("rv"))
    val probe = e.filter(col("vec_id") === 0)
      .select(col("cv").as("qcv"), col("rv").as("qrv"))
    val rows = e.crossJoin(broadcast(probe))
      .select(round(CosineSim(col("cv"), col("qcv")), 10).as("code_cos"),
        round(CosineSim(col("rv"), col("qrv")), 10).as("recon_cos"))
      .collect()
    assert(rows.nonEmpty)
    rows.foreach(r => assert(r.getDouble(0) == r.getDouble(1),
      "per-vector scales must cancel out of cosine"))
  }

  test("BigramHashes matches the zip_with formulation, incl. null elements") {
    import spark.implicits._
    import graft.functions.{BigramHashes, ShingleHashes}
    val m = ShingleHashes.M
    val k1 = ShingleHashes.K1
    val rnd = new scala.util.Random(7)
    val rows = (0 until 100).map { i =>
      val n = rnd.nextInt(12)
      // every ~4th element null to exercise the pair-skip path
      (i, Some(Seq.tabulate(n)(j =>
        if (rnd.nextInt(4) == 0) None else Some(rnd.nextLong().abs % m))))
    } :+ ((100, None: Option[Seq[Option[Long]]]))
    // the exact HOF formulation d41 used before the native expression
    val pairs = zip_with(col("hs"), slice(col("hs"), lit(2), size(col("hs"))),
      (a, b) => struct(a.as("h1"), ((a * k1 + b) % m).as("h12")))
    val ref = filter(pairs,
      s => s.getField("h1").isNotNull && s.getField("h12").isNotNull)
    val got = rows.toDF("id", "hs")
      .select($"id", BigramHashes($"hs").as("native"), ref.as("ref"))
      .collect()
    got.foreach { r =>
      if (r.isNullAt(1)) assert(r.isNullAt(2), s"id=${r.getInt(0)}")
      else {
        val n = r.getSeq[org.apache.spark.sql.Row](1)
          .map(x => (x.getLong(0), x.getLong(1)))
        val e = r.getSeq[org.apache.spark.sql.Row](2)
          .map(x => (x.getLong(0), x.getLong(1)))
        assert(n == e, s"id=${r.getInt(0)}")
      }
    }
  }

  test("CosineSim matches the HOF formulation bit-for-bit") {
    import graft.functions.CosineSim
    import org.apache.spark.sql.Column
    // the exact aggregate/zip_with/transform folds the similarity family
    // used before the native expression replaced them — the parity
    // oracle (element order and arithmetic must be identical, not just
    // close: the driver gate hashes d9/d10/d12/d14/d22 outputs)
    def hofDot(a: Column, b: Column): Column =
      aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)
    def hofNorm(a: Column): Column =
      sqrt(aggregate(transform(a, x => x * x), lit(0.0), (acc, x) => acc + x))
    val e = graft.Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    val probe = e.filter(col("vec_id") === 0).select(col("v").as("qv"))
    val rows = e.crossJoin(broadcast(probe))
      .select(col("vec_id"), CosineSim(col("v"), col("qv")).as("native"),
        (hofDot(col("v"), col("qv")) /
          (hofNorm(col("v")) * hofNorm(col("qv")))).as("ref"))
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(java.lang.Double.doubleToLongBits(r.getDouble(1)) ==
        java.lang.Double.doubleToLongBits(r.getDouble(2)),
        s"cosine mismatch vec_id=${r.getLong(0)}")
    }
  }

  test("CosineSim edge cases: zero vector, length mismatch, null element") {
    import spark.implicits._
    import graft.functions.CosineSim
    val df = Seq(
      (0, Some(Seq(Some(0.0), Some(0.0))), Some(Seq(Some(1.0), Some(2.0)))),
      (1, Some(Seq(Some(1.0))), Some(Seq(Some(1.0), Some(2.0)))), // mismatch
      (2, Some(Seq(Some(1.0), None)), Some(Seq(Some(1.0), Some(2.0)))),
      (3, None: Option[Seq[Option[Double]]], Some(Seq(Some(1.0)))))
      .toDF("id", "a", "b")
      .select($"id", CosineSim($"a", $"b").as("c"))
    val got = df.collect().map(r =>
      r.getInt(0) -> (if (r.isNullAt(1)) None else Some(r.getDouble(1)))).toMap
    assert(got(0).exists(_.isNaN), "zero vector → 0/0 = NaN, like the HOFs")
    assert(got(1).isEmpty, "length mismatch → null, like zip_with padding")
    assert(got(2).isEmpty, "null element must poison the result")
    assert(got(3).isEmpty)
  }

  test("MinHashSigs matches the per-signature array_min(transform) folds") {
    import spark.implicits._
    import graft.functions.{MinHashSigs, ShingleHashes}
    val m = ShingleHashes.M
    // the exact HOF formulation bandRows used before the native
    // expression — exact long arithmetic, so equality is literal
    val rnd = new scala.util.Random(11)
    val rows = (0 until 200).map { i =>
      (i, Seq.fill(1 + rnd.nextInt(40))(rnd.nextLong().abs % m))
    }
    val refCols = (0 until MinHashSigs.NumHashes).map { s =>
      array_min(transform($"hs",
        h => (h * MinHashSigs.PermA(s) + MinHashSigs.PermB(s)) % m)).as(s"r$s")
    }
    val got = rows.toDF("id", "hs")
      .select(col("id") +: MinHashSigs($"hs").as("native") +: refCols: _*)
      .collect()
    got.foreach { r =>
      val native = r.getSeq[Long](1)
      (0 until MinHashSigs.NumHashes).foreach { s =>
        assert(native(s) == r.getLong(2 + s), s"id=${r.getInt(0)} sig=$s")
      }
    }
    // edge cases: empty array and null-only array → null (array_min
    // would yield a null per signature); null elements are skipped
    val edge = Seq(
      (0, Some(Seq.empty[Option[Long]])),
      (1, Some(Seq(None: Option[Long]))),
      (2, Some(Seq(Some(7L), None))),
      (3, None: Option[Seq[Option[Long]]]))
      .toDF("id", "hs").select($"id", MinHashSigs($"hs").as("n")).collect()
      .map(r => r.getInt(0) -> r.isNullAt(1)).toMap
    assert(edge(0) && edge(1) && edge(3))
    assert(!edge(2), "null elements are skipped, not poisoning")
  }

  test("QuantError edge cases: zero vector, empty array, null element") {
    import spark.implicits._
    import graft.functions.QuantError
    val df = Seq(
      (0, Some(Seq(Some(0.0), Some(0.0)))),       // all-zero → scale 0, err 0
      (1, Some(Seq.empty[Option[Double]])),       // empty → scale 0, err 0
      (2, Some(Seq(Some(1.0), None))),            // null element → null result
      (3, None: Option[Seq[Option[Double]]]))     // null array → null result
      .toDF("id", "v")
      .select($"id", QuantError($"v").as("q"))
    val got = df.collect().map(r =>
      r.getInt(0) -> (if (r.isNullAt(1)) None
                      else Some((r.getStruct(1).getDouble(0),
                                 r.getStruct(1).getDouble(1))))).toMap
    assert(got(0).contains((0.0, 0.0)))
    assert(got(1).contains((0.0, 0.0)))
    assert(got(2).isEmpty, "null element must poison the result")
    assert(got(3).isEmpty)
  }

  test("BloomFilters build→serialize→probe: no false negatives, fpp holds") {
    import spark.implicits._
    import graft.functions.BloomFilters
    // the build (stat.bloomFilter putLong) and the probe (Catalyst
    // BloomFilterMightContain mightContainLong) are separate code paths
    // agreeing only by hashing-scheme convention — this pins it. A
    // single false negative would make the d43 prefilter drop a real
    // contamination match.
    val members = (0L until 2000L).map(i => i * 7919L + 11L)
    val df = members.toDF("v")
    val bytes = BloomFilters.buildLong(df, "v", 2000L, 0.01)
    val kept = df.filter(BloomFilters.mightContainLong(bytes, col("v"))).count()
    assert(kept == 2000L, "bloom prefilter dropped a member (false negative)")
    // ...and it actually filters: non-members pass at ~fpp, not ~1
    val non = (0L until 2000L).map(i => i * 7919L + 3L).toDF("v")
    val fp = non.filter(BloomFilters.mightContainLong(bytes, col("v"))).count()
    assert(fp < 200L, s"false-positive rate ${fp / 2000.0} far above fpp=0.01")
    // a zero-row build (day-one incremental run) serializes cleanly and
    // probes false for everything — stat.bloomFilter alone would NPE
    val emptyBytes = BloomFilters.buildLong(
      df.limit(0), "v", 0L, 0.01)
    val anyHit = df.filter(
      BloomFilters.mightContainLong(emptyBytes, col("v"))).count()
    assert(anyHit == 0L, "empty bloom filter must match nothing")
  }

  test("CmsSketch build→serialize→probe: never underestimates, stays tight") {
    import spark.implicits._
    import graft.functions.CmsSketch
    // build (stat.countMinSketch addLong) and probe (CmsEstimate →
    // estimateCount) are separate code paths agreeing by hashing-scheme
    // convention. A single UNDERestimate would let d71's prefilter drop
    // a true heavy hitter — the one error CMS must never make.
    val rows = (0L until 50L).flatMap(v => Seq.fill(v.toInt + 1)(v * 7919L + 11L))
    val df = rows.toDF("v")
    val bytes = CmsSketch.serialize(CmsSketch.buildLong(df, "v", 0.001, 0.99, 42))
    val est = df.distinct()
      .select(col("v"), CmsSketch.estimateLong(bytes, col("v")).as("e"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val truth = rows.groupBy(identity).map { case (v, g) => (v, g.size.toLong) }
    truth.foreach { case (v, n) =>
      assert(est(v) >= n, s"CMS underestimated $v: ${est(v)} < $n")
      // ε=0.001 over 1275 inserts ⇒ expected overshoot ≈ 1 — allow slack
      assert(est(v) <= n + 50, s"CMS estimate for $v wildly loose: ${est(v)} vs $n")
    }
    // totalCount is the exact insert count (d71 derives N from it)
    assert(CmsSketch.buildLong(df, "v", 0.001, 0.99, 42).totalCount() == rows.size)
    // null value probes null, not a crash or a phantom count
    val withNull = spark.sql("SELECT CAST(NULL AS BIGINT) AS v")
    assert(withNull.select(CmsSketch.estimateLong(bytes, col("v")))
      .collect().head.isNullAt(0))
  }

  test("property: TopKHeap keeps exactly the k best under random " +
      "inserts, splits, and merges") {
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    import org.scalacheck.Prop.forAll
    import graft.functions.TopKHeap
    // Include the special-float regimes (-0.0 ties 0.0; NaN sorts
    // GREATEST, i.e. rank-first under score DESC — Spark/DuckDB SQL
    // ordering) alongside the heavy-tie finite scores.
    val scoreGen = Gen.frequency(
      (8, Gen.chooseNum(0, 9).map(_ / 2.0)), // few scores → heavy ties
      (1, Gen.oneOf(0.0, -0.0)),
      (1, Gen.const(Double.NaN)))
    val entryGen = for {
      s <- scoreGen
      t <- Gen.chooseNum(0L, 1000L)
    } yield (s, t)
    val caseGen = for {
      n <- Gen.chooseNum(0, 120)
      es <- Gen.listOfN(n, entryGen)
      k <- Gen.chooseNum(1, 12)
      cut <- Gen.chooseNum(0, n)
    } yield (es, k, cut)
    // canonical score key: -0.0 → 0.0, all NaN bit patterns → one NaN —
    // the equivalence classes of TopKHeap.compareScores
    def canon(s: Double): Long = java.lang.Double.doubleToLongBits(s + 0.0)
    def refOrder(a: (Double, Long), b: (Double, Long)): Boolean = {
      val c = TopKHeap.compareScores(a._1, b._1)
      if (c != 0) c > 0 else a._2 < b._2
    }
    def ref(es: Seq[(Double, Long)], k: Int): Seq[(Double, Long)] =
      es.sortWith(refOrder).take(k)
    val prop = forAll(caseGen) { case (es0, k, cut) =>
      // distinct (score, tie) pairs UNDER THE HEAP'S ORDER (so 0.0 and
      // -0.0 with the same tie count once): the heap's order is total
      // on them, so duplicates would make "the" top-k ambiguous
      val es = es0.groupBy { case (s, t) => (canon(s), t) }
        .map(_._2.head).toSeq
      val payload = es.map { case (s, t) => (s, t, s"p$s:$t") }
      // split at an arbitrary point, fill two heaps, merge — the
      // partial-aggregation path the executor actually runs
      val (l, r) = payload.splitAt(math.min(cut, payload.length))
      val h1 = new TopKHeap(k); val h2 = new TopKHeap(k)
      l.foreach { case (s, t, p) => h1.offer(s, t, () => p) }
      r.foreach { case (s, t, p) => h2.offer(s, t, () => p) }
      h2.foreach((s, t, p) => h1.offer(s, t, () => p))
      val got = h1.sortedPayloads.toSeq
      val want = ref(es, k).map { case (s, t) => s"p$s:$t" }
      Prop(got == want) :| s"got $got want $want"
    }
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(300), prop)
    assert(res.passed, s"TopKHeap property failed: ${res.status}")
  }

  test("TopKByScore equals the window-rank idiom on multi-partition " +
      "input with duplicate scores") {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val rnd = new scala.util.Random(7)
    // few distinct scores → heavy ties, exercised across 13 partitions
    // so merge() and serialize()/deserialize() are on the hot path
    val rows = (0 until 5000).map { i =>
      (i % 4, rnd.nextInt(40) / 10.0, i.toLong, s"p$i")
    }
    val df = rows.toDF("g", "score", "tie", "pay").repartition(13)
    val k = 7
    val got = df.groupBy("g")
      .agg(graft.functions.TopKByScore.topk(k,
        col("score"), col("tie"), col("pay")).as("top"))
      .select(col("g"), posexplode(col("top")).as(Seq("rk", "pay")))
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getString(2))).toSet
    val want = df.withColumn("rk", row_number().over(
        Window.partitionBy("g").orderBy(col("score").desc, col("tie"))))
      .filter(col("rk") <= k)
      .collect()
      .map(r => (r.getAs[Int]("g"), r.getAs[Int]("rk") - 1,
        r.getAs[String]("pay"))).toSet
    assert(got == want)
  }

  test("TopKByScore edge cases: k > group size, NULL scores skipped, " +
      "SQL registration with literal k") {
    import spark.implicits._
    val df = Seq(
      (1, Some(0.5), 1L, "a"), (1, None, 2L, "skipnull"),
      (1, Some(0.9), 3L, "b"),
      (2, Some(0.1), 4L, "c"))
      .toDF("g", "score", "tie", "pay")
    val out = df.groupBy("g")
      .agg(graft.functions.TopKByScore.topk(10,
        col("score"), col("tie"), col("pay")).as("top"))
      .collect().map(r => r.getInt(0) -> r.getSeq[String](1)).toMap
    assert(out(1) == Seq("b", "a")) // null-scored row skipped
    assert(out(2) == Seq("c"))      // k far larger than the group
    graft.functions.GraftFunctions.register(spark)
    df.createOrReplaceTempView("topk_in")
    val viaSql = spark.sql(
      """SELECT g, graft_topk_by_score(2, score, tie, pay) AS top
         FROM topk_in GROUP BY g ORDER BY g""")
      .collect().map(_.getSeq[String](1))
    assert(viaSql(0) == Seq("b", "a") && viaSql(1) == Seq("c"))
    val err = intercept[Exception] {
      spark.sql("SELECT graft_topk_by_score(tie, score, tie, pay) FROM topk_in")
        .collect()
    }
    assert(err.getMessage.contains("literal integer"))
  }
}
