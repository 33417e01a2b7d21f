package graft.validate

import org.apache.spark.sql.functions.col
import org.scalacheck.Gen

import graft.SparkSpec

/** Property test: for WELL-FORMED delimited lines (any mix of plain and
  * quoted fields, quoted fields may embed separators), the quote-aware
  * count equals the constructed field count and the naive count equals
  * fields + embedded separators. Random inputs run through the REAL
  * Spark expression (regexp_extract_all with the validator's pattern) in
  * one batch evaluation. */
class FieldCountingPropSpec extends SparkSpec {

  // non-empty: adjacent EMPTY fields hit the reference regex's zero-width
  // quirk (consecutive empties undercount — faithful reference behavior,
  // pinned separately in ChecksSpec golden tests, out of scope here)
  private val plainField: Gen[String] =
    Gen.nonEmptyListOf(Gen.oneOf(('a' to 'z') ++ ('0' to '9') :+ ' ' :+ '.'))
      .map(_.mkString.take(12))

  // a quoted field: may contain separators but no quotes
  private val quotedField: Gen[(String, Int)] =
    for {
      parts <- Gen.nonEmptyListOf(plainField).map(_.take(4))
    } yield ("\"" + parts.mkString("|") + "\"", parts.size - 1)

  // (rendered field, embedded separator count)
  private val field: Gen[(String, Int)] =
    Gen.oneOf(plainField.map(s => (s, 0)), quotedField)

  private val lineGen: Gen[(String, Int, Int)] =
    Gen.nonEmptyListOf(field).map(_.take(6)).map { fs =>
      val line = fs.map(_._1).mkString("|")
      (line, fs.size, fs.map(_._2).sum)
    }

  test("quote-aware and naive counts on generated well-formed lines") {
    // collect a deterministic batch of generated cases, evaluate in ONE
    // Spark job (per-case jobs would be minutes of overhead)
    val cases = Gen.listOfN(300, lineGen)
      .apply(Gen.Parameters.default.withSize(24), org.scalacheck.rng.Seed(42L))
      .get
    import spark.implicits._
    val df = cases.map { case (line, n, emb) => (line, n, emb) }
      .toDF("line", "n_fields", "n_embedded")
    val out = df.select(
      col("n_fields"), col("n_embedded"),
      FieldCounting.quoteAwareCount(col("line"), "|", "\"").as("qa"),
      FieldCounting.naiveCount(col("line"), "|").as("naive"),
      col("line")).collect()
    out.foreach { r =>
      val (expected, embedded) = (r.getInt(0), r.getInt(1))
      assert(r.getInt(2) == expected,
        s"quote-aware count of '${r.getString(4)}'")
      assert(r.getInt(3) == expected + embedded,
        s"naive count of '${r.getString(4)}'")
    }
  }
}
