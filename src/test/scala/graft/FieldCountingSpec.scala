package graft.validate

import org.apache.spark.sql.functions.col

import graft.SparkSpec

/** Unit coverage of the shared field-counting expressions and the
  * SimpleDateFormat-leniency pattern rewrite (the driver gate exercises
  * these through v20–v22; these pin the edge semantics directly). */
class FieldCountingSpec extends SparkSpec {

  private def counts(lines: Seq[String], f: org.apache.spark.sql.Column) = {
    import spark.implicits._
    lines.toDF("value").select(f.as("n")).collect().map(_.getInt(0)).toSeq
  }

  test("naive count keeps trailing empties (Python str.split parity)") {
    assert(counts(Seq("a|b|c", "a|b|", "||", ""),
      FieldCounting.naiveCount(col("value"), "|")) == Seq(3, 3, 3, 1))
  }

  test("quote-aware count treats quoted separators as data") {
    val f = FieldCounting.quoteAwareCount(col("value"), "|", "\"")
    assert(counts(Seq(
      "a|b|c",          // plain
      "a|\"b|c\"",      // quoted middle separator
      "\"x|y\"|z",      // quoted first field
      "a||b",           // empty middle field
      "|a"              // leading empty field
    ), f) == Seq(3, 2, 2, 3, 2))
  }

  test("quote-aware regex escapes regex metachars in separators") {
    // '.' as field separator must be literal, not any-char
    val f = FieldCounting.quoteAwareCount(col("value"), ".", "\"")
    assert(counts(Seq("a.b.c", "\"a.b\".c"), f) == Seq(3, 2))
  }

  test("lenientPattern collapses exactly-double width fields only") {
    assert(TypedChecks.lenientPattern("dd/MM/yyyy") == "d/M/yyyy")
    assert(TypedChecks.lenientPattern("yyyy-MM-dd HH:mm:ss") == "yyyy-M-d H:m:s")
    // month names and already-single letters untouched
    assert(TypedChecks.lenientPattern("dd MMM yyyy") == "d MMM yyyy")
    assert(TypedChecks.lenientPattern("d/M/yyyy") == "d/M/yyyy")
  }
}
