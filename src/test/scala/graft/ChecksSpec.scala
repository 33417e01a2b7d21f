package graft

import java.nio.file.{Files, Path, Paths}

import graft.meta.{ColumnMeta, MetadataCompiler, TableMetadata}
import graft.validate.TableValidator

/** End-to-end validation behavior against the reference's golden fixtures
  * plus adversarial counting cases (SURVEY.md §5). */
class ChecksSpec extends SparkSpec {

  private val refBase = "/root/reference/bigDataValidator/validator"
  private def tmp(): Path = Files.createTempDirectory("graftchk")

  private def validator(tablePath: String, metaCsv: String,
      badDir: String = tmp().resolve("bad").toString): TableValidator =
    new TableValidator(spark,
      MetadataCompiler.parseCsvFile(metaCsv), tablePath, badDir)

  test("reference success fixture passes end-to-end") {
    val v = validator(s"$refBase/inputs/success.csv",
      s"$refBase/metadata/csv/success_metadata.csv")
    val results = v.performValidation()
    // typed:BIRTH_DATE is the one declared check with an enforceable type;
    // its dd/MM/yyyy values (`23/1/2002`) pass via the SimpleDateFormat-
    // lenient pattern (TypedChecks.lenientPattern)
    assert(results.map(_.check) == Seq("column_names", "field_count_quoted",
      "typed:BIRTH_DATE:type_format"))
    assert(results.forall(_.passed), results.mkString("; "))
  }

  test("tableExamples fixture fails column names (BIRH_DATE typo)") {
    val v = validator("/root/reference/tableExamples/success (1).csv",
      "/root/reference/tableExamples/success_metadata (1).csv")
    val r = v.validateColumnNames()
    assert(!r.passed)
    assert(r.detail.contains("BIRH_DATE"))
    assert(!v.validate()) // overall verdict fails
  }

  test("header normalization: quote-strip as char set + uppercase + superset") {
    val dir = tmp()
    val data = dir.resolve("t.csv")
    Files.writeString(data, "\"id\"|\"Name\"|extra\n\"1\"|\"x\"|\"y\"\n")
    val meta = TableMetadata(Seq(
      ColumnMeta("ID", "VARCHAR2", "", true),
      ColumnMeta("NAME", "VARCHAR2", "", true)), ".", "|", "\"\"\"\"")
    val v = new TableValidator(spark, meta, data.toString,
      dir.resolve("bad").toString)
    assert(v.actualColumns == Seq("ID", "NAME", "EXTRA"))
    val r = v.validateColumnNames()
    assert(r.passed) // superset: extra columns tolerated
    assert(r.detail.contains("EXTRA"))
  }

  test("header stripping with 'nan' metadata strips the raw {n,a} set") {
    // reference parity: str.strip('nan') on the header path — the nan→\
    // sentinel mapping applies only to the CSV reader's quote char
    val dir = tmp()
    val data = dir.resolve("t.csv")
    Files.writeString(data, "naidan|aCOUNTa\n1|2\n")
    val meta = TableMetadata(Seq(
      ColumnMeta("ID", "VARCHAR2", "", true),
      ColumnMeta("COUNT", "VARCHAR2", "", true)), ".", "|", "nan")
    val v = new TableValidator(spark, meta, data.toString,
      dir.resolve("bad").toString)
    assert(v.actualColumns == Seq("ID", "COUNT"))
    assert(v.validateColumnNames().passed)
  }

  test("naive field count passes on clean unquoted file") {
    val dir = tmp()
    val data = dir.resolve("t.csv")
    Files.writeString(data, "a|b|c\n1|2|3\n4|5|6\n")
    val meta = TableMetadata(Seq(
      ColumnMeta("A", "VARCHAR2", "", true),
      ColumnMeta("B", "VARCHAR2", "", true),
      ColumnMeta("C", "VARCHAR2", "", true)), ".", "|", "")
    val v = new TableValidator(spark, meta, data.toString,
      dir.resolve("bad").toString)
    assert(v.validate())
  }

  test("field-count mismatch falls back to csv reader and writes bad rows") {
    val dir = tmp()
    val data = dir.resolve("t.csv")
    // row 2 has 4 fields; unquoted metadata → naive path; csv reader also
    // sees a malformed row → corrupt record → parquet sink + FAIL
    Files.writeString(data, "a|b|c\n1|2|3\n1|2|3|4\n")
    val meta = TableMetadata(Seq(
      ColumnMeta("A", "VARCHAR2", "", true),
      ColumnMeta("B", "VARCHAR2", "", true),
      ColumnMeta("C", "VARCHAR2", "", true)), ".", "|", "")
    val bad = dir.resolve("bad").toString
    val v = new TableValidator(spark, meta, data.toString, bad)
    val results = v.performValidation()
    val fc = results.find(_.check == "field_count").get
    assert(!fc.passed)
    assert(fc.detail.contains("first offender (count=4, line=2)"))
    val badDf = spark.read.parquet(bad)
    assert(badDf.count() == 1)
    assert(badDf.columns.contains("CorruptRecCol"))
  }

  test("unnamed trailing column suppresses count mismatch (hotfix parity)") {
    val dir = tmp()
    val data = dir.resolve("t.csv")
    // header ends with a dangling separator AND a data row miscounts →
    // the fallback fires, sees the "" last-but-one schema field (after
    // the corrupt col is appended) → warn + pass
    Files.writeString(data, "a|b|\n1|2\n3|4|\n")
    val meta = TableMetadata(Seq(
      ColumnMeta("A", "VARCHAR2", "", true),
      ColumnMeta("B", "VARCHAR2", "", true)), ".", "|", "")
    val v = new TableValidator(spark, meta, data.toString,
      dir.resolve("bad").toString)
    val r = v.performValidation().find(_.check == "field_count").get
    assert(r.passed)
    assert(r.detail.contains("unnamed empty trailing column"))
  }

  test("quote-aware counts match Python re golden values") {
    // goldens computed with the reference's regex (sep=|, quote=") under
    // CPython re.findall — Java regexp_extract_all must agree
    val cases = Seq(
      "a|b|c" -> 3,
      "||" -> 2,
      "a|\"b|c\"|d" -> 3,
      "|a" -> 2,
      "a|" -> 2,
      "\"x\"\"y\"|z" -> 2,
      "\"12378687\"|\"Patricia A. (Patricia Ann)\"|\"Turner|\"23/1/2002\"" -> 3,
      "\"ID\"|\"NAME\"|\"SURNAME\"|\"BIRTH_DATE\"" -> 4)
    val dir = tmp()
    val data = dir.resolve("t.csv")
    Files.writeString(data, cases.map(_._1).mkString("\n"))
    val meta = TableMetadata(Seq(ColumnMeta("X", "VARCHAR2", "", true)),
      ".", "|", "\"")
    val v = new TableValidator(spark, meta, data.toString,
      dir.resolve("bad").toString)
    import org.apache.spark.sql.functions._
    val got = spark.read.text(data.toString)
      .select(col("value"),
        size(regexp_extract_all(col("value"), lit(v.quoteAwareRegex), lit(0)))
          .as("n"))
      .collect()
      .map(r => r.getString(0) -> r.getInt(1))
      .toMap
    cases.foreach { case (line, expected) =>
      assert(got(line) == expected, s"line <$line>")
    }
  }

  test("multiLine is gated on declared quote (scale guard)") {
    val withQuote = TableMetadata(
      Seq(ColumnMeta("A", "VARCHAR2", "", true)), ".", "|", "\"")
    val noQuote = withQuote.copy(stringSeparator = "")
    assert(withQuote.hasQuote && !noQuote.hasQuote)
  }
}
