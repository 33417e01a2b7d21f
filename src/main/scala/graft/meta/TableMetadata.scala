package graft.meta

import org.apache.spark.sql.types._

/** One column declaration from the metadata descriptor.
  *
  * Mirrors the reference's per-column dict
  * (`/root/reference/bigDataValidator/validator/metadata_csv_to_json.py:30-38`):
  * `{ColumnName, SourceDataType, SourceDataFormat, SourceNullable}`.
  * Declared types are Oracle-flavored: VARCHAR2 | NUMBER | DATE.
  */
final case class ColumnMeta(
    name: String,
    sourceType: String,
    format: String,
    nullable: Boolean,
    rawNullable: String = null) {

  /** The SourceNullable cell as the reference's JSON carries it: the RAW
    * metadata value, passed through verbatim (`metadata_csv_to_json.py:
    * 33-37` never normalizes case). Falls back to the canonical form for
    * programmatically built metadata. */
  def nullableRaw: String =
    if (rawNullable != null) rawNullable else if (nullable) "TRUE" else "FALSE"

  /** Typed Spark target type for the declared source type.
    * VARCHAR2→String, NUMBER→Decimal(38,18) (faithful Oracle NUMBER
    * mapping, works with DecimalSeparator normalization), DATE→Date.
    * SURVEY.md §1.2. */
  def targetType: DataType = sourceType.trim.toUpperCase match {
    case "NUMBER" => DecimalType(38, 18)
    case "DATE"   => DateType
    case _        => StringType
  }
}

/** The compiled table descriptor.
  *
  * Field semantics follow the reference's JSON IR
  * (`metadata_csv_to_json.py:19-23`; golden instance
  * `metadata/json/success_metadata.json`):
  * separators are table-wide, read from the first data row only.
  * `stringSeparator` is kept RAW (it may be the multi-char literal `""""`
  * or the `nan` sentinel — reference quirks, SURVEY.md §2.6.1-2); use the
  * normalized accessors for anything operational.
  */
final case class TableMetadata(
    typeMapping: Seq[ColumnMeta],
    decimalSeparator: String,
    fieldSeparator: String,
    stringSeparator: String) {

  /** Reference quirk (`big_data_validator.py:12-18`): the literal string
    * "nan" (a pandas-era relic) maps to a backslash quote char. */
  def effectiveQuoteString: String =
    if (stringSeparator == "nan") "\\" else stringSeparator

  /** Python-truthiness of `metadata.get("StringSeparator")`
    * (`big_data_validator.py:272`): empty string → no quote handling. */
  def hasQuote: Boolean = stringSeparator != null && stringSeparator.nonEmpty

  /** The raw separator treated as a CHARACTER SET — Python `str.strip`
    * semantics; also collapses the `""""` multi-char cell to `{"}`.
    * NOTE: header stripping must use [[rawQuoteCharSet]] — the reference
    * strips the RAW metadata value (`big_data_validator.py:41`), so the
    * `nan` sentinel strips the chars {n,a}, NOT a backslash. This set
    * (with the nan→\ mapping applied) serves the CSV-reader paths. */
  def quoteCharSet: Set[Char] = effectiveQuoteString.toSet

  /** Raw char set of the metadata cell, no sentinel mapping — what the
    * reference's header normalization actually strips. */
  def rawQuoteCharSet: Set[Char] =
    if (stringSeparator == null) Set.empty else stringSeparator.toSet

  /** Single normalized quote char for the CSV reader (univocity requires
    * one char; the reference would crash here with `""""` — conscious fix,
    * SURVEY.md §2.6.1). Defaults to '"' like the reference's regex path
    * (`big_data_validator.py:224`). */
  def quoteChar: Char = effectiveQuoteString.headOption.getOrElse('"')

  def expectedColumns: Seq[String] = typeMapping.map(_.name.toUpperCase)

  /** All-string read schema over the ACTUAL header columns plus the
    * corrupt-record capture column — the reference builds the read schema
    * from the file header, not the metadata (`big_data_validator.py:105-116`),
    * so extra file columns are tolerated (superset semantics). */
  def readSchema(actualColumns: Seq[String], corruptCol: String): StructType =
    StructType(
      actualColumns.map(StructField(_, StringType, nullable = true)) :+
        StructField(corruptCol, StringType, nullable = true))

  /** Typed target schema from the declared logical types — the
    * declared-but-unenforced half of the reference's contract
    * (SURVEY.md §2.6 / §7.1 step 4). */
  def targetSchema: StructType =
    StructType(typeMapping.map(c =>
      StructField(c.name, c.targetType, c.nullable)))
}
