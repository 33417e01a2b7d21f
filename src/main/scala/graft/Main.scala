package graft

import org.apache.spark.sql.SparkSession

import graft.meta.MetadataCompiler
import graft.validate.TableValidator

/** CLI entry point — same run contract as the reference
  * (`spark-submit ... big_data_validator.py <TABLE_NAME>` with the
  * `inputs/<T>.csv` + `metadata/csv/<T>_metadata.csv` directory
  * conventions, `/root/reference/README.md:3-17,32-33`):
  *
  * {{{ graft.Main <baseDir> <tableName> }}}
  *
  * Exit 0 + "validation success" when all checks pass; exit 1 +
  * "validation failed!" otherwise (corrupt rows land in
  * `<baseDir>/inputs/VALIDATION/<T>_TMP/`, typed-violation rows in
  * `<T>_TMP_TYPED/`, both snappy parquet). Beyond the reference, the
  * run also ENFORCES the metadata-declared types (the reference only
  * declared them) — per-column `typed:*` lines in the report.
  */
object Main {

  /** The full validation run, session-managed by the caller (testable —
    * no sys.exit, no session lifecycle). Returns the process exit code. */
  def run(spark: SparkSession, baseDir: String, table: String): Int = {
    val csvMetaPath = s"$baseDir/metadata/csv/${table}_metadata.csv"
    // Keep the JSON IR materialization for fixture compatibility
    // (compile CSV → metadata/json/... , then load), like the reference's
    // read_metadata_json (`base_data_validation.py:40-48`).
    val jsonPath = MetadataCompiler.compileToJsonFile(csvMetaPath)
    val meta = MetadataCompiler.fromJson(
      java.nio.file.Files.readString(java.nio.file.Paths.get(jsonPath)))

    val v = new TableValidator(
      spark, meta,
      tablePath = s"$baseDir/inputs/$table.csv",
      badRowPath = s"$baseDir/inputs/VALIDATION/${table}_TMP/")
    val results = v.performValidation()
    results.foreach(r =>
      println(f"${r.check}%-28s ${if (r.passed) "PASS" else "FAIL"}%-5s " +
        s"failed=${r.failedCount} ${r.detail}"))
    if (results.forall(_.passed)) { println("validation success"); 0 }
    else { println("validation failed!"); 1 }
  }

  def main(args: Array[String]): Unit = {
    if (args.length < 2) {
      System.err.println("usage: graft.Main <baseDir> <tableName>")
      System.err.println("The table is not provided")
      sys.exit(2)
    }
    val Array(baseDir, table) = args.take(2)
    val spark = SparkSession.builder()
      .appName("graft-validator")
      // default for direct `runMain`; spark-submit's --master overrides
      .master(sys.env.getOrElse("SPARK_GRAFT_MASTER",
        s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]"))
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val code =
      try run(spark, baseDir, table)
      finally spark.stop()
    if (code != 0) sys.exit(code)
  }
}
