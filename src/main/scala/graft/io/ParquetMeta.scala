package graft.io

import java.nio.file.{Files, Path, Paths}

import scala.jdk.CollectionConverters._

import org.apache.hadoop.conf.Configuration
import org.apache.parquet.hadoop.ParquetFileReader
import org.apache.parquet.hadoop.util.HadoopInputFile

/** Row counts from parquet FOOTER metadata — the audit-count primitive
  * for the artifact-RMW gates (optimization guide §1.2: don't compute
  * what a cheaper action answers): a count identity over files the op
  * just wrote needs the files' own committed row counts, and a parquet
  * footer carries exactly that. Reading footers is driver-side
  * O(files) metadata I/O — no Spark job, no data pages — and the pin
  * is as strong as `spark.read.parquet(p).count()`: the footer is
  * written on commit, so a torn or truncated file fails the read
  * loudly rather than under-counting. */
object ParquetMeta {

  private def footerRows(p: Path): Long = {
    val in = HadoopInputFile.fromPath(
      new org.apache.hadoop.fs.Path(p.toUri), new Configuration())
    val r = ParquetFileReader.open(in)
    try r.getRecordCount finally r.close()
  }

  /** Total committed rows across the parquet data files under each of
    * `dirs` (a bare file path also works). Only `part-*` data files
    * count — `_SUCCESS`, `_spark_metadata`, and checksum side files are
    * skipped, matching what a Spark scan of the directory reads. */
  def rowCount(dirs: String*): Long = dirs.iterator.map { d =>
    val root = Paths.get(d)
    if (Files.isRegularFile(root)) footerRows(root)
    else {
      val s = Files.walk(root)
      try s.iterator().asScala
        .filter(p => Files.isRegularFile(p) &&
          p.getFileName.toString.startsWith("part-") &&
          p.getFileName.toString.endsWith(".parquet"))
        .map(footerRows).sum
      finally s.close()
    }
  }.sum
}
