package graft.functions

import java.io.ByteArrayOutputStream

import org.apache.spark.sql.{Column, DataFrame, GraftColumns}
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
import org.apache.spark.sql.types.BinaryType
import org.apache.spark.util.sketch.BloomFilter

/** Bloom-filter build/probe helpers for semi-join prefilters.
  *
  * The scale pattern: when the "small" side of a semi-join is too big to
  * broadcast as ROWS (an eval suite's 10^8 shingle hashes ≈ GBs) but its
  * bloom SKETCH is not (~1.2 bytes/item at 1 % fpp), probing the sketch
  * on the big side BEFORE the shuffle cuts the exchange to the rows that
  * can possibly match. No false negatives means a downstream exact join
  * restores exact semantics — the sketch changes the plan, never the
  * answer. Spark's own `InjectRuntimeFilter` applies the same idea but
  * only when its size/selectivity heuristics fire; this makes it an
  * explicit, testable library capability (used by
  * [[graft.ops.FuzzyDedup.d43BloomDecontaminate]]).
  *
  * Build and probe must agree on the hashing scheme: both sides here go
  * through `putLong`/`mightContainLong` on the same
  * `org.apache.spark.util.sketch.BloomFilter` implementation —
  * `DataFrameStatFunctions.bloomFilter` inserts long columns with
  * `putLong`, and Catalyst's `BloomFilterMightContain` probes with
  * `mightContainLong` (codegen'd). `FunctionsSpec` pins the
  * no-false-negative contract across the build→serialize→probe path.
  */
object BloomFilters {

  /** Distributed bloom-filter build over a LONG column, serialized for
    * embedding as a literal. The aggregation runs as a Spark job (the
    * driver receives only the merged sketch bytes, never rows).
    *
    * `expectedItems <= 0` (a zero-row build side — day one of an
    * incremental pipeline) returns an explicitly-created empty filter:
    * `stat.bloomFilter` over zero rows yields a sketch whose bit buffer
    * was never allocated and NPEs on serialization, while an empty
    * filter with real (all-zero) bits probes false for every value —
    * exactly "nothing is in the empty set". */
  def buildLong(df: DataFrame, colName: String, expectedItems: Long,
      fpp: Double): Array[Byte] =
    serialize(
      if (expectedItems <= 0L) BloomFilter.create(1L, fpp)
      else df.stat.bloomFilter(colName, expectedItems, fpp))

  def serialize(bf: BloomFilter): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    bf.writeTo(bos)
    bos.toByteArray
  }

  /** `mightContainLong` probe as a codegen'd Catalyst predicate; the
    * serialized filter rides into the task as a foldable binary literal
    * (KBs–MBs — a sketch, not data). */
  def mightContainLong(filter: Array[Byte], value: Column): Column =
    GraftColumns.column(BloomFilterMightContain(
      Literal(filter, BinaryType), GraftColumns.expression(value)))
}
