package graft.functions

import java.io.{ByteArrayOutputStream, DataOutputStream}
import java.nio.ByteBuffer
import java.util.{Comparator, PriorityQueue}

import org.apache.spark.sql.{Column, GraftColumns}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType, StructField, StructType}

/** BOUNDED TOP-K as a native aggregate — the scale-correct form of
  * "per-key top-k by score".
  *
  * The window idiom (`row_number() OVER (PARTITION BY key ORDER BY
  * score DESC)` then `rk <= k`) is correct but shuffles EVERY scored
  * row into the key's partition before discarding all but k: with few
  * keys (d111's 16 probes) that is a data-sized, low-parallelism
  * exchange, and with a hot key it is a straggler. This aggregate keeps
  * a bounded heap of the k best (score DESC, tie ASC) rows per
  * (group, map partition): partial aggregation runs map-side, so the
  * exchange moves at most k·mapPartitions rows per group — never the
  * corpus — and the post-shuffle merge is a k-way heap union. The
  * output is the payload array in final rank order, so
  * `posexplode(...)` recovers (rank, payload) exactly as the window
  * idiom would have produced them.
  *
  * Semantics pinned by `FunctionsSpec`: equality with the window idiom
  * under multi-partition inputs, duplicate scores (tie column decides,
  * ascending), k larger than the group, and NULL scores (skipped —
  * a NULL score is "no similarity computed", not "best" or "worst").
  *
  * An imperative aggregate plans as `ObjectHashAggregate`; the heap
  * update is O(log k) per row and the serialized buffer is k rows of
  * (double, long, payload) — KBs at the k this library uses.
  */
case class TopKByScore(
    k: Int,
    score: Expression,
    tie: Expression,
    payload: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TopKHeap] {

  require(k > 0, s"graft_topk_by_score: k must be positive, got $k")

  override def children: Seq[Expression] = Seq(score, tie, payload)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(payload.dataType, payload.nullable)
  override def prettyName: String = "graft_topk_by_score"

  override def checkInputDataTypes(): TypeCheckResult =
    if (score.dataType != DoubleType)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName: score must be DOUBLE, got ${score.dataType.sql}")
    else if (tie.dataType != LongType)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName: tie must be BIGINT, got ${tie.dataType.sql}")
    else TypeCheckResult.TypeCheckSuccess

  override def createAggregationBuffer(): TopKHeap = new TopKHeap(k)

  override def update(buf: TopKHeap, input: InternalRow): TopKHeap = {
    val s = score.eval(input)
    val t = tie.eval(input)
    // NULL score → unranked row, skipped; NULL tie would make the order
    // nondeterministic, so it is skipped for the same reason.
    if (s != null && t != null) {
      // Copy only when the row will actually be kept: the payload may
      // point into a reused scan buffer.
      buf.offer(s.asInstanceOf[Double], t.asInstanceOf[Long],
        () => InternalRow.copyValue(payload.eval(input)))
    }
    buf
  }

  override def merge(buf: TopKHeap, other: TopKHeap): TopKHeap = {
    other.foreach((s, t, p) => buf.offer(s, t, () => p))
    buf
  }

  override def eval(buf: TopKHeap): Any =
    new GenericArrayData(buf.sortedPayloads)

  // Depend only on payload.dataType — computed once per expression
  // instance, not once per group per partial flush. The projection is
  // codegen'd, hence @transient (rebuilt lazily on each executor).
  private lazy val rowSchema = StructType(Seq(
    StructField("s", DoubleType, nullable = false),
    StructField("t", LongType, nullable = false),
    StructField("p", payload.dataType, nullable = true)))
  @transient private lazy val serProj = UnsafeProjection.create(rowSchema)

  override def serialize(buf: TopKHeap): Array[Byte] = {
    val proj = serProj
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    val row = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(3)
    buf.foreach { (s, t, p) =>
      row.update(0, s); row.update(1, t); row.update(2, p)
      val u = proj(row)
      out.writeInt(u.getSizeInBytes)
      u.writeToStream(out, null)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): TopKHeap = {
    val buf = new TopKHeap(k)
    val in = ByteBuffer.wrap(bytes)
    val n = in.getInt
    val dt = payload.dataType
    var i = 0
    while (i < n) {
      val len = in.getInt
      val arr = new Array[Byte](len)
      in.get(arr)
      val u = new UnsafeRow(3)
      u.pointTo(arr, len)
      // Each entry owns its freshly-read byte array, so the extracted
      // payload needs no further copy.
      buf.offer(u.getDouble(0), u.getLong(1), () => u.get(2, dt))
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKByScore =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKByScore =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): TopKByScore =
    copy(score = newChildren(0), tie = newChildren(1),
      payload = newChildren(2))
}

object TopKByScore {
  /** Column-API entry: `topk(k, score, tie, payload)` → the payloads of
    * the group's k best rows by (score DESC, tie ASC), in rank order. */
  def topk(k: Int, score: Column, tie: Column, payload: Column): Column =
    GraftColumns.column(TopKByScore(k,
      GraftColumns.expression(score), GraftColumns.expression(tie),
      GraftColumns.expression(payload)).toAggregateExpression())
}

/** The bounded heap buffer: holds at most k entries, worst at the head
  * (lowest score; among equal scores, LARGEST tie — tie ASC is better),
  * so an incoming row either beats the head in O(log k) or is dropped
  * in O(1). Payloads are passed as thunks so losers are never copied. */
final class TopKHeap(k: Int) {
  private final class Entry(val s: Double, val t: Long, val p: Any)
  private val worstFirst = new Comparator[Entry] {
    override def compare(a: Entry, b: Entry): Int = {
      val c = TopKHeap.compareScores(a.s, b.s)
      if (c != 0) c else java.lang.Long.compare(b.t, a.t)
    }
  }
  private val heap = new PriorityQueue[Entry](k, worstFirst)

  def size: Int = heap.size

  def offer(s: Double, t: Long, p: () => Any): Unit =
    if (heap.size < k) heap.add(new Entry(s, t, p()))
    else {
      val w = heap.peek()
      val c = TopKHeap.compareScores(s, w.s)
      if (c > 0 || (c == 0 && t < w.t)) {
        heap.poll()
        heap.add(new Entry(s, t, p()))
      }
    }

  def foreach(f: (Double, Long, Any) => Unit): Unit = {
    val it = heap.iterator()
    while (it.hasNext) { val e = it.next(); f(e.s, e.t, e.p) }
  }

  /** Payloads in final rank order: score DESC, tie ASC. */
  def sortedPayloads: Array[Any] = {
    val arr = heap.toArray(new Array[Entry](heap.size))
    java.util.Arrays.sort(arr, worstFirst.reversed())
    arr.map(_.p)
  }
}

object TopKHeap {
  /** ONE score ordering for both the heap comparator and the full-heap
    * acceptance test, with Spark/DuckDB SQL semantics (SQLOrderingUtil):
    * -0.0 == 0.0 (primitive `==` ties them; the tie column decides) and
    * NaN sorts GREATER than everything (so a NaN score ranks first under
    * score DESC, exactly as `row_number() OVER (ORDER BY s DESC)` would),
    * where `java.lang.Double.compare` would order -0.0 < 0.0 and was
    * previously inconsistent with the primitive-compare acceptance test. */
  def compareScores(x: Double, y: Double): Int =
    if (x < y) -1
    else if (x > y) 1
    else if (x == y) 0 // covers -0.0 vs 0.0
    else if (java.lang.Double.isNaN(x)) { if (java.lang.Double.isNaN(y)) 0 else 1 }
    else -1
}
