package graft.ops

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed `Dataset[T]` statistics — the user-level `Aggregator` API
  * surface (vs the repo's Catalyst-internal `TypedImperativeAggregate`
  * in `graft.functions`): case-class rows in, a case-class buffer
  * merged with the numerically stable parallel-Welford rule, product
  * encoders end to end. A library consumer extends THIS seam for
  * custom aggregations; d193 gates that the seam actually reproduces
  * the exact-moment arithmetic on real data.
  */
object TypedStats {

  /** One scored row: a grouping key and an integer measurement. */
  final case class Keyed(source: String, x: Long)

  /** Welford state: count, running mean, and the centered second
    * moment M2 = Σ(x − mean)². */
  final case class Welford(n: Long, mean: Double, m2: Double)

  /** Chan/Welford parallel variance: single-row updates are the
    * classic Welford recurrence; partition merges use the pairwise
    * rule M2 = M2a + M2b + δ²·na·nb/n — the form that stays stable
    * when one side dominates. The count products are computed in
    * DOUBLE (na·nb overflows BIGINT near 3·10⁹ rows per side). */
  object WelfordAgg extends Aggregator[Keyed, Welford, Welford] {
    override def zero: Welford = Welford(0L, 0.0, 0.0)

    override def reduce(b: Welford, r: Keyed): Welford = {
      val n1 = b.n + 1
      val d = r.x - b.mean
      val mean = b.mean + d / n1
      Welford(n1, mean, b.m2 + d * (r.x - mean))
    }

    override def merge(a: Welford, b: Welford): Welford =
      if (a.n == 0) b
      else if (b.n == 0) a
      else {
        val n = a.n + b.n
        val d = b.mean - a.mean
        Welford(n, a.mean + d * b.n / n,
          a.m2 + b.m2 + d * d * (a.n.toDouble * b.n / n))
      }

    override def finish(r: Welford): Welford = r
    override def bufferEncoder: Encoder[Welford] = Encoders.product[Welford]
    override def outputEncoder: Encoder[Welford] = Encoders.product[Welford]
  }
}
