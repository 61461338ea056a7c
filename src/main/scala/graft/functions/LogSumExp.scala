package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Numerically-stable log-space sum: logSumExp(x₁..xₙ) =
  * m + log(Σ exp(xᵢ − m)) with m = max xᵢ — the reference's `sumProbs`
  * log-add (`RunPersonalizedPageRankBasic.java:79-91`), generalized to
  * an n-ary aggregate. SURVEY §4.12 keeps rank math in linear space;
  * this [[Aggregator]] is the documented optional custom piece
  * (§2.11) for workloads whose magnitudes would underflow a linear
  * `sum` — registered via `functions.udaf` so it composes with
  * `groupBy(...).agg(...)` like any built-in.
  *
  * The merge is associative and commutative (max-reparametrization),
  * so partial aggregation (map-side combine) stays correct.
  */
object LogSumExp extends Aggregator[Double, (Double, Double), Double] {

  /** (runningMax, Σ exp(x − runningMax)); zero = (−∞, 0) ⇒ log(0). */
  def zero: (Double, Double) = (Double.NegativeInfinity, 0.0)

  def reduce(b: (Double, Double), x: Double): (Double, Double) =
    merge(b, (x, 1.0))

  def merge(a: (Double, Double), b: (Double, Double)): (Double, Double) = {
    val (ma, sa) = a
    val (mb, sb) = b
    if (sa == 0.0) b
    else if (sb == 0.0) a
    // Equal maxima first — also covers ma = mb = −∞ (all-−∞ groups),
    // where exp(mb − ma) = exp(NaN) would poison the sum.
    else if (ma == mb) (ma, sa + sb)
    else if (ma > mb) (ma, sa + sb * math.exp(mb - ma))
    else (mb, sb + sa * math.exp(ma - mb))
  }

  def finish(r: (Double, Double)): Double =
    if (r._2 == 0.0) Double.NegativeInfinity else r._1 + math.log(r._2)

  def bufferEncoder: Encoder[(Double, Double)] =
    Encoders.tuple(Encoders.scalaDouble, Encoders.scalaDouble)
  def outputEncoder: Encoder[Double] = Encoders.scalaDouble
}
