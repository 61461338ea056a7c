package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Bounded Misra–Gries summary: at most k counters. */
final case class MGBuffer(m: Map[String, Long])

/** Misra–Gries heavy-hitters sketch as a typed [[Aggregator]] — the
  * "novel sketch" rung of the custom-operator ladder (brief §custom
  * operators; no reference counterpart).
  *
  * Guarantee (Agarwal et al., mergeable summaries): after any
  * reduce/merge tree over n items, every item's counter undercounts
  * its true frequency by at most n/(k+1); an item with true count
  * > n/(k+1) therefore ends with a POSITIVE counter and is in the
  * candidate set — regardless of partitioning or merge order. The
  * candidate set itself is order-dependent at the margin (ties and
  * near-threshold items may or may not appear), which is why the
  * heavy-hitters OPERATOR is two-phase: this sketch bounds the
  * candidate set to k entries per partial buffer (map-side combine,
  * O(k) shuffle records), and an EXACT recount of the candidates —
  * a semi-join, never a collect — produces the deterministic final
  * answer. The exact pass is what makes the operator DuckDB-oracle
  * checkable; the sketch is what makes it survive a 100 TB column
  * whose distinct count dwarfs memory.
  */
class MisraGries(k: Int) extends Aggregator[String, MGBuffer, MGBuffer] {

  require(k > 0, "k must be positive")

  def zero: MGBuffer = MGBuffer(Map.empty)

  def reduce(b: MGBuffer, x: String): MGBuffer = {
    val m = b.m
    if (m.contains(x)) MGBuffer(m.updated(x, m(x) + 1L))
    else if (m.size < k) MGBuffer(m.updated(x, 1L))
    else {
      // decrement-all step: drop zeros, the arriving item is absorbed
      val dec = m.view.mapValues(_ - 1L).filter(_._2 > 0L).toMap
      MGBuffer(dec)
    }
  }

  def merge(a: MGBuffer, b: MGBuffer): MGBuffer = {
    val sum = b.m.foldLeft(a.m) { case (acc, (key, c)) =>
      acc.updated(key, acc.getOrElse(key, 0L) + c)
    }
    if (sum.size <= k) MGBuffer(sum)
    else {
      // subtract the (k+1)-th largest count from everything, drop <= 0
      val d = sum.values.toSeq.sorted(Ordering[Long].reverse)(k)
      MGBuffer(sum.view.mapValues(_ - d).filter(_._2 > 0L).toMap)
    }
  }

  def finish(r: MGBuffer): MGBuffer = r

  def bufferEncoder: Encoder[MGBuffer] = Encoders.product[MGBuffer]
  def outputEncoder: Encoder[MGBuffer] = Encoders.product[MGBuffer]
}
