package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** One top-k element: sort value + unique tiebreak. */
final case class TopKEntry(v: Long, tie: Long)

/** k-bounded buffer (a case class so `Encoders.product` serializes it
  * as a plain struct-of-array — no kryo blobs in the shuffle). */
final case class TopKBuffer(entries: Seq[TopKEntry])

/** Bounded-priority-queue top-k as a typed [[Aggregator]] — the
  * reference's per-group bounded PQ
  * (`ExtractTopPersonalizedPageRankNodes.java:58-148`) in its
  * scale-correct Spark form (SURVEY §4.11 deferred this; here it is).
  *
  * The window-function top-k (`row_number() OVER (...) <= k`) sorts
  * every group in full; this aggregate keeps only k elements per
  * partial buffer, so top-k over a billion-row group is O(n log k)
  * map-side work plus a k-sized shuffle record per partition — the
  * shape that survives 100 TB. The merge is associative and
  * commutative (combine two k-bounded buffers, keep k), so partial
  * aggregation (map-side combine) applies — TopKSpec asserts both the
  * equality with the window form and the partial/final plan shape.
  *
  * Ordering is v DESC then tie ASC — identical to the window form's
  * `ORDER BY v DESC, id`, so the two forms are interchangeable. */
class BoundedTopK(k: Int)
  extends Aggregator[TopKEntry, TopKBuffer, TopKBuffer] {

  require(k > 0, "k must be positive")

  // Explicit comparator, not Ordering.by(-v, …): negating Long.MinValue
  // overflows back to itself and would rank it as the LARGEST value.
  private val ord: Ordering[TopKEntry] = new Ordering[TopKEntry] {
    def compare(a: TopKEntry, b: TopKEntry): Int = {
      val c = java.lang.Long.compare(b.v, a.v)
      if (c != 0) c else java.lang.Long.compare(a.tie, b.tie)
    }
  }

  def zero: TopKBuffer = TopKBuffer(Vector.empty)

  def reduce(b: TopKBuffer, x: TopKEntry): TopKBuffer =
    TopKBuffer(bounded(b.entries :+ x))

  def merge(a: TopKBuffer, b: TopKBuffer): TopKBuffer =
    TopKBuffer(bounded(a.entries ++ b.entries))

  def finish(r: TopKBuffer): TopKBuffer = r

  /** Keep the k first under `ord` (largest v, then smallest tie).
    * Buffers never exceed k before a reduce/merge, so each call sorts
    * ≤ 2k elements — O(k log k) per step, O(n log k) per group. */
  private def bounded(xs: Seq[TopKEntry]): Seq[TopKEntry] =
    xs.sorted(ord).take(k)

  def bufferEncoder: Encoder[TopKBuffer] = Encoders.product[TopKBuffer]
  def outputEncoder: Encoder[TopKBuffer] = Encoders.product[TopKBuffer]
}
