package graft

import graft.functions.{BoundedTopK, TopKBuffer, TopKEntry}
import graft.operators.InvertedIndex
import org.apache.spark.sql.execution.ExplainMode

/** The bounded-PQ aggregate must be interchangeable with the window
  * top-k, associative in its merge, and partially aggregated in the
  * physical plan. */
class TopKSpec extends SparkSpecBase {
  import spark.implicits._

  test("heap form equals window form on the fixture") {
    val window = InvertedIndex.topkPerGroup(spark, sfDir)
      .as[(String, Long, Long, Int)].collect().toSeq
    val heap = InvertedIndex.topkPerGroupHeap(spark, sfDir)
      .as[(String, Long, Long, Int)].collect().toSeq
    assert(heap == window)
  }

  test("merge is associative/commutative and k-bounded") {
    val agg = new BoundedTopK(3)
    val xs = Seq(TopKEntry(5, 1), TopKEntry(9, 2), TopKEntry(5, 0),
      TopKEntry(7, 4), TopKEntry(9, 9), TopKEntry(1, 3))
    val whole = xs.foldLeft(agg.zero)(agg.reduce)
    // every 2-way split, merged either direction, gives the same top-3
    (0 to xs.length).foreach { cut =>
      val (l, r) = xs.splitAt(cut)
      val bl = l.foldLeft(agg.zero)(agg.reduce)
      val br = r.foldLeft(agg.zero)(agg.reduce)
      assert(agg.merge(bl, br) == whole)
      assert(agg.merge(br, bl) == whole)
      assert(agg.merge(bl, br).entries.size <= 3)
    }
    assert(whole == TopKBuffer(Seq(TopKEntry(9, 2), TopKEntry(9, 9), TopKEntry(7, 4))))
  }

  test("heap form aggregates partial then final (map-side combine)") {
    val p = InvertedIndex.topkPerGroupHeap(spark, sfDir)
      .queryExecution.explainString(ExplainMode.fromString("formatted"))
    assert("ObjectHashAggregate".r.findAllIn(p).length >= 2
      || "SortAggregate".r.findAllIn(p).length >= 2,
      s"expected partial+final typed aggregation:\n$p")
  }
}
