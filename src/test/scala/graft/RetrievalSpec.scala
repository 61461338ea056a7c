package graft

import graft.operators.InvertedIndex

/** The interactive retrieve() entry point must agree with set algebra
  * computed from the inverted index, for ad-hoc queries outside the
  * fixed workload. */
class RetrievalSpec extends SparkSpecBase {
  import spark.implicits._

  private def docsOf(term: String): Set[Long] =
    InvertedIndex.retrieve(spark, sfDir, term)
      .select("docs").as[Seq[Long]].head().toSet

  test("AND is intersection, OR is union of single-term results") {
    val a = docsOf("spark")
    val b = docsOf("join")
    val and = InvertedIndex.retrieve(spark, sfDir, "spark join AND")
      .select("docs").as[Seq[Long]].head().toSet
    val or = InvertedIndex.retrieve(spark, sfDir, "spark join OR")
      .select("docs").as[Seq[Long]].head().toSet
    assert(and == (a intersect b))
    assert(or == (a union b))
    assert(and.nonEmpty && or.size >= a.size)
  }

  test("unknown terms yield empty sets, not errors") {
    val r = InvertedIndex.retrieve(spark, sfDir, "zzzunknown spark AND")
      .select("n_docs").as[Int].head()
    assert(r == 0)
  }

  test("malformed postfix queries are rejected") {
    intercept[IllegalArgumentException] {
      InvertedIndex.retrieve(spark, sfDir, "spark join")
    }
  }

  test("interactive rank() agrees with the gate workload's slice") {
    val q = InvertedIndex.RANK_QUERIES.head
    val gate = InvertedIndex.bm25Rank(spark, sfDir)
      .filter($"query" === q)
      .select("doc_id", "score", "rank").collect().toSeq
    val solo = InvertedIndex.rank(spark, sfDir, q)
      .select("doc_id", "score", "rank").collect().toSeq
    assert(solo == gate && solo.nonEmpty)
  }

  test("BM25 ranking is sound: descending scores, hits contain a term") {
    val rows = InvertedIndex.bm25Rank(spark, sfDir)
      .select("query", "doc_id", "score", "rank")
      .as[(String, Long, Double, Int)].collect().toSeq
    assert(rows.nonEmpty)
    rows.groupBy(_._1).foreach { case (_, rs) =>
      val byRank = rs.sortBy(_._4)
      assert(byRank.map(_._4) == (1 to byRank.size))
      assert(byRank.map(_._3) == byRank.map(_._3).sorted.reverse)
    }
    // Every ranked doc must be retrievable by the boolean OR of the
    // query's terms — ranking never invents a hit.
    val q = InvertedIndex.RANK_QUERIES.head
    val orQuery = q.split(" ").mkString(" ") + " OR" * (q.split(" ").length - 1)
    val hits = InvertedIndex.retrieve(spark, sfDir, orQuery)
      .select("docs").as[Seq[Long]].head().toSet
    rows.filter(_._1 == q).foreach { case (_, doc, _, _) =>
      assert(hits.contains(doc))
    }
  }

  test("Lucene-form IDF keeps stop-word-heavy query scores positive") {
    val rows = InvertedIndex.rank(spark, sfDir, "the a spark")
      .select("score").as[Double].collect()
    assert(rows.nonEmpty && rows.forall(_ > 0.0))
  }
}
