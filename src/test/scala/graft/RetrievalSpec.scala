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
}
