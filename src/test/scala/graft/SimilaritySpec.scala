package graft

import graft.operators.Similarity
import org.apache.spark.sql.functions._

/** The interactive serving entry point must agree with the fixed
  * workload query on the query vector they share (vec_id 0 is in every
  * stride workload). */
class SimilaritySpec extends SparkSpecBase {
  import spark.implicits._

  test("nearestTo(0, k) equals cosine_topk's rows for query_id 0") {
    val fromWorkload = Similarity.cosineTopk(spark, sfDir)
      .filter(col("query_id") === 0L)
      .select(col("vec_id"), col("cosine"))
      .as[(Long, Double)].collect().toSeq
    val interactive = Similarity.nearestTo(spark, sfDir, 0L, Similarity.TOP_K)
      .as[(Long, Double)].collect().toSeq
    assert(interactive == fromWorkload)
    assert(interactive.size == Similarity.TOP_K)
  }

  test("nearestTo ranks by cosine descending with vec_id tiebreak") {
    val rows = Similarity.nearestTo(spark, sfDir, 1L, 10)
      .as[(Long, Double)].collect().toSeq
    assert(rows.size == 10)
    assert(rows.sliding(2).forall { case Seq((idA, cA), (idB, cB)) =>
      cA > cB || (cA == cB && idA < idB)
    })
  }
}
