package graft

import graft.operators.Similarity
import org.apache.spark.sql.DataFrame

/** The r21 driver-side sample trainers must be BIT-IDENTICAL to the
  * distributed k-means loops they replace under the localTrainable
  * guard: same stride init, same rounded-score assignment and
  * tie-breaks, same round(avg, 6) means — the only permitted
  * difference is member-sum order inside a mean, which round(·, 6)
  * absorbs (the ivf_kmeans_step contract). Pinned here value-by-value
  * at both fixture scales and both the fixed and corpus-scaled
  * geometry, for all three model families (coarse IVF, plain-PQ,
  * residual-PQ over the sample's own residuals). */
class LocalTrainerSpec extends SparkSpecBase {

  private def centRows(df: DataFrame): Seq[(Long, Seq[Double], Double)] =
    df.collect().map(r => (r.getLong(0), r.getSeq[Double](1), r.getDouble(2)))
      .toSeq.sortBy(_._1)

  private def bookRows(df: DataFrame): Seq[(Long, Int, Seq[Double])] =
    df.collect().map(r => (r.getLong(0), r.getInt(1), r.getSeq[Double](2)))
      .toSeq.sortBy(t => (t._2, t._1))

  private def pinEqual(dir: String, k: Int): Unit = {
    val (dc, db, drb) = Similarity.distributedTrainedModels(spark, dir, k)
    val (lc, lb, lrb) = Similarity.localTrainedModels(spark, dir, k)
    assert(centRows(lc) == centRows(dc), s"coarse codebook diverged at $dir k=$k")
    assert(bookRows(lb) == bookRows(db), s"plain PQ books diverged at $dir k=$k")
    assert(bookRows(lrb) == bookRows(drb), s"residual PQ books diverged at $dir k=$k")
  }

  test("driver trainers == distributed trainers (sf0.001, fixed k)") {
    pinEqual("/root/testdata/sf0.001", Similarity.K_CENTROIDS)
  }

  test("driver trainers == distributed trainers (sf0.001, auto k)") {
    val n = Tables.embeddings(spark, "/root/testdata/sf0.001").count()
    pinEqual("/root/testdata/sf0.001", Similarity.ivfGeometry(n)._1)
  }

  test("driver trainers == distributed trainers (sf0.01, fixed k)") {
    pinEqual("/root/testdata/sf0.01", Similarity.K_CENTROIDS)
  }

  test("driver trainers == distributed trainers (sf0.01, auto k)") {
    val n = Tables.embeddings(spark, "/root/testdata/sf0.01").count()
    pinEqual("/root/testdata/sf0.01", Similarity.ivfGeometry(n)._1)
  }
}
