package graft.tools

import graft.operators.Similarity
import org.apache.spark.sql.functions._

/** Throwaway calibration probe for the corpus-scaled IVF geometry:
  * recall@[[Similarity.IVF_TOP_K]] of the trained serving path vs the
  * exact baseline over a (k, nprobe) grid at the SPARK_GRAFT_SF_DIR
  * corpus. Run at each fixture scale to pick [[Similarity.ivfGeometry]]'s
  * constants; the gate (`ann_recall`) then records the chosen point as
  * a value and SimilaritySpec pins its floor. */
object IvfGeomProbe {
  def main(args: Array[String]): Unit = {
    val (spark, sfDir) = ToolSession.build()
    val truth = Similarity.cosineTopk(spark, sfDir)
      .filter(col("rank") <= Similarity.IVF_TOP_K)
      .select(col("query_id"), col("vec_id"))
      .localCheckpoint()
    val total = truth.count()
    val n = graft.Tables.embeddings(spark, sfDir).count()
    println(s"[ivfgeom] corpus n=$n, truth rows=$total")
    val ks = args.headOption.map(_.split(",").map(_.toInt).toSeq)
      .getOrElse(Seq(16, 23, 32, 45, 64, 90))
    val nprobes = args.drop(1).headOption.map(_.split(",").map(_.toInt).toSeq)
      .getOrElse(Seq(2, 3, 4, 6, 8, 12, 16))
    for (k <- ks; np <- nprobes if np <= k) {
      val approx = Similarity.annIvfTrainedAt(spark, sfDir, k, np)
        .select(col("query_id"), col("vec_id"))
      val hits = truth.join(approx, Seq("query_id", "vec_id"), "left_semi").count()
      println(f"[ivfgeom] k=$k%4d nprobe=$np%3d frac=${np.toDouble / k}%.3f " +
        f"recall=${hits.toDouble / total}%.4f")
    }
    spark.stop()
  }
}
