package graft.tools

import org.apache.spark.sql.SparkSession

/** Throwaway stage profiler for the ann_index_* gate family — wall-
  * clocks each phase of the build/compact/delete lifecycle so the
  * bench numbers decompose into training vs assignment vs layout
  * writes. Not part of the engine surface. */
object BuildProfile {
  def main(args: Array[String]): Unit = {
    val (spark, sfDir) = ToolSession.build()

    println("[profile] === cold pass ===")
    graft.operators.Similarity.profileBuild(spark, sfDir)
    println("[profile] === warm pass ===")
    val n = graft.operators.Similarity.profileBuild(spark, sfDir)
    println(s"[profile] corpus rows: $n")
    spark.stop()
  }
}
