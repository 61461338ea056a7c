package graft.tools

import org.apache.spark.sql.SparkSession

/** Throwaway stage profiler for the ann_index_* gate family — wall-
  * clocks each phase of the build/compact/delete lifecycle so the
  * bench numbers decompose into training vs assignment vs layout
  * writes. Not part of the engine surface. */
object BuildProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.read.parquet(s"$sfDir/nation.parquet")
      .groupBy("n_regionkey").count().collect()

    println("[profile] === cold pass ===")
    graft.operators.Similarity.profileBuild(spark, sfDir)
    println("[profile] === warm pass ===")
    val n = graft.operators.Similarity.profileBuild(spark, sfDir)
    println(s"[profile] corpus rows: $n")
    spark.stop()
  }
}
