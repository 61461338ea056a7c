package graft.tools

import org.apache.spark.sql.SparkSession

/** One session builder for the diagnostic profilers — the same config
  * `graft.Bench` measures under (master/extensions/partitions/
  * timezone/UI) plus its pre-timing warm-up, so a profiler decomposes
  * the session the bench actually runs, not a differently-configured
  * one. Bench keeps its own copy: it is the measured driver contract
  * and must not depend on diagnostics. */
object ToolSession {
  def build(): (SparkSession, String) = {
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
    spark.range(1 << 20).selectExpr("sum(id)").collect()
    (spark, sfDir)
  }
}
