package graft.tools

import org.apache.spark.sql.SparkSession

/** Write `.explain("formatted")` for named queries to files — the
  * optimization-round evidence trail (`plans/r<N>/<query>_<tag>.txt`).
  * Usage: `sbt "runMain graft.tools.PlanDump <tag> <query>[,query...]"`
  * (env `SPARK_GRAFT_SF_DIR`/`SPARK_GRAFT_CPUS`/`GRAFT_PLANS_DIR`). */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val tag = args.headOption.getOrElse(sys.error("usage: PlanDump <tag> <queries>"))
    val names = args.lift(1).map(_.split(',').toSeq)
      .getOrElse(sys.error("usage: PlanDump <tag> <queries>"))
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val outDir = java.nio.file.Paths.get(
      sys.env.getOrElse("GRAFT_PLANS_DIR", "plans/r20"))
    java.nio.file.Files.createDirectories(outDir)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    names.foreach { name =>
      val fn = graft.SparkEntry.queries.getOrElse(name,
        sys.error(s"unknown query '$name'"))
      graft.Caches.clearAll()
      val df = fn(spark, sfDir)
      // executedPlan AFTER execution so AQE's final plan (reused
      // exchanges, coalesced reads) is what lands in the file.
      df.queryExecution.toRdd.count()
      val txt = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      java.nio.file.Files.writeString(
        outDir.resolve(s"${name}_$tag.txt"), txt)
      println(s"wrote ${outDir.resolve(s"${name}_$tag.txt")}")
    }
    spark.stop()
  }
}
