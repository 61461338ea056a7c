package graft.tools

import org.apache.spark.sql.functions._

/** One-off probe: does a repartition+sortWithinPartitions survive
  * localCheckpoint (LogicalRDD keeping outputPartitioning/ordering),
  * making a later equi-join exchange- and sort-free on that side? */
object CkptPartProbe {
  def main(args: Array[String]): Unit = {
    val (spark, _) = ToolSession.build()
    val big = {
      val old = spark.conf.get("spark.sql.adaptive.enabled")
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      try spark.range(2000000)
        .select((col("id") % 16).cast("int").as("band_idx"),
          (col("id") * 2654435761L).as("band_key"))
        .repartition(4, col("band_idx"), col("band_key"))
        .sortWithinPartitions(col("band_idx"), col("band_key"))
        .localCheckpoint()
      finally spark.conf.set("spark.sql.adaptive.enabled", old)
    }
    val small = spark.range(5000)
      .select((col("id") % 16).cast("int").as("band_idx"),
        (col("id") * 7919L).as("band_key"), col("id").as("doc_id"))
    big.queryExecution.optimizedPlan.collect {
      case l: org.apache.spark.sql.execution.LogicalRDD =>
        println(s"[probe] LogicalRDD partitioning=${l.outputPartitioning} " +
          s"ordering=${l.outputOrdering.mkString(",")}")
    }
    val probe = small.join(big, Seq("band_idx", "band_key"), "left_semi")
    probe.queryExecution.toRdd.count()
    val plan = probe.queryExecution.executedPlan.toString
    println("[probe] plan:\n" + plan)
    println("[probe] exchanges=" + "Exchange".r.findAllIn(plan).size +
      " sorts=" + "\\bSort\\b".r.findAllIn(plan).size)
    spark.stop()
  }
}
