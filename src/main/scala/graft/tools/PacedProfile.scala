package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Throwaway phase profiler for the paced streaming gates — splits the
  * gate wall-clock into staging / live-engine run / final assembly,
  * and times each micro-batch from inside the foreachBatch loop. */
object PacedProfile {
  def main(args: Array[String]): Unit = {
    val (spark, sfDir) = ToolSession.build()

    def t[A](tag: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[paced] $tag%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }

    (1 to 2).foreach { pass =>
      println(s"[paced] === pass $pass ===")
      val path = t("staging (memoized)")(
        graft.streaming.StreamNearDedup.stagedPacedDocsDir(spark, sfDir))
      val stateDir = graft.Scratch.dir("graft_prof_kb_state_")
      val ckpt = graft.Scratch.dir("graft_prof_kb_ckpt_")
      try {
        t("runLiveAgainst (3 triggers)")(
          graft.streaming.StreamKeepBest.runLiveAgainst(
            spark, path, ckpt.toString, stateDir.toString))
        val ev = t("readEvents+checkpoint")(
          graft.streaming.StreamKeepBest.readEvents(spark, stateDir.toString)
            .select(col("doc_id"), col("comp"), col("quality"),
              col("action"), col("batch_id"))
            .localCheckpoint())
        t("final assembly+count") {
          val byQuality = org.apache.spark.sql.expressions.Window
            .partitionBy(col("comp"))
            .orderBy(col("quality").desc, col("doc_id"))
          val clustered = ev.groupBy(col("comp"))
            .agg(count(lit(1)).as("n")).filter(col("n") >= 2)
            .select(col("comp"))
          ev.withColumn("kept", row_number().over(byQuality) === 1)
            .join(clustered, Seq("comp"))
            .orderBy(col("doc_id")).count()
        }
      } finally {
        graft.streaming.StreamingOps.deleteRecursively(ckpt)
        graft.streaming.StreamingOps.deleteRecursively(stateDir)
      }
    }
    spark.stop()
  }
}
