package graft.tools

import graft.operators.Dedup
import graft.streaming.{StreamKeepBest, StreamNearDedup}
import org.apache.spark.sql.functions._

/** Throwaway phase profiler for the keep-best trigger body: replays
  * [[StreamKeepBest.PersistentKeepBest.onBatch]]'s dataflow with each
  * job forced separately, over the SAME staged paced source and batch
  * boundaries as the gate, at the gate's 4-partition trigger sizing.
  * Phase forcing changes job structure (production materializes inside
  * its two writes); numbers here locate growth/overhead, the gate's
  * wall-clock is the bench's. */
object KbProfile {
  def main(args: Array[String]): Unit = {
    val (spark, sfDir) = ToolSession.build()

    def t[A](tag: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[kb] $tag%-34s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }

    val src = graft.streaming.StreamNearDedup.stagedPacedDocsDir(spark, sfDir)
    val files = new java.io.File(src).listFiles().filter(_.getName.endsWith(".parquet"))
      .sortBy(_.getName)
    println(s"[kb] ${files.length} staged batch files")

    (1 to 2).foreach { pass =>
      println(s"[kb] === pass $pass ===")
      val stateDir = graft.Scratch.dir("graft_kbprof_state_")
      val ss = spark.newSession()
      ss.conf.set("spark.sql.shuffle.partitions", "4")
      var bandsBase = t("ckptClustered(empty)")(
        StreamNearDedup.ckptClustered(ss, StreamKeepBest.emptyBands(ss)))
      var bandsTail: List[org.apache.spark.sql.DataFrame] = Nil
      var canonMem = StreamKeepBest.emptyCanon(ss).localCheckpoint()
      files.zipWithIndex.foreach { case (f, i) =>
        println(s"[kb] --- batch $i ---")
        val batch = ss.read.parquet(f.toString).select(col("doc_id"), col("text"))
        val keys = t(s"b$i minhash+persist") {
          val kk = Dedup.bandKeys(ss, batch).persist(); kk.count(); kk
        }
        val events = t(s"b$i keepBestWithKeys plan+events write") {
          val (ev, _) = StreamKeepBest.keepBestWithKeys(ss, batch, keys,
            bandsBase :: (if (bandsTail.isEmpty) Nil
                          else List(bandsTail.reduce(_ unionAll _))),
            canonMem)
          ev.coalesce(1).write.mode("overwrite")
            .parquet(s"$stateDir/events/batch_id=$i")
        }
        val winners = t(s"b$i winners read-back") {
          ss.read.parquet(s"$stateDir/events/batch_id=$i")
            .filter(col("action") =!= "drop")
            .select(col("comp"), col("doc_id"), col("quality"))
        }
        t(s"b$i band-delta write") {
          keys.join(winners.select(col("doc_id"), col("comp")), Seq("doc_id"))
            .select(col("band_idx"), col("band_key"), col("comp"))
            .coalesce(1).write.mode("overwrite")
            .parquet(s"$stateDir/bands/batch_id=$i")
        }
        t(s"b$i mirror updates") {
          bandsTail = ss.read.parquet(s"$stateDir/bands/batch_id=$i")
            .select(col("band_idx"), col("band_key"), col("comp")) :: bandsTail
          canonMem = canonMem.join(winners.select(col("comp")), Seq("comp"), "left_anti")
            .unionByName(winners)
        }
        keys.unpersist(blocking = false)
      }
      graft.streaming.StreamingOps.deleteRecursively(stateDir)
    }
    spark.stop()
  }
}
