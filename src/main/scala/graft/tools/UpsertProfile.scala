package graft.tools

import graft.operators.Similarity
import graft.streaming.{StreamAnnUpsert, StreamingOps}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Throwaway phase profiler for `stream_ann_upsert_live` — splits the
  * gate wall-clock into slice-train / base-copy / delta-staging /
  * live-engine run / final read-back, and decomposes each micro-batch
  * upsert from inside the foreachBatch loop (anti-join vs encode+write
  * vs marker). Stage-timed replay in the [[BuildProfile]] posture: the
  * real gate is [[StreamAnnUpsert.streamAnnUpsertLive]]. */
object UpsertProfile {
  def main(args: Array[String]): Unit = {
    val (spark, sfDir) = ToolSession.build()

    def t[A](tag: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[ups] $tag%-32s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }

    def dirStats(p: String): String = {
      var files = 0L; var bytes = 0L
      val walk = java.nio.file.Files.walk(java.nio.file.Paths.get(p))
      try walk.forEach { f =>
        if (java.nio.file.Files.isRegularFile(f)) {
          files += 1; bytes += java.nio.file.Files.size(f)
        }
      } finally walk.close()
      s"$files files, ${bytes / 1024} KiB"
    }

    (1 to 2).foreach { pass =>
      println(s"[ups] === pass $pass ===")
      val slice = t("upsertSliceIndex (memoized)")(
        Similarity.upsertSliceIndex(spark, sfDir))
      println(s"[ups]   slice index: ${dirStats(slice)}")
      val work = Similarity.freshWorkDir("profups", sfDir)
      t("copyDir base slice")(Similarity.copyDir(slice, work))
      val src = t("stagedDeltaDir (memoized)")(
        StreamAnnUpsert.stagedDeltaDir(spark, sfDir))

      val ckpt = graft.Scratch.dir("graft_profups_ckpt_")
      val ss = spark.newSession()
      ss.conf.set("spark.sql.shuffle.partitions", "8")
      ss.conf.set("spark.sql.streaming.minBatchesToRetain", "2")
      val batchT0 = new java.util.concurrent.atomic.AtomicLong(0L)
      try {
        t("live engine total (3 triggers)") {
          val q = ss.readStream.schema(ss.read.parquet(src).schema)
            .option("maxFilesPerTrigger", 1).parquet(src)
            .writeStream
            .foreachBatch { (b: DataFrame, id: Long) =>
              val bs = b.sparkSession
              val enter = System.nanoTime()
              val prev = batchT0.getAndSet(enter)
              if (prev != 0L)
                println(f"[ups]   gap since prev batch body     ${(enter - prev) / 1e9}%8.2f s")
              val fresh = t(s"  batch $id: anti-join+ckpt") {
                val known = Similarity.readCodes(bs, work)
                  .select(col("vec_id")).distinct()
                b.join(known, Seq("vec_id"), "left_anti").localCheckpoint()
              }
              t(s"  batch $id: isEmpty")(fresh.isEmpty)
              val k = 1L + pass * 10 + id // unique per profile attempt
              t(s"  batch $id: encode+write") {
                val delta = s"$work/deltas/$k"
                Similarity.writeDelta(
                  Similarity.encodeWith(bs, work, fresh), s"$delta/codes")
                println(s"[ups]   delta $k: ${dirStats(s"$delta/codes")}")
              }
              t(s"  batch $id: marker") {
                val commits = java.nio.file.Paths.get(work, "commits")
                java.nio.file.Files.createDirectories(commits)
                try java.nio.file.Files.createFile(commits.resolve(k.toString))
                catch { case _: java.nio.file.FileAlreadyExistsException => () }
              }
              batchT0.set(System.nanoTime())
            }
            .option("checkpointLocation", ckpt.toString)
            .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
            .start()
          try q.awaitTermination() finally q.stop()
        }
      } finally StreamingOps.deleteRecursively(ckpt)

      t("final readCodes+count")(
        Similarity.readCodes(spark, work)
          .select(col("vec_id"), col("m").cast("int").as("m"),
            col("code"), col("cell"))
          .orderBy(col("vec_id"), col("m")).count())
    }
    spark.stop()
  }
}
