package graft

import graft.streaming.StreamingOps
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import java.nio.file.{Files, Path}
import java.sql.Timestamp

/** End-to-end file-source streaming run — the closest Structured
  * Streaming analogue of the reference's mock-directory queue
  * (`EventCount.scala:108-118` feeds one file per batch interval from
  * a staged directory). Here the file source is paced to one file per
  * micro-batch via `maxFilesPerTrigger = 1`, runs through the shared
  * `eventCounts` transform to a checkpointed parquet sink, and is then
  * RESTARTED from the checkpoint over newly arrived files — asserting
  * the recovery path replays nothing and the final sink equals the
  * batch form of the same query. MemoryStream covers the transform
  * semantics in StreamingSpec; this spec covers the actual file-queue
  * mechanism (source offsets, append-mode watermark emission,
  * checkpoint restart).
  */
class FileStreamSpec extends SparkSpecBase {
  import spark.implicits._

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  /** One staged input file = one micro-batch, like the reference's
    * per-interval directory drops. */
  private def stage(dir: Path, n: Int, rows: (Timestamp, String)*): Unit =
    rows.toDF("ts", "event_type").coalesce(1)
      .write.parquet(dir.resolve(s"drop-$n").toString)

  test("file-queue source: one batch per file, checkpointed sink, restart resumes") {
    val src = Files.createTempDirectory("graft_fsrc_")
    val out = Files.createTempDirectory("graft_fout_").toString
    val ckpt = Files.createTempDirectory("graft_fckpt_").toString

    // Phase 1: three staged drops. Watermark is 2h, so the hour-9
    // event closes (emits) the hour-0 and hour-1 windows; hour 9
    // itself stays pending in state.
    stage(src, 1, (ts("2024-01-01 00:10:00"), "click"),
                  (ts("2024-01-01 00:20:00"), "view"))
    stage(src, 2, (ts("2024-01-01 01:15:00"), "click"))
    stage(src, 3, (ts("2024-01-01 09:00:00"), "click"))

    val schema = spark.read.parquet(src.resolve("drop-1").toString).schema
    def run(): Seq[(Timestamp, Long)] = {
      val stream = spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src.toString + "/*")
      val q = StreamingOps.eventCounts(stream)
        .writeStream.format("parquet")
        .option("path", out).option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(Trigger.AvailableNow())
        .start()
      try {
        q.awaitTermination()
        val batches = q.recentProgress.count(_.numInputRows > 0)
        assert(batches >= 1, "at least one non-empty micro-batch")
        spark.read.parquet(out)
          .select("window_start", "cnt").as[(Timestamp, Long)].collect().toSeq
      } finally q.stop()
    }

    val phase1 = run()
    assert(phase1.toMap == Map(
      ts("2024-01-01 00:00:00") -> 2L,
      ts("2024-01-01 01:00:00") -> 1L))

    // Phase 2: two more drops arrive; a fresh query on the SAME
    // checkpoint must pick up only the new files (no re-emission of
    // hour 0/1) and the hour-23 event closes hours 9 and 10.
    stage(src, 4, (ts("2024-01-01 10:30:00"), "click"))
    stage(src, 5, (ts("2024-01-01 23:00:00"), "view"))
    val phase2 = run()

    // No duplicate emission across the restart: each window exactly once.
    assert(phase2.map(_._1).distinct.length == phase2.length,
      s"windows emitted twice after restart: $phase2")
    assert(phase2.toMap == Map(
      ts("2024-01-01 00:00:00") -> 2L,
      ts("2024-01-01 01:00:00") -> 1L,
      ts("2024-01-01 09:00:00") -> 1L,
      ts("2024-01-01 10:00:00") -> 1L))

    // Batch ≡ streaming on the same files, restricted to windows the
    // final watermark (23:00 − 2h) has closed.
    val batch = StreamingOps.eventCounts(spark.read.parquet(src.toString + "/*"))
      .filter(col("window_end") <= lit(ts("2024-01-01 21:00:00")))
      .select("window_start", "cnt").as[(Timestamp, Long)].collect().toSeq
    assert(phase2.sorted == batch.sorted)
  }
}
