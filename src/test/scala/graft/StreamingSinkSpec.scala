package graft

import graft.streaming.StreamingOps
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import java.nio.file.Files
import java.sql.Timestamp

/** Streaming sink coverage (SURVEY §2.9): the parquet file sink with
  * checkpointing (reference `saveAsTextFiles`) and the foreachBatch
  * custom sink writing timestamped snapshot dirs (reference
  * `stateSnapshots().foreachRDD` → `part-<ts>` dirs,
  * `TrendingArrivals.scala:113-118`). */
class StreamingSinkSpec extends SparkSpecBase {
  import spark.implicits._

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  test("windowed counts stream to a parquet sink with checkpoint recovery state") {
    implicit val sqlCtx = spark.sqlContext
    val out = Files.createTempDirectory("graft_sink_").toString
    val ckpt = Files.createTempDirectory("graft_ckpt_").toString
    val input = MemoryStream[(Timestamp, String)]
    val q = StreamingOps.eventCounts(input.toDF().toDF("ts", "event_type"))
      .writeStream.format("parquet")
      .option("path", out).option("checkpointLocation", ckpt)
      .outputMode("append").start()
    try {
      input.addData((ts("2024-01-01 00:10:00"), "click"),
        (ts("2024-01-01 00:20:00"), "view"))
      q.processAllAvailable()
      // Append mode emits a window only once the watermark passes it.
      input.addData((ts("2024-01-01 09:00:00"), "click"))
      q.processAllAvailable()
      val rows = spark.read.parquet(out)
        .select("window_start", "cnt").as[(Timestamp, Long)].collect().toMap
      assert(rows(ts("2024-01-01 00:00:00")) == 2L)
      assert(Files.list(java.nio.file.Paths.get(ckpt)).count() > 0,
        "checkpoint dir must hold recovery state")
    } finally q.stop()
  }

  test("foreachBatch writes per-batch snapshot dirs (reference stateSnapshots shape)") {
    implicit val sqlCtx = spark.sqlContext
    val base = Files.createTempDirectory("graft_snap_").toString
    val input = MemoryStream[(Timestamp, String)]
    val q = StreamingOps.eventCounts(input.toDF().toDF("ts", "event_type"))
      .writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, batchId: Long) =>
        batch.write.mode("overwrite").parquet(s"$base/part-$batchId")
      }
      .outputMode("complete").start()
    try {
      input.addData((ts("2024-01-01 00:05:00"), "click"))
      q.processAllAvailable()
      input.addData((ts("2024-01-01 00:06:00"), "view"))
      q.processAllAvailable()
      val dirs = new java.io.File(base).listFiles().filter(_.isDirectory)
        .map(_.getName).sorted
      assert(dirs.length >= 2 && dirs.head == "part-0")
      val last = spark.read.parquet(s"$base/${dirs.last}")
        .select("cnt").as[Long].collect()
      assert(last.sum == 2L) // complete mode: final snapshot has both events
    } finally q.stop()
  }
}
