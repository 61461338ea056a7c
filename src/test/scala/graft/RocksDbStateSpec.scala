package graft

import graft.streaming.{StreamingOps, TrendOut, WindowCount}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import java.sql.Timestamp

/** The keyed state machine on the RocksDB state store provider — the
  * 100 TB configuration: `flatMapGroupsWithState` state lives per key
  * per executor, and beyond memory the default HDFS-backed store OOMs;
  * RocksDB spills to local disk with incremental checkpointing. The
  * provider is a pure config swap (that is the point being tested):
  * identical results, state carried across micro-batches, and the
  * progress metrics prove RocksDB actually served the state.
  */
class RocksDbStateSpec extends SparkSpecBase {
  import spark.implicits._

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  test("trending state machine carries state across batches on RocksDB") {
    val prev = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      implicit val sqlCtx = spark.sqlContext
      val input = MemoryStream[WindowCount]
      val q = StreamingOps.trendingStateMachine(input.toDS())
        .writeStream.format("memory").queryName("rocksdb_trend")
        .outputMode("update").start()
      try {
        // Batch 1: establish state (prev=0 for both keys).
        input.addData(
          WindowCount("click", ts("2024-01-01 00:00:00"), 6L),
          WindowCount("view", ts("2024-01-01 00:00:00"), 12L))
        q.processAllAvailable()
        // Batch 2: the doubling alert must see batch 1's counts as prev
        // — state crossed a micro-batch boundary through RocksDB.
        input.addData(
          WindowCount("click", ts("2024-01-01 00:10:00"), 14L),
          WindowCount("view", ts("2024-01-01 00:10:00"), 13L))
        q.processAllAvailable()
        val got = spark.table("rocksdb_trend").as[TrendOut].collect()
          .map(t => (t.event_type, t.window_start) -> ((t.prev_cnt, t.is_alert)))
          .toMap
        assert(got(("click", ts("2024-01-01 00:10:00"))) == ((6L, true)),
          "click: 6 -> 14 doubles and clears the min, must alert")
        assert(got(("view", ts("2024-01-01 00:10:00"))) == ((12L, false)),
          "view: 12 -> 13 does not double, no alert")
        // The provider swap really took: RocksDB publishes its own
        // custom state-store metrics in the progress events.
        val custom = q.lastProgress.stateOperators.flatMap(
          _.customMetrics.keySet.toArray(Array.empty[String]))
        assert(custom.exists(_.toLowerCase.contains("rocksdb")),
          s"expected RocksDB state-store metrics, got ${custom.mkString(",")}")
      } finally q.stop()
    } finally {
      prev.fold(spark.conf.unset("spark.sql.streaming.stateStore.providerClass"))(
        v => spark.conf.set("spark.sql.streaming.stateStore.providerClass", v))
    }
  }
}
