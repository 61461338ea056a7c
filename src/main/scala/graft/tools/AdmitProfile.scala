package graft.tools

import graft.operators.Dedup
import graft.streaming.StreamNearDedup
import org.apache.spark.sql.functions._

/** Throwaway phase profiler for the streaming-admission creep
  * (round-16 verdict item 4): generates a ScaleProbe-shaped corpus,
  * drives N admission batches, and forces each phase separately —
  * minhash, prior-state probe, intra-batch clustering, state growth —
  * so the creeping term is measured, not guessed. Phase forcing
  * changes the job structure vs the production accumulator (which
  * materializes inside its two writes), so numbers here decompose
  * growth; the accumulator's own wall-clock is the scale probe's. */
object AdmitProfile {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.flatMap(_.toIntOption).getOrElse(50000)
    val nb = args.drop(1).headOption.flatMap(_.toIntOption).getOrElse(8)
    val (spark, _) = ToolSession.build()

    def t[A](tag: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[adm] $tag%-36s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }

    import spark.implicits._
    val docs = ScaleProbe.generate(n, seed = 77)
      .map { case (id, text, _, _, _) => (id, text) }
      .toDF("doc_id", "text").localCheckpoint()

    // Production path: the PersistentAccumulator itself, wall-clocked
    // per batch — the exact loop BENCH_SCALE's stream_admission times.
    val stateDir = graft.Scratch.dir("graft_admprof_state_")
    val acc = new StreamNearDedup.PersistentAccumulator(spark, stateDir.toString)
    (0 until nb).foreach { k =>
      val b = docs.filter(pmod(col("doc_id"), lit(nb)) === k)
      t(f"b$k onBatch (accumulator)")(acc.onBatch(b, k.toLong))
      println(s"[adm]   state rows: " +
        spark.read.parquet(s"$stateDir/bands").count())
    }
    println(s"[adm] admitted total: ${acc.admitted.count()}")
    graft.streaming.StreamingOps.deleteRecursively(stateDir)

    if (args.contains("--exact")) {
      println("[adm] ===== exact onBatch replay (write-timed) =====")
      val sd = graft.Scratch.dir("graft_admexact_state_")
      var base = StreamNearDedup.ckptClustered(
        spark, StreamNearDedup.emptyState(spark))
      var tail: List[org.apache.spark.sql.DataFrame] = Nil
      (0 until nb).foreach { k =>
        val b = docs.filter(pmod(col("doc_id"), lit(nb)) === k)
        println(s"[adm] --- batch $k ---")
        val keys = Dedup.bandKeys(spark, b).persist()
        val (kept, newKeys) = t(s"b$k admitWithKeys construct(+probe)")(
          StreamNearDedup.admitWithKeys(spark, b, keys, base :: tail))
        t(s"b$k newKeys write")(
          newKeys.coalesce(1).write.mode("overwrite")
            .parquet(s"$sd/bands/batch_id=$k"))
        t(s"b$k kept write")(
          kept.coalesce(1).write.mode("overwrite")
            .parquet(s"$sd/admitted/batch_id=$k"))
        keys.unpersist(blocking = false)
        tail = t(s"b$k cluster delta run")(StreamNearDedup.ckptClustered(
          spark, spark.read.parquet(s"$sd/bands/batch_id=$k")
            .select(col("band_idx"), col("band_key")))) :: tail
      }
      graft.streaming.StreamingOps.deleteRecursively(sd)
      spark.stop()
      return
    }

    if (args.contains("--phases")) {
      println("[adm] ===== phase decomposition (clustered mirror) =====")
      var base = StreamNearDedup.ckptClustered(
        spark, StreamNearDedup.emptyState(spark))
      var tail: List[org.apache.spark.sql.DataFrame] = Nil
      var sinceFold = 0
      (0 until nb).foreach { k =>
        val b = docs.filter(pmod(col("doc_id"), lit(nb)) === k)
        println(s"[adm] --- batch $k ---")
        val keys = t(s"b$k minhash+persist") {
          val kk = Dedup.bandKeys(spark, b).persist(); kk.count(); kk
        }
        val hitPrior = t(s"b$k prior-probe (base+tail)") {
          (base :: tail)
            .map(p => keys.join(p, Seq("band_idx", "band_key"), "left_semi"))
            .reduce(_ unionAll _)
            .select(col("doc_id")).distinct().localCheckpoint()
        }
        val skeys = t(s"b$k survivors anti-join") {
          keys.join(hitPrior, Seq("doc_id"), "left_anti").localCheckpoint()
        }
        val newKeys = t(s"b$k intra-batch cluster") {
          val pairs = skeys.select(col("doc_id").as("a"), col("band_idx"), col("band_key"))
            .join(skeys.select(col("doc_id").as("b"), col("band_idx"), col("band_key")),
              Seq("band_idx", "band_key"))
            .filter(col("a") < col("b"))
            .select(col("a"), col("b"))
          val nonCanonical = Dedup.componentsBounded(pairs)
            .filter(col("comp") < col("id"))
            .select(col("id").as("doc_id"))
          skeys.join(nonCanonical, Seq("doc_id"), "left_anti")
            .select(col("band_idx"), col("band_key")).localCheckpoint()
        }
        tail = t(s"b$k cluster delta run")(
          StreamNearDedup.ckptClustered(spark, newKeys)) :: tail
        sinceFold += 1
        if (sinceFold >= StreamNearDedup.MEM_FOLD_EVERY) {
          t(s"b$k mirror refold") {
            base = StreamNearDedup.ckptClustered(
              spark, (base :: tail).reduce(_ unionAll _))
            tail = Nil
          }
          sinceFold = 0
        }
        keys.unpersist(blocking = false)
        if (k == nb - 1)
          println("[adm] probe plan:\n" +
            (base :: tail).map(p =>
              keys.join(p, Seq("band_idx", "band_key"), "left_semi"))
              .reduce(_ unionAll _).select(col("doc_id")).distinct()
              .queryExecution.executedPlan.toString)
      }
    }
    spark.stop()
  }
}
