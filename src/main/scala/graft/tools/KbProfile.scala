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

    // --scale n nb: the ScaleProbe keepbest_admission loop with each
    // trigger phase forced separately — locates the state-growing term
    // behind a non-flat per-batch curve (the gate-sized replay below
    // can't: 3 batches never accumulate enough state).
    if (args.contains("--scale")) {
      val rest = args.dropWhile(_ != "--scale").drop(1)
      val n = rest.headOption.flatMap(_.toIntOption).getOrElse(50000)
      val nb = rest.drop(1).headOption.flatMap(_.toIntOption).getOrElse(6)
      import spark.implicits._
      val docs = ScaleProbe.generate(n, seed = 77)
        .map { case (id, text, _, _, _) => (id, text) }
        .toDF("doc_id", "text").localCheckpoint()

      println("[kb] ===== production accumulator (wall-clock) =====")
      val sd0 = graft.Scratch.dir("graft_kbscale_state_")
      val acc = new StreamKeepBest.PersistentKeepBest(spark, sd0.toString)
      (0 until nb).foreach { k =>
        val b = docs.filter(pmod(col("doc_id"), lit(nb)) === k)
        t(f"b$k onBatch (accumulator)")(acc.onBatch(b, k.toLong))
      }
      graft.streaming.StreamingOps.deleteRecursively(sd0)

      println("[kb] ===== phase decomposition (scale) =====")
      val sd = graft.Scratch.dir("graft_kbscalep_state_")
      var bandsBase = StreamNearDedup.ckptClustered(
        spark, StreamKeepBest.emptyBands(spark))
      var bandsTail: List[org.apache.spark.sql.DataFrame] = Nil
      var canonBase = StreamKeepBest.emptyCanon(spark).localCheckpoint()
      var canonTail: List[org.apache.spark.sql.DataFrame] = Nil
      (0 until nb).foreach { k =>
        println(s"[kb] --- batch $k ---")
        val b = docs.filter(pmod(col("doc_id"), lit(nb)) === k)
        val keys = t(s"b$k minhash+persist") {
          val kk = Dedup.bandKeys(spark, b).persist(); kk.count(); kk
        }
        val scored = b.select(col("doc_id"),
          graft.operators.Pipeline.qualityCol(col("text")).as("quality"))
        val docComp = t(s"b$k routing probe ckpt") {
          (bandsBase :: bandsTail)
            .map(p => keys.join(p, Seq("band_idx", "band_key")))
            .reduce(_ unionAll _)
            .groupBy(col("doc_id")).agg(min(col("comp")).as("comp"))
            .localCheckpoint()
        }
        val canonMem = t(s"b$k challenged-canon resolve") {
          val challenged = docComp.select(col("comp")).distinct()
          StreamKeepBest.resolveLatest((canonTail :+ canonBase).map(
            _.join(challenged, Seq("comp"), "left_semi"))).localCheckpoint()
        }
        locally {
          val challengers = t(s"b$k challengers ckpt")(
            docComp.join(scored, Seq("doc_id")).localCheckpoint())
          val skeys = t(s"b$k skeys ckpt")(
            keys.join(docComp, Seq("doc_id"), "left_anti").localCheckpoint())
          val survivors = scored.join(docComp, Seq("doc_id"), "left_anti")
          val comps = t(s"b$k pairs+components") {
            val pairs = skeys.select(col("doc_id").as("a"), col("band_idx"), col("band_key"))
              .join(skeys.select(col("doc_id").as("b"), col("band_idx"), col("band_key")),
                Seq("band_idx", "band_key"))
              .filter(col("a") < col("b"))
              .select(col("a"), col("b"))
            Dedup.componentsBounded(pairs)
              .select(col("id").as("doc_id"), col("comp"))
          }
          println(s"[kb]   docComp=${docComp.count()} " +
            s"challengers=${challengers.count()} skeys=${skeys.count()}")
          t(s"b$k events window+write") {
            val survComp = survivors.join(comps, Seq("doc_id"), "left")
              .select(col("doc_id"),
                coalesce(col("comp"), col("doc_id")).as("comp"), col("quality"))
            // canonMem is ALREADY the challenged-comp resolved slice —
            // no second semi-join, matching the production plan.
            val relevantCanon = canonMem
            val contenders = survComp
              .withColumn("inc", lit(false)).withColumn("fresh", lit(true))
              .unionByName(challengers
                .select(col("doc_id"), col("comp"), col("quality"))
                .withColumn("inc", lit(false)).withColumn("fresh", lit(false)))
              .unionByName(relevantCanon
                .select(col("doc_id"), col("comp"), col("quality"))
                .withColumn("inc", lit(true)).withColumn("fresh", lit(false)))
            val w = org.apache.spark.sql.expressions.Window
              .partitionBy(col("comp")).orderBy(col("quality").desc, col("doc_id"))
            contenders.withColumn("rn", row_number().over(w))
              .filter(!col("inc"))
              .select(col("doc_id"), col("comp"), col("quality"),
                when(col("rn") =!= 1, lit("drop"))
                  .when(col("fresh"), lit("new"))
                  .otherwise(lit("replace")).as("action"))
              .coalesce(1).write.mode("overwrite")
              .parquet(s"$sd/events/batch_id=$k")
          }
        }
        val winners = spark.read.parquet(s"$sd/events/batch_id=$k")
          .filter(col("action") =!= "drop")
          .select(col("comp"), col("doc_id"), col("quality"))
        t(s"b$k band-delta write") {
          keys.join(winners.select(col("doc_id"), col("comp")), Seq("doc_id"))
            .select(col("band_idx"), col("band_key"), col("comp"))
            .coalesce(1).write.mode("overwrite")
            .parquet(s"$sd/bands/batch_id=$k")
        }
        t(s"b$k tail cluster run") {
          bandsTail = StreamNearDedup.ckptClustered(spark,
            spark.read.parquet(s"$sd/bands/batch_id=$k")
              .select(col("band_idx"), col("band_key"), col("comp"))
              .groupBy(col("band_idx"), col("band_key"))
              .agg(min(col("comp")).as("comp"))) :: bandsTail
        }
        canonTail = winners :: canonTail
        keys.unpersist(blocking = false)
      }
      graft.streaming.StreamingOps.deleteRecursively(sd)
      spark.stop()
      return
    }

    val src = graft.streaming.StreamNearDedup.stagedPacedDocsDir(spark, sfDir)
    val files = new java.io.File(src).listFiles().filter(_.getName.endsWith(".parquet"))
      .sortBy(_.getName)
    println(s"[kb] ${files.length} staged batch files")

    // --phases: the --scale sub-phase forcing, but over the GATE's own
    // staged batch files — locates which job inside the ~2s warm
    // "plan+events write" actually costs (components collect vs the
    // window+write vs the double quality scan).
    if (args.contains("--phases")) {
      (1 to 2).foreach { pass =>
        println(s"[kb] === phases pass $pass ===")
        val sd = graft.Scratch.dir("graft_kbphase_state_")
        val ss = spark.newSession()
        ss.conf.set("spark.sql.shuffle.partitions", "4")
        var bandsBase = StreamNearDedup.ckptClustered(ss, StreamKeepBest.emptyBands(ss))
        var bandsTail: List[org.apache.spark.sql.DataFrame] = Nil
        var canonBase = StreamKeepBest.emptyCanon(ss).localCheckpoint()
        var canonTail: List[org.apache.spark.sql.DataFrame] = Nil
        files.zipWithIndex.foreach { case (f, i) =>
          println(s"[kb] --- batch $i ---")
          // Mirror the production trigger's batch posture
          // ([[StreamKeepBest.PersistentKeepBest.onBatch]]): spread the
          // one-file micro-batch to the trigger sizing and persist it —
          // without this the decomposition times a single-partition
          // pipeline the production trigger no longer runs.
          val batch = t(s"b$i batch spread+persist") {
            val bb = ss.read.parquet(f.toString)
              .select(col("doc_id"), col("text"))
              .repartition(StreamNearDedup.triggerShufflePartitions(ss),
                col("doc_id"))
              .persist()
            bb.count(); bb
          }
          val keys = t(s"b$i minhash+persist") {
            val kk = Dedup.bandKeys(ss, batch).persist(); kk.count(); kk
          }
          val scored = batch.select(col("doc_id"),
            graft.operators.Pipeline.qualityCol(col("text")).as("quality"))
          t(s"b$i quality scan (one pass)")(scored.count())
          // ckptProbe posture: production materializes the routing
          // probe whenever prior state exists (every batch after the
          // first) — force it here as its own phase.
          val docComp0 = (bandsBase :: bandsTail)
            .map(p => keys.join(p, Seq("band_idx", "band_key")))
            .reduce(_ unionAll _)
            .groupBy(col("doc_id")).agg(min(col("comp")).as("comp"))
          val docComp = if (i > 0)
            t(s"b$i routing probe ckpt")(docComp0.localCheckpoint())
          else docComp0
          val skeys = keys.join(docComp, Seq("doc_id"), "left_anti")
          val comps = t(s"b$i pairs+components collect") {
            val pairs = skeys.select(col("doc_id").as("a"), col("band_idx"), col("band_key"))
              .join(skeys.select(col("doc_id").as("b"), col("band_idx"), col("band_key")),
                Seq("band_idx", "band_key"))
              .filter(col("a") < col("b"))
              .select(col("a"), col("b"))
            Dedup.componentsBounded(pairs)
              .select(col("id").as("doc_id"), col("comp"))
          }
          t(s"b$i events window+write") {
            val challengers = docComp.join(scored, Seq("doc_id"))
            val survivors = scored.join(docComp, Seq("doc_id"), "left_anti")
            val survComp = survivors.join(comps, Seq("doc_id"), "left")
              .select(col("doc_id"),
                coalesce(col("comp"), col("doc_id")).as("comp"), col("quality"))
            val challenged = docComp.select(col("comp")).distinct()
            val relevantCanon = StreamKeepBest.resolveLatest(
              (canonTail :+ canonBase).map(_.join(challenged, Seq("comp"), "left_semi")))
            val contenders = survComp
              .withColumn("inc", lit(false)).withColumn("fresh", lit(true))
              .unionByName(challengers
                .select(col("doc_id"), col("comp"), col("quality"))
                .withColumn("inc", lit(false)).withColumn("fresh", lit(false)))
              .unionByName(relevantCanon
                .select(col("doc_id"), col("comp"), col("quality"))
                .withColumn("inc", lit(true)).withColumn("fresh", lit(false)))
            val w = org.apache.spark.sql.expressions.Window
              .partitionBy(col("comp")).orderBy(col("quality").desc, col("doc_id"))
            contenders.withColumn("rn", row_number().over(w))
              .filter(!col("inc"))
              .select(col("doc_id"), col("comp"), col("quality"),
                when(col("rn") =!= 1, lit("drop"))
                  .when(col("fresh"), lit("new"))
                  .otherwise(lit("replace")).as("action"))
              .coalesce(1).write.mode("overwrite")
              .parquet(s"$sd/events/batch_id=$i")
          }
          val winners = ss.read.parquet(s"$sd/events/batch_id=$i")
            .filter(col("action") =!= "drop")
            .select(col("comp"), col("doc_id"), col("quality"))
          t(s"b$i band-delta write") {
            keys.join(winners.select(col("doc_id"), col("comp")), Seq("doc_id"))
              .select(col("band_idx"), col("band_key"), col("comp"))
              .coalesce(1).write.mode("overwrite")
              .parquet(s"$sd/bands/batch_id=$i")
          }
          bandsTail = ss.read.parquet(s"$sd/bands/batch_id=$i")
            .select(col("band_idx"), col("band_key"), col("comp")) :: bandsTail
          canonTail = winners :: canonTail
          keys.unpersist(blocking = false)
          batch.unpersist(blocking = false)
        }
        graft.streaming.StreamingOps.deleteRecursively(sd)
      }
      spark.stop()
      return
    }

    (1 to 2).foreach { pass =>
      println(s"[kb] === pass $pass ===")
      val stateDir = graft.Scratch.dir("graft_kbprof_state_")
      val ss = spark.newSession()
      ss.conf.set("spark.sql.shuffle.partitions", "4")
      var bandsBase = t("ckptClustered(empty)")(
        StreamNearDedup.ckptClustered(ss, StreamKeepBest.emptyBands(ss)))
      var bandsTail: List[org.apache.spark.sql.DataFrame] = Nil
      var canonBase = StreamKeepBest.emptyCanon(ss).localCheckpoint()
      var canonTail: List[org.apache.spark.sql.DataFrame] = Nil
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
            canonTail :+ canonBase)
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
          canonTail = winners :: canonTail
        }
        keys.unpersist(blocking = false)
      }
      graft.streaming.StreamingOps.deleteRecursively(stateDir)
    }
    spark.stop()
  }
}
