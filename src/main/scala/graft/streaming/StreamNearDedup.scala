package graft.streaming

import graft.operators.Dedup
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Streaming near-duplicate ingest filter — the MinHash-LSH sibling of
  * [[StreamingOps.streamingDedup]]'s exact first-touch dedup, and the
  * shape a 100 TB training-data pipeline runs at the crawl frontier:
  * admit a document only if nothing NEAR it has been admitted before.
  *
  * Semantics (deterministic given the batch boundaries):
  *
  *   1. A doc whose band keys collide with any previously ADMITTED
  *      doc is dropped (cross-batch rule). Band collision is the LSH
  *      candidate predicate — at the engine's b×r geometry the miss
  *      probability at planted similarity is < 1e-14 (see [[Dedup]]),
  *      and state stays O(admitted · bands) longs, with no shingle
  *      payloads retained.
  *   2. Within a batch, surviving docs that collide with each other
  *      form clusters (connected components over the band-collision
  *      graph); only each cluster's min-doc_id representative is
  *      admitted (canonical-per-cluster rule — same clustering the
  *      batch `dedup_components` gate query performs).
  *
  * Both rules are join/aggregate shaped: admission state is a band-key
  * table joined per micro-batch (never broadcast, never collected), so
  * the operator scales with executors, and the per-batch component
  * step runs on the (tiny) collision graph, not the corpus. The live
  * queries run the state as a real TABLE: [[PersistentAccumulator]]
  * appends band keys and admissions to parquet per micro-batch, so a
  * restarted query resumes admission from storage (a production
  * deployment swaps the parquet pair for a transactional store keyed
  * by (band_idx, band_key) — the probe is already that equi-join).
  * [[Accumulator]] threads the same per-batch transform in-memory for
  * the MemoryStream-driven semantics tests.
  */
object StreamNearDedup {

  /** Shuffle-partition count for the ISOLATED per-trigger sessions the
    * live admission queries run in: a trigger's joins and aggregates
    * move one micro-batch's delta plus its selective state probe — an
    * order of magnitude less data than the corpus-wide jobs the parent
    * session's `spark.sql.shuffle.partitions` is sized for — so
    * inheriting the parent's count just multiplies fixed per-task cost
    * by empty partitions, every trigger (AQE would coalesce these, but
    * it is disabled under the streaming engine). Parallelism/8 with a
    * floor of 4 keeps the same cluster-proportional scaling one tier
    * down; a deployment whose batches are corpus-sized should override
    * on the session it passes in (this is a per-TRIGGER knob, not a
    * data-volume ceiling — state joins stay distributed). Measured at
    * the paced gates (local[32] → 4): keep-best 12.4→11.3 s warm. */
  private[graft] def triggerShufflePartitions(spark: SparkSession): Int =
    math.max(4, spark.sparkContext.defaultParallelism / 8)

  /** Empty admission state: zero (band_idx, band_key) rows. */
  def emptyState(spark: SparkSession): DataFrame = {
    import spark.implicits._
    Seq.empty[(Int, Long)].toDF("band_idx", "band_key")
  }

  /** One admission step: returns (admitted docs, their band keys).
    * Union the returned keys into the state before the next batch. */
  def admitBatch(spark: SparkSession, batch: DataFrame,
      stateBands: DataFrame): (DataFrame, DataFrame) = {
    // The shingle→minhash→band pipeline is the expensive part and is
    // referenced by every downstream branch (prior-hit probe, both
    // sides of the collision self-join, the new-state projection),
    // which are consumed by SEPARATE actions — materialize it once.
    val keys = Dedup.bandKeys(spark, batch).localCheckpoint()
    admitWithKeys(spark, batch, keys, stateBands)
  }

  /** [[admitBatch]] against a caller-materialized band-key frame — the
    * per-trigger accumulators pass a `persist()`ed frame instead of a
    * localCheckpoint so the minhash pipeline materializes INSIDE the
    * first consuming write job (one fewer job per trigger) and is
    * unpersisted by the caller once its writes land. */
  private[streaming] def admitWithKeys(spark: SparkSession, batch: DataFrame,
      keys: DataFrame, stateBands: DataFrame): (DataFrame, DataFrame) =
    admitWithKeys(spark, batch, keys, Seq(stateBands))

  /** [[admitWithKeys]] against admission state held as SEVERAL parts
    * (the [[PersistentAccumulator]] mirror: one band-clustered sorted
    * base + one clustered run per unfolded committed delta). The
    * prior-hit probe semi-joins each part SEPARATELY and unions the
    * hit doc_ids: joining a single `union` frame instead would erase
    * the parts' [[ckptClustered]] partitioning and re-shuffle +
    * re-sort the whole state every trigger — the exact
    * O(state)-per-trigger creep the clustered mirror removes.
    * Part-wise, every part's side of its semi-join is exchange- and
    * sort-free (a merge scan of its checkpointed layout), the keys
    * side's one exchange is shared across branches (ReuseExchange —
    * all parts carry the same partitioning scheme), and small parts
    * broadcast under AQE instead, which is also exchange-free on the
    * state side. */
  private[graft] def admitWithKeys(spark: SparkSession, batch: DataFrame,
      keys: DataFrame, stateParts: Seq[DataFrame],
      ckptProbe: Boolean = false): (DataFrame, DataFrame) = {
    // Cross-batch rule: any collision with admitted state drops the doc.
    // `ckptProbe` MATERIALIZES the probe once: it is the one
    // state-sized sub-plan of the trigger and it feeds the components
    // probe AND both delta writes — unmaterialized it re-executes per
    // consumer (3× per trigger, the dominant measured cost once state
    // grows). Its result is doc_id-sized, so the extra job is
    // batch-bounded. The persistent accumulators enable it
    // UNCONDITIONALLY since round 18: with the spread cached batch the
    // one materialization job measured cheaper than the re-executions
    // even while the band state still broadcasts, and past the
    // broadcast regime it was already the posture. The in-memory
    // [[Accumulator]] (MemoryStream semantics tests) keeps the lazy
    // default.
    val probe = stateParts
      .map(part => keys.join(part, Seq("band_idx", "band_key"), "left_semi"))
      .reduce(_ unionAll _)
      .select(col("doc_id")).distinct()
    val hitPrior = if (ckptProbe) probe.localCheckpoint() else probe
    val survivors = batch.join(hitPrior, Seq("doc_id"), "left_anti")
    val skeys = keys.join(hitPrior, Seq("doc_id"), "left_anti")
    // Intra-batch rule: canonical representative per collision cluster.
    // No call-site distinct: [[Dedup.componentsBounded]]'s probe
    // dedups the canonicalized pairs at the same plan point, and its
    // star-loop fallback is multigraph-safe (spec-pinned) — a second
    // distinct here only added an exchange per trigger. The a<b
    // self-join is deliberate: its two sides hit ReusedExchange (the
    // skeys plan executes once), which round-18 A/B measured faster at
    // gate scale than both min-star rewrites (window-min and
    // agg+back-join) that avoid the O(s²) bucket blowup — a
    // boilerplate-hot band key lands in [[Dedup.componentsBounded]]'s
    // star-loop fallback, the same pressure valve the batch path has.
    val pairs = skeys.select(col("doc_id").as("a"), col("band_idx"), col("band_key"))
      .join(skeys.select(col("doc_id").as("b"), col("band_idx"), col("band_key")),
        Seq("band_idx", "band_key"))
      .filter(col("a") < col("b"))
      .select(col("a"), col("b"))
    // Bounded components: a micro-batch's collision graph is tiny, and
    // the distributed star loop's per-round driver overhead dominated
    // trigger wall-clock — see [[Dedup.componentsBounded]].
    val nonCanonical = Dedup.componentsBounded(pairs)
      .filter(col("comp") < col("id"))
      .select(col("id").as("doc_id"))
    val admitted = survivors.join(nonCanonical, Seq("doc_id"), "left_anti")
    (admitted, skeys.join(nonCanonical, Seq("doc_id"), "left_anti")
      .select(col("band_idx"), col("band_key")))
  }

  /** Accumulates admission across micro-batches: wire [[onBatch]] as a
    * `foreachBatch` body, read [[admitted]] once the stream drains.
    * State and per-batch admissions are `localCheckpoint`ed, so
    * neither lineage nor the source micro-batch outlives its trigger. */
  final class Accumulator(spark: SparkSession) {
    @volatile private var state: DataFrame = emptyState(spark)
    private val admittedBatches =
      scala.collection.mutable.ArrayBuffer.empty[DataFrame]

    /** The foreachBatch body. Synchronized: micro-batches arrive
      * serially per query, but a defensive lock costs nothing. */
    def onBatch(batch: DataFrame, batchId: Long): Unit = synchronized {
      val (admitted, newKeys) = admitBatch(spark, batch, state)
      val kept = admitted.localCheckpoint()
      admittedBatches += kept.withColumn("batch_id", lit(batchId))
      state = state.union(newKeys).localCheckpoint()
    }

    def admitted: DataFrame =
      admittedBatches.reduceOption(_ unionAll _).getOrElse(
        // Zero batches arrived: an explicitly-typed empty frame with
        // the minimal documented (doc_id, text, batch_id) schema.
        spark.createDataFrame(
          spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
          org.apache.spark.sql.types.StructType(Seq(
            org.apache.spark.sql.types.StructField("doc_id",
              org.apache.spark.sql.types.LongType, nullable = false),
            org.apache.spark.sql.types.StructField("text",
              org.apache.spark.sql.types.StringType),
            org.apache.spark.sql.types.StructField("batch_id",
              org.apache.spark.sql.types.LongType, nullable = false)))))
  }

  /** Admission state EXTERNALIZED to storage — the "transactional
    * store" the object scaladoc names, made real: band keys and
    * admitted rows live as parquet tables under `stateDir`, one
    * PARTITION DIRECTORY per micro-batch (`bands/batch_id=K`,
    * `admitted/batch_id=K`), so a query restarted from its checkpoint
    * RESUMES admission instead of re-admitting everything (state no
    * longer dies with the JVM).
    *
    * Idempotent under foreachBatch's at-least-once redelivery, with an
    * EXPLICIT commit protocol (nothing is inferred from data rows, so
    * a batch admitting zero docs commits exactly like any other):
    *   - each batch's writes go to its own directories in OVERWRITE
    *     mode — a replay of an uncommitted batch clobbers whatever
    *     partial state the previous attempt left, wherever it died;
    *   - a `commits/<batch_id>` marker file is written LAST; only
    *     marker-bearing batches are visible — to the resume-time state
    *     mirror, to [[readAdmitted]], and to the skip check;
    *   - a batch whose marker exists is skipped outright on redelivery.
    * At 100 TB the parquet pair becomes a keyed transactional table
    * (the probe is already an equi-join on (band_idx, band_key), the
    * pushdown shape) and the marker its commit record; the per-batch
    * dataflow is [[admitBatch]], unchanged. */
  /** `spreadBatches` — whether each micro-batch is hash-repartitioned
    * (and cached) to [[triggerShufflePartitions]] before the minhash
    * pipeline. True for PACED sources, whose batch is one small
    * parquet file = one row group = ONE scan task — unspread, the
    * minhash compute and the persisted band rows land in a single
    * partition and every consumer's first exchange reads from one
    * core. False for sources already written multi-file (the unpaced
    * live gate stages ~32 files): there the scan is parallel and the
    * extra shuffle+cache of corpus-sized batch text was measured pure
    * overhead. */
  final class PersistentAccumulator(spark: SparkSession, stateDir: String,
      foldEvery: Int = DISK_FOLD_EVERY, spreadBatches: Boolean = true) {

    def admitted: DataFrame = readAdmitted(spark, stateDir)

    // WRITE-THROUGH: storage is read exactly once, here at construction
    // (the resume path — this is what a restarted query recovers from);
    // the running query serves each batch's prior-state probe from an
    // in-memory mirror instead of re-scanning the parquet per trigger
    // (measured +3.5s on the 3-batch paced gate before this).
    private var committedIds: Set[Long] = readCommitted(stateDir)
    // DEFERRED AUTO-COMPACTION AT RESUME — the LSM L0 policy behind
    // the SAME foldEvery knob (r18 verdict item 6; deferral r19 item 5
    // + ADVICE): a restart over a long uncompacted history builds the
    // mirror off the EXISTING layout first — construction pays only
    // the plain rebuild (4.67 s vs the 7.57 s fold+rebuild serial path
    // at the 2000-trigger probe history) and stays READ-ONLY, so
    // constructing an instance merely to inspect state never rewrites
    // the on-disk layout. The fold debt is carried below as
    // sinceDiskFold's starting value: the first NEW committed batch
    // trips the ordinary in-loop fold branch, folding history + batch
    // and re-basing the mirror — the compaction's benefit starts at
    // the NEXT restart either way, so deferring it only moves its cost
    // off the restart-to-first-result path. Seeding the counter with
    // the REAL unfolded count also tightens the invariant: at most
    // ~foldEvery batches ever sit unfolded across restarts (the
    // constructor-fold design reset the counter, allowing history +
    // foldEvery). foldEvery <= 0 keeps compaction fully caller-driven,
    // exactly as before.
    // Only COMMITTED batches' keys enter the mirror (an uncommitted
    // batch's partial directories are invisible until its replay
    // overwrites them and lands the marker), read through the
    // compaction manifest: generation base + unfolded tail. The mirror
    // is held as BASE + TAIL parts (never unioned into one frame —
    // see the multi-part [[admitWithKeys]]): the base a band-clustered
    // sorted checkpoint whose per-trigger probe is exchange- and
    // sort-free, the tail the committed deltas since the last fold.
    @volatile private var stateBase: DataFrame =
      ckptClustered(spark, readState(spark, stateDir, "bands")
        .select(col("band_idx"), col("band_key")))
    @volatile private var stateTail: List[DataFrame] = Nil
    private var sinceMemFold = 0
    private var sinceDiskFold =
      if (foldEvery > 0) committedIds.count(_ > manifest(stateDir)._2) else 0

    /** The foreachBatch body (serial per query; lock defensive).
      * Write-once/read-back: the band-delta write is the one execution
      * of its plan (keys materialize inside it via `persist`); the
      * state mirror folds the written file back in LAZILY — between
      * fold points the mirror is the clustered base plus up to
      * [[MEM_FOLD_EVERY]] committed delta scans, so steady-state
      * triggers run exactly two jobs (the two delta writes) plus the
      * engine's own bookkeeping — and the base's share of the probe is
      * a sorted merge scan, not a re-shuffle of the whole state. Every
      * [[MEM_FOLD_EVERY]] triggers the tail folds into a fresh
      * clustered base (the LSM run merge, amortized); every `foldEvery`
      * committed batches the ON-DISK layout folds too ([[compactState]]
      * from inside the loop — safe: foreachBatch is the single writer
      * and runs serially) and the mirror re-bases onto the new
      * generation. */
    def onBatch(batch0: DataFrame, batchId: Long): Unit = synchronized {
      if (!committedIds(batchId)) {
        // Spread a paced one-file micro-batch before the shingle→
        // minhash pipeline (see the class scaladoc). Hash-partitioning
        // by doc_id moves only the batch's raw rows, and PERSISTING
        // the result makes that one tiny shuffle the only one — the
        // batch has several consumers (the keys pipeline, the admitted
        // anti-join), and unpersisted each would re-scan the file and
        // re-shuffle per job. Materializes inside the first consuming
        // job, like keys.
        val batch =
          if (spreadBatches) batch0.repartition(
            triggerShufflePartitions(spark), col("doc_id")).persist()
          else batch0
        val keys = graft.operators.Dedup.bandKeys(spark, batch).persist()
        try {
          // ckptProbe whenever PRIOR state exists: the probe feeds
          // three consumers (components probe + both delta writes),
          // and the one doc_id-sized materialization job was measured
          // cheaper than the re-executions even while the band state
          // still broadcasts (round-18 A/B; at scale the old
          // byte-regime check already chose to materialize). Against
          // EMPTY state (a first/only batch — the unpaced live gate)
          // the probe is trivially empty and the checkpoint job would
          // scan the whole batch's keys for nothing.
          val (kept, newKeys) =
            admitWithKeys(spark, batch, keys, stateBase :: stateTail,
              ckptProbe = committedIds.nonEmpty)
          // coalesce(1): a batch's state delta is small relative to the
          // corpus (it is one batch's keys/admissions), and writing it
          // as one file instead of one per shuffle partition keeps the
          // per-trigger commit cost flat — a production job sizes this
          // to its batch volume. The two delta writes are INDEPENDENT
          // plans over materialized inputs (keys persisted, the probe
          // checkpointed, the batch cached), so they run as concurrent
          // job chains (the [[graft.operators.Similarity]] two-family
          // build posture): disjoint directories, wall-clock ≈ the
          // slower write instead of the sum, and the marker still
          // lands only after BOTH — crash semantics unchanged.
          locally {
            import scala.concurrent.ExecutionContext.Implicits.global
            StreamingOps.awaitAll(Seq(
              scala.concurrent.Future(newKeys.coalesce(1).write
                .mode("overwrite")
                .parquet(s"$stateDir/bands/batch_id=$batchId")),
              scala.concurrent.Future(kept.coalesce(1).write
                .mode("overwrite")
                .parquet(s"$stateDir/admitted/batch_id=$batchId"))))
          }
          commit(stateDir, batchId)
        } finally {
          keys.unpersist(blocking = false)
          if (spreadBatches) batch.unpersist(blocking = false)
        }
        committedIds += batchId
        // Each committed delta becomes its OWN tail part (L0 of the
        // in-memory LSM) — never consolidated: a consolidated lazy
        // tail re-shuffled + re-sorted MEM_FOLD_EVERY batches of keys
        // every trigger once it outgrew the broadcast threshold
        // (measured: the 2.7→4.7 s/batch creep at scale-probe batch
        // sizes). A delta small enough to broadcast stays a lazy
        // parquet scan (AQE broadcasts its branch — exchange-free on
        // the state side, no extra job); a bigger one pays ONE
        // clustering job (batch-bounded) and probes as a sorted merge
        // run like the base. The written file size decides for free.
        stateTail = tailRun(spark, s"$stateDir/bands/batch_id=$batchId",
          col("band_idx"), col("band_key")) :: stateTail
        sinceMemFold += 1; sinceDiskFold += 1
        if (foldEvery > 0 && sinceDiskFold >= foldEvery) {
          compactState(spark, stateDir)
          stateBase = ckptClustered(spark,
            readState(spark, stateDir, "bands")
              .select(col("band_idx"), col("band_key")))
          stateTail = Nil
          sinceDiskFold = 0; sinceMemFold = 0
        } else if (sinceMemFold >= MEM_FOLD_EVERY) {
          stateBase = ckptClustered(spark,
            (stateBase :: stateTail).reduce(_ unionAll _))
          stateTail = Nil
          sinceMemFold = 0
        }
      }
    }
  }

  /** In-memory mirror fold cadence: between folds the mirrors stay
    * LAZY unions over committed delta files (tiny parquet scans — the
    * per-trigger probe re-lists them for free), capping plan depth
    * without paying a localCheckpoint job every trigger. */
  private[graft] val MEM_FOLD_EVERY = 8

  /** Band-state mirror checkpoint, CLUSTERED for the per-trigger
    * probe: hash-partitioned and sorted on (band_idx, band_key), so
    * the admission semi-join needs NO exchange and NO sort on the
    * state side — a merge scan of the checkpointed layout, with only
    * the batch's keys shuffling. Without this the probe re-shuffles
    * and re-sorts the ENTIRE state every trigger once it outgrows the
    * broadcast threshold — the measured 2.7→4.5 s/batch creep at 1.5 M
    * state rows, unbounded in state size.
    *
    * The one mirror-building query runs with AQE off: under AQE the
    * executed plan hides its final partitioning from
    * `LogicalRDD.fromDataset` (UnknownPartitioning), and the layout
    * the checkpoint just paid for would be re-shuffled anyway. The
    * conf toggle is safe here because the accumulator owns its
    * session's trigger thread (foreachBatch is serial) — nothing else
    * plans queries in the window. */
  /** Parquet bytes under a directory (recursive) — the free size
    * signal the tail-run and probe-checkpoint decisions read (the
    * files were just written, or are being resumed from). */
  private[streaming] def dirBytes(path: String): Long = {
    def walk(f: java.io.File): Long =
      if (f.isFile) f.length
      else Option(f.listFiles()).getOrElse(Array.empty).map(walk).sum
    walk(new java.io.File(path))
  }

  /** Stored bytes of a state dir's LIVE band table — the resume-time
    * seed of the accumulators' running band-size counter. Counts the
    * current generation base (per the MANIFEST) plus only UNFOLDED
    * per-batch deltas: the deferred one-fold GC keeps the previous
    * generation and the just-folded batch dirs on disk, and counting
    * that debris tripled the size right after a fold — tripping the
    * ckptProbe regime (RUN_CLUSTER_BYTES) while the real state still
    * broadcast. */
  private[streaming] def bandTableBytes(stateDir: String): Long = {
    val (gen, foldedUpTo) = manifest(stateDir)
    val base = if (gen > 0) dirBytes(s"$stateDir/bands-g$gen") else 0L
    val deltas =
      Option(new java.io.File(s"$stateDir/bands").listFiles())
        .getOrElse(Array.empty)
        .filter { d =>
          val n = d.getName
          n.startsWith("batch_id=") &&
            n.stripPrefix("batch_id=").toLongOption.exists(_ > foldedUpTo)
        }
        .map(d => dirBytes(d.toString)).sum
    base + deltas
  }

  /** Broadcast-regime bound for a tail delta: below it the lazy scan's
    * probe branch broadcasts (exchange-free on the state side, no
    * materialization job); above it the run pays one clustering job
    * and probes as a sorted merge. Conservatively under Spark's 10 MB
    * autoBroadcastJoinThreshold — parquet bytes underestimate the
    * in-memory relation. */
  private[streaming] val RUN_CLUSTER_BYTES: Long = 4L << 20

  /** One tail part for a just-committed delta directory: lazy scan in
    * the broadcast regime, clustered sorted run past it. */
  private def tailRun(spark: SparkSession, path: String,
      cols: org.apache.spark.sql.Column*): DataFrame = {
    val scan = spark.read.parquet(path).select(cols: _*)
    if (dirBytes(path) <= RUN_CLUSTER_BYTES) scan
    else ckptClustered(spark, scan)
  }

  private[graft] def ckptClustered(spark: SparkSession, bands: DataFrame): DataFrame =
    ckptClustered(spark, bands, col("band_idx"), col("band_key"))

  /** General clustered-checkpoint form: hash-partition + sort `df` on
    * `keys` (any probe key set — the band mirrors use (band_idx,
    * band_key); [[StreamAnnUpsert]]'s known-ids mirror uses vec_id)
    * with AQE off so `LogicalRDD` keeps the layout for exchange- and
    * sort-free per-trigger probes. */
  private[graft] def ckptClustered(spark: SparkSession, df: DataFrame,
      keys: org.apache.spark.sql.Column*): DataFrame = {
    require(keys.nonEmpty, "clustered checkpoint needs at least one key")
    val key = "spark.sql.adaptive.enabled"
    val old = spark.conf.get(key)
    spark.conf.set(key, "false")
    try df
      .repartition(triggerShufflePartitions(spark), keys: _*)
      .sortWithinPartitions(keys: _*)
      .localCheckpoint()
    finally spark.conf.set(key, old)
  }

  /** Default ON-DISK fold cadence for the persistent accumulators: the
    * LSM compaction ([[compactState]]) runs from INSIDE the trigger
    * loop every this-many committed batches, so a long-lived ingest
    * keeps its restart cost O(state) without an external compaction
    * job. 64 triggers of debris is well under the layout costs the
    * scale probe measured at 2000, and the gates' 3-trigger runs never
    * fold (their timing records the plain append path). */
  val DISK_FOLD_EVERY = 64

  // --- state compaction: fold per-batch dirs into a generation base ------

  /** Compaction pointer for a state dir: `(generation, foldedUpTo)`.
    * Generation g > 0 keeps its folded tables at `bands-g<g>` /
    * `admitted-g<g>` and covers every batch id ≤ foldedUpTo;
    * generation 0 (no MANIFEST) is the plain per-batch layout with
    * nothing folded. Replaced by ATOMIC_MOVE — readers see the old
    * generation (+ its per-batch dirs) or the new one, never a
    * half-fold (same pointer discipline as the ANN index's
    * [[graft.operators.Similarity]] MANIFEST). */
  private[graft] def manifest(stateDir: String): (Long, Long) = {
    val p = java.nio.file.Paths.get(stateDir, "MANIFEST")
    if (java.nio.file.Files.exists(p)) {
      val raw = java.nio.file.Files.readString(p)
      val parts = raw.trim.split("\\s+")
      require(parts.length == 2 && parts.forall(_.forall(_.isDigit)),
        s"corrupt MANIFEST at $stateDir: expected '<generation> <foldedUpTo>', " +
          s"got '${raw.take(80).trim}' — restore or delete it to fall back " +
          "to the per-batch layout")
      (parts(0).toLong, parts(1).toLong)
    } else (0L, -1L) // batch ids start at 0: -1 = nothing folded, so the
                     // contiguity walk below must see batch 0's marker too
  }

  private def genRoot(stateDir: String, table: String, gen: Long): String =
    s"$stateDir/$table-g$gen"

  /** Schema-complete empty frame for one near-dedup state table (the
    * per-batch read's fallback when every committed dir wrote zero
    * rows must union cleanly with a generation base, so it carries
    * batch_id). */
  private def emptyTable(spark: SparkSession, table: String): DataFrame = {
    import spark.implicits._
    table match {
      case "bands" => Seq.empty[(Int, Long, Long)]
        .toDF("band_idx", "band_key", "batch_id")
      case _ => Seq.empty[(Long, String, Long)]
        .toDF("doc_id", "text", "batch_id")
    }
  }

  /** This accumulator's foldable tables, paired with their empties —
    * the default argument of [[compactState]]/[[readState]]'s callers
    * here; [[StreamKeepBest]] passes its own (bands only — its event
    * log is output, never folded). */
  private def ownTables(spark: SparkSession): Seq[(String, DataFrame)] =
    Seq("bands" -> emptyTable(spark, "bands"),
      "admitted" -> emptyTable(spark, "admitted"))

  /** Visible state of one table: the current generation's folded base
    * (if any) unioned with the committed per-batch dirs the fold does
    * not cover. This is what [[PersistentAccumulator]] restarts from
    * and what [[readAdmitted]] serves — so compaction is output-
    * invariant by construction and the paced gate's oracle is
    * unchanged by a fold. `empty` must carry the persisted shape
    * (batch_id included). */
  private[streaming] def readState(spark: SparkSession, stateDir: String,
      table: String, empty: => DataFrame): DataFrame = {
    val (gen, folded) = manifest(stateDir)
    val committed = readCommitted(stateDir)
    val fresh = readPartitioned(spark, s"$stateDir/$table",
      committed.filter(_ > folded), empty)
    val baseDir = genRoot(stateDir, table, gen)
    if (gen == 0L) fresh
    else {
      // Fail LOUDLY when the manifest names a generation whose base is
      // gone (r15 advice): silently returning only the unfolded tail
      // would drop every folded row — the state would quietly resume
      // near-empty and re-admit near-duplicates downstream.
      require(java.nio.file.Files.exists(java.nio.file.Paths.get(baseDir)),
        s"state MANIFEST at $stateDir names generation $gen but its base " +
          s"$baseDir is missing — state storage is corrupt; restore the " +
          "base or delete the MANIFEST to fall back to per-batch layout")
      spark.read.parquet(baseDir).unionByName(fresh)
    }
  }

  private[streaming] def readState(spark: SparkSession, stateDir: String,
      table: String): DataFrame =
    readState(spark, stateDir, table, emptyTable(spark, table))

  private val compactLocks =
    scala.collection.concurrent.TrieMap.empty[String, Object]

  /** Fold the committed per-batch state dirs into a new generation
    * base — the LSM compaction step of a long-lived ingest. Without it
    * a restarted query unions one partitioned table PER COMMITTED
    * BATCH: an ingest triggering every few minutes accumulates
    * thousands of directories, and every restart pays listing + a scan
    * per batch. After a fold, restart cost is O(state): one base
    * table plus the unfolded tail.
    *
    * Only the CONTIGUOUS committed prefix is folded: a batch that
    * crashed after its data write but before its marker will be
    * REPLAYED by the engine — if its id were folded past, the replay's
    * rows would be invisible (id ≤ foldedUpTo but absent from the
    * base). Bounding the fold at the first gap makes that impossible;
    * in practice foreachBatch is serial so the committed set is a
    * prefix and everything folds.
    *
    * Crash-safety mirrors [[graft.operators.Similarity.annIndexCompact]]:
    * staged `-g<gen+1>` dirs are invisible until the ATOMIC_MOVE
    * pointer swap (a crashed attempt's debris is clobbered by the
    * retry's overwrite and swept by the entry GC); folded per-batch
    * payloads and the previous generation are reclaimed by the NEXT
    * fold's entry sweep, giving in-flight readers one fold of grace.
    * Commit MARKERS are kept — the replay skip-check and batch-id
    * monotonicity rest on them. Single-writer: call while no query is
    * writing this state dir (between AvailableNow runs — the spec's
    * stop/compact/resume sequence is the intended shape).
    *
    * `tables` parameterizes WHICH per-batch tables fold (name + its
    * schema-complete empty): this accumulator folds bands+admitted;
    * [[StreamKeepBest]] folds bands only, leaving its event log — the
    * job's output — in the per-batch layout, which stays correct
    * because unfolded tables are read via [[readPartitioned]] over ALL
    * committed ids, ignoring the manifest. */
  def compactState(spark: SparkSession, stateDir: String): Unit =
    compactState(spark, stateDir, ownTables(spark))

  def compactState(spark: SparkSession, stateDir: String,
      tables: Seq[(String, DataFrame)]): Unit =
    compactLocks.getOrElseUpdate(stateDir, new Object).synchronized {
      gcInvisible(stateDir, tables.map(_._1))
      val (gen, folded) = manifest(stateDir)
      val committed = readCommitted(stateDir)
      // Largest id with every id in (folded, id] committed.
      var upTo = folded
      while (committed(upTo + 1)) upTo += 1
      if (upTo > folded) {
        val newGen = gen + 1
        // Independent reads, disjoint destination dirs — fold the
        // tables as concurrent job chains (the delta-write posture);
        // the MANIFEST swap below still lands only after ALL of them.
        locally {
          import scala.concurrent.ExecutionContext.Implicits.global
          StreamingOps.awaitAll(tables.map { case (table, empty) =>
            scala.concurrent.Future(
              readState(spark, stateDir, table, empty).write
                .mode("overwrite").parquet(genRoot(stateDir, table, newGen)))
          })
        }
        val tmp = java.nio.file.Paths.get(stateDir, "MANIFEST.tmp")
        java.nio.file.Files.writeString(tmp, s"$newGen $upTo")
        java.nio.file.Files.move(tmp,
          java.nio.file.Paths.get(stateDir, "MANIFEST"),
          java.nio.file.StandardCopyOption.ATOMIC_MOVE,
          java.nio.file.StandardCopyOption.REPLACE_EXISTING)
      }
    }

  /** Reclaim everything the current MANIFEST no longer references:
    * per-batch dirs with id ≤ foldedUpTo and generation dirs other
    * than the live one. Pure on-disk-pointer logic — idempotent, and
    * a GC interrupted by a crash is finished by the next fold. */
  private def gcInvisible(stateDir: String, tables: Seq[String]): Unit = {
    val (gen, folded) = manifest(stateDir)
    tables.foreach { table =>
      readCommitted(stateDir).filter(_ <= folded).foreach { k =>
        val d = java.nio.file.Paths.get(s"$stateDir/$table/batch_id=$k")
        if (java.nio.file.Files.exists(d)) StreamingOps.deleteRecursively(d)
      }
      // Live-base identity by FILE NAME, not raw string equality of a
      // concatenated path vs a normalized java.nio Path (r15 advice: a
      // trailing slash in a caller-supplied stateDir made the two
      // strings differ and the sweep deleted the LIVE base).
      val liveName = s"$table-g$gen"
      val root = java.nio.file.Paths.get(stateDir)
      val stale = scala.util.Using.resource(java.nio.file.Files.list(root)) { s =>
        import scala.jdk.CollectionConverters._
        s.iterator().asScala.filter { p =>
          p.getFileName.toString.startsWith(s"$table-g") &&
            p.getFileName.toString != liveName
        }.toList
      }
      stale.foreach(StreamingOps.deleteRecursively)
    }
  }

  /** Batch ids whose commit marker exists — the single source of truth
    * for what is visible. */
  private[streaming] def readCommitted(stateDir: String): Set[Long] = {
    val dir = java.nio.file.Paths.get(stateDir, "commits")
    if (!java.nio.file.Files.exists(dir)) Set.empty
    else scala.util.Using.resource(java.nio.file.Files.list(dir)) { s =>
      import scala.jdk.CollectionConverters._
      s.iterator().asScala
        .flatMap(p => p.getFileName.toString.toLongOption).toSet
    }
  }

  /** Land batch `batchId`'s marker — an empty file whose NAME is the
    * record (the same shape Spark's own file-sink metadata log uses);
    * `createFile` is atomic on local/HDFS semantics. Idempotent via
    * the caller's skip check; a leftover marker can only exist if the
    * batch fully committed — so a marker already present on a
    * SAME-INSTANCE replay (a failure after commit() but before the
    * in-memory bookkeeping updated, e.g. a localCheckpoint error) is
    * treated as already-committed rather than crashing the replay
    * permanently with FileAlreadyExistsException. */
  private[streaming] def commit(stateDir: String, batchId: Long): Unit = {
    val dir = java.nio.file.Paths.get(stateDir, "commits")
    java.nio.file.Files.createDirectories(dir)
    try java.nio.file.Files.createFile(dir.resolve(batchId.toString))
    catch { case _: java.nio.file.FileAlreadyExistsException => () }
  }

  /** Read a per-batch partitioned state table restricted to COMMITTED
    * batches. The `batch_id=K` directory layout makes `batch_id` a
    * discovered partition column (int-inferred — recast to long). */
  private[streaming] def readPartitioned(spark: SparkSession, path: String,
      committed: Set[Long], empty: => DataFrame): DataFrame = {
    val root = java.nio.file.Paths.get(path)
    // Batches that wrote ZERO rows leave partition dirs with no data
    // files; if every committed batch did, schema inference has nothing
    // to read — that degenerate table IS empty. The no-data-file check
    // is explicit (not a broad AnalysisException catch): any OTHER
    // analysis failure is state-layout corruption and must fail loudly,
    // not silently resume from empty state and re-admit near-dups.
    def hasDataFile = scala.util.Using.resource(java.nio.file.Files.walk(root)) {
      s =>
        import scala.jdk.CollectionConverters._
        s.iterator().asScala.exists(_.getFileName.toString.endsWith(".parquet"))
    }
    if (!java.nio.file.Files.exists(root) || committed.isEmpty || !hasDataFile)
      empty
    else spark.read.parquet(path)
      .withColumn("batch_id", col("batch_id").cast("long"))
      .filter(col("batch_id").isInCollection(committed))
  }

  /** The committed admitted rows (doc_id, text, batch_id) under a
    * state dir — shared by the accumulator and the gate queries'
    * read-back, so an uncommitted replay victim can never leak into
    * a result. */
  private[graft] def readAdmitted(spark: SparkSession,
      stateDir: String): DataFrame =
    readState(spark, stateDir, "admitted")

  /** Gate/bench query: the admission filter executed by the LIVE
    * streaming engine — file source over the documents parquet,
    * `Trigger.AvailableNow`, checkpointed offsets, `foreachBatch`
    * driving the [[Accumulator]] — in an isolated `newSession` whose
    * checkpoint dir is reclaimed after the (tiny) admitted id set is
    * materialized. The source is deliberately left as ONE micro-batch
    * (no `maxFilesPerTrigger` pacing), which makes the admitted set
    * batching-independent and lets this query share
    * `neardedup_ingest`'s LSH-exact DuckDB oracle: the streaming
    * engine must reproduce the batch engine's answer bit-for-bit.
    * Multi-batch pacing semantics (where admission legitimately
    * depends on batch boundaries) are pinned by StreamNearDedupSpec
    * with MemoryStream-controlled batches instead. */
  /** The documents table staged as a source DIRECTORY (the file stream
    * source rejects bare file paths) — input staging, not memoized
    * compute, so not registered with [[graft.Caches]] (see
    * [[StreamingOps.stageOnce]]). */
  private def stagedDocsDir(spark: SparkSession, dir: String): String =
    StreamingOps.stageOnce(spark, dir, "graft_neardedup_src_") {
      spark.read.parquet(s"$dir/documents.parquet")
        .select(col("doc_id"), col("text"))
    }

  def streamNearDedupLive(spark: SparkSession, dir: String): DataFrame =
    runLive(spark, stagedDocsDir(spark, dir), paced = false)
      .select(col("doc_id")).orderBy(col("doc_id"))

  /** Drive the admission accumulator under the live engine over a
    * staged source directory; `paced` throttles to one file per
    * micro-batch. Returns the admitted (doc_id, batch_id) rows — the
    * text payload is pruned before the RDD boundary (see below) —
    * re-based onto the caller's session WITHOUT a driver collect: the
    * admitted set is O(corpus) — the per-batch localCheckpoints
    * already hold the rows in executor storage, and the stream
    * checkpoint dir is only metadata, safe to reclaim first. */
  private def runLive(spark: SparkSession, path: String,
      paced: Boolean, foldEvery: Int = DISK_FOLD_EVERY): DataFrame = {
    val stateDir = graft.Scratch.dir("graft_neardedup_state_")
    val ckpt = graft.Scratch.dir("graft_neardedup_ckpt_")
    try {
      runLiveAgainst(spark, path, paced, ckpt.toString, stateDir.toString,
        foldEvery = foldEvery)
      // A gate that promises a mid-stream fold must PROVE one ran:
      // a fold leaves the MANIFEST generation pointer. Checked here,
      // before the finally reclaims the state dir.
      if (foldEvery > 0 && foldEvery < Dedup.PACED_BATCHES)
        require(java.nio.file.Files.exists(
            java.nio.file.Paths.get(stateDir.toString, "MANIFEST")),
          s"foldEvery=$foldEvery run left no MANIFEST — the in-loop " +
            "fold did not execute under the live engine")
      // The admitted table is a real parquet table in the CALLER's
      // session — no RDD re-base; localCheckpoint (eager) detaches
      // the rows from the state dir before it is reclaimed. The text
      // payload is pruned at the scan, both gate queries drop it; only
      // COMMITTED batches are read ([[readAdmitted]]).
      readAdmitted(spark, stateDir.toString)
        .select(col("doc_id"), col("batch_id"))
        .localCheckpoint()
    } finally {
      StreamingOps.deleteRecursively(ckpt)
      StreamingOps.deleteRecursively(stateDir)
    }
  }

  /** One live run of the admission stream against EXPLICIT checkpoint
    * and state locations — restartable: a second call on the same pair
    * resumes from the stream checkpoint and the persisted band-key
    * state (StreamNearDedupSpec stops the paced sequence mid-way and
    * proves the resumed run reproduces the single-run answer). Runs in
    * an isolated `newSession` so the gate query cannot disturb caller
    * session state. */
  private[graft] def runLiveAgainst(spark: SparkSession, path: String,
      paced: Boolean, ckpt: String, stateDir: String,
      foldEvery: Int = DISK_FOLD_EVERY): Unit = {
    val schema = spark.read.parquet(path).schema
    val ss = spark.newSession()
    // Per-trigger shuffles move one batch's delta, not the corpus —
    // size them to delta volume (see [[triggerShufflePartitions]]);
    // checkpoint retention trimmed per the live-gate convention.
    ss.conf.set("spark.sql.shuffle.partitions",
      triggerShufflePartitions(spark).toString)
    ss.conf.set("spark.sql.streaming.minBatchesToRetain", "2")
    val acc = new PersistentAccumulator(ss, stateDir, foldEvery = foldEvery,
      spreadBatches = paced)
    val reader = ss.readStream.schema(schema)
    val src = (if (paced) reader.option("maxFilesPerTrigger", 1) else reader)
      .parquet(path)
    val q = src
      .select(col("doc_id"), col("text"))
      .writeStream
      .foreachBatch((b: DataFrame, id: Long) => acc.onBatch(b, id))
      .option("checkpointLocation", ckpt)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    try q.awaitTermination() finally q.stop()
  }

  // --- stream_neardedup_paced: the cross-batch state path, live ----------

  /** The documents table staged as [[graft.operators.Dedup.PACED_BATCHES]]
    * single-file parquets — file k holds doc_id ≡ k (mod PACED_BATCHES)
    * with strictly increasing fixed modification times, so the file
    * source's oldest-first listing yields batch k = file k under
    * `maxFilesPerTrigger = 1`. Deterministic staging is what lets the
    * paced oracle replay the batch boundaries in SQL. */
  private val pacedStaged = new graft.SessionMemo[String, String]

  private[graft] def stagedPacedDocsDir(spark: SparkSession, dir: String): String =
    pacedStaged.getOrElseUpdate(spark, dir) {
      val nb = Dedup.PACED_BATCHES
      val dest = graft.Scratch.dir("graft_neardedup_paced_")
      val docs = spark.read.parquet(s"$dir/documents.parquet")
        .select(col("doc_id"), col("text"))
      // The paced ORACLE replays batch k = residue class k, so unlike
      // the range-sliced trending stage an empty residue class may not
      // silently close ranks — the oracle's batch indices would shift.
      // Fail loudly instead (shared staging contract:
      // [[StreamingOps.stageSlicedFiles]]).
      val staged = StreamingOps.stageSlicedFiles(dest, (0 until nb).map(k =>
        docs.filter(pmod(col("doc_id"), lit(nb)) === k)))
      require(staged == nb,
        s"paced staging produced $staged of $nb batch files — an empty " +
          "residue class would desynchronize the oracle's batch replay")
      dest.toString
    }

  /** Gate/bench query: the admission filter under the live engine with
    * REAL batch boundaries — one staged file per micro-batch — so the
    * engine's cross-batch state path (drop-on-prior-admission) is what
    * produces the answer, not one big intra-batch clustering. The
    * emitted batch_id makes the oracle (which replays the same
    * boundaries in SQL, [[graft.operators.Dedup.streamNearDedupPacedSql]])
    * sensitive to batch lumping or reordering. */
  def streamNearDedupPaced(spark: SparkSession, dir: String): DataFrame =
    runLive(spark, stagedPacedDocsDir(spark, dir), paced = true)
      .select(col("doc_id"), col("batch_id")).orderBy(col("doc_id"))

  /** Gate/bench query: the paced admission gate with the ON-DISK fold
    * driven from INSIDE the trigger loop (`foldEvery = 2`, under the
    * default 3-batch pacing) — so the driver-checked path demonstrably
    * executes a mid-stream generation fold and the LAST batch probes a
    * folded base plus an unfolded delta. [[runLive]] refuses to return
    * without the MANIFEST the fold leaves. Shares the paced oracle
    * verbatim: compaction must be invisible in the admitted set. */
  def streamNearDedupFolded(spark: SparkSession, dir: String): DataFrame =
    runLive(spark, stagedPacedDocsDir(spark, dir), paced = true, foldEvery = 2)
      .select(col("doc_id"), col("batch_id")).orderBy(col("doc_id"))
}
