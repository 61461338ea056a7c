package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.ExplainMode

/** Physical-plan audits (SURVEY §4): filters must reach the parquet
  * scan, column pruning must shrink ReadSchema, dims must broadcast,
  * and no candidate-generation pipeline may contain a cartesian
  * product. These are the properties the hand-rolled reference
  * optimizations map onto — enforced as assertions so a regression in
  * plan shape fails CI, not just the bench. */
class PlanSpec extends SparkSpecBase {

  private def plan(df: DataFrame): String =
    df.queryExecution.explainString(ExplainMode.fromString("formatted"))

  test("q1: date filter pushed to the parquet scan, columns pruned") {
    val p = plan(operators.Relational.q1(spark, sfDir))
    assert(p.contains("PushedFilters:") && p.contains("EqualTo(l_shipdate"),
      s"filter not pushed:\n$p")
    assert(!p.contains("l_extendedprice"), "pruning failed: reads unneeded column")
  }

  test("q5: dims broadcast and the nation filter is pushed to its scan") {
    val p = plan(operators.Relational.q5(spark, sfDir))
    assert(p.contains("BroadcastHashJoin"), s"no broadcast join:\n$p")
    // The selective IN-filter must sit on the nation scan itself — the
    // round-1 plan applied it after the full fact shuffle.
    assert(p.contains("In(n_name"), s"nation filter not pushed:\n$p")
    assert(!p.contains("CartesianProduct"))
  }

  test("q7: sort+limit compiles to TakeOrderedAndProject (no global sort)") {
    val p = plan(operators.Relational.q7(spark, sfDir))
    assert(p.contains("TakeOrderedAndProject"), s"missing top-k operator:\n$p")
  }

  test("dedup candidate generators contain no cartesian product") {
    Seq(
      operators.Dedup.nearDedup(spark, sfDir),
      operators.Dedup.simhashDedup(spark, sfDir),
      operators.Dedup.decontaminateFuzzy(spark, sfDir),
      operators.Dedup.ngramJaccard(spark, sfDir),
      operators.Dedup.spanDedup(spark, sfDir),
      operators.Similarity.semanticDedup(spark, sfDir)).foreach { df =>
      val p = plan(df)
      assert(!p.contains("CartesianProduct"), s"cartesian in plan:\n$p")
      assert(!p.contains("BroadcastNestedLoopJoin"), s"nested-loop join in plan:\n$p")
    }
  }

  test("bm25_rank: workload-sided broadcasts, no corpus-sized product") {
    val p = plan(operators.InvertedIndex.bm25Rank(spark, sfDir))
    assert(p.contains("BroadcastHashJoin"), s"no broadcast join:\n$p")
    // The 1-row scalars crossJoin plans as BroadcastNestedLoopJoin
    // (deliberate, same as cosine_topk); a CartesianProduct would mean
    // two corpus-sized sides met without a key.
    assert(!p.contains("CartesianProduct"), s"cartesian in plan:\n$p")
  }

  test("ngram_jaccard: the pair join shuffles on the block key, no unbounded broadcast") {
    // Disable size-based auto-broadcast (a test-scale artifact) so the
    // assertion isolates EXPLICIT broadcast hints: the within-block
    // pairing must be a shuffle equi-join on `source` — an O(corpus)
    // broadcast of one side was the round-2 scale-killer.
    val threshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val p = plan(operators.Dedup.ngramJaccard(spark, sfDir))
      assert(!p.contains("BroadcastExchange"), s"unbounded side broadcast:\n$p")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", threshold)
  }

  test("boolean_retrieval: all workload queries evaluate in one pass (no Union)") {
    val p = plan(operators.InvertedIndex.booleanRetrieval(spark, sfDir))
    // One explode over the single docsets row — a union of per-query
    // branches would re-run the shared aggregate once per query.
    assert(!p.contains("Union"), s"per-query branches re-aggregate:\n$p")
  }

  test("cosine_topk: the only product is the deliberate broadcast of queries") {
    val p = plan(operators.Similarity.cosineTopk(spark, sfDir))
    // Q×N scan: corpus streams, query side broadcast — never a
    // shuffle-partitioned cartesian of corpus×corpus.
    assert(!p.contains("CartesianProduct"), s"unexpected cartesian:\n$p")
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastExchange"),
      s"query side not broadcast:\n$p")
  }

  test("media_catalog prunes the payload bytes from the scan") {
    val p = plan(operators.Multimodal.mediaCatalog(spark, sfDir))
    // payload derives from text; the catalog needs text only for
    // length — but must never read the embedding/lang-independent rest.
    assert(!p.contains("CartesianProduct"))
    assert(p.contains("ReadSchema"), p)
  }

  test("bucketed_join: the co-located join needs no shuffle exchange") {
    // Writing the bucketed tables is part of the operator under test.
    operators.ScaleOps.bucketedJoin(spark, sfDir).count()
    // At fixture scale the planner would broadcast (and skip the
    // bucketed scan entirely); disable auto-broadcast to expose the
    // path that matters at 100 TB — both sides too big to broadcast,
    // joined bucket-to-bucket with no ShuffleExchange.
    val threshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val p = plan(operators.ScaleOps.bucketedJoinRead(spark))
      assert(p.contains("SortMergeJoin") || p.contains("ShuffledHashJoin"),
        s"no shuffled join in plan:\n$p")
      // With auto-broadcast off, ANY Exchange node here is a shuffle of
      // a bucketed side (formatted mode prints the node name bare, so
      // match the node name itself, not 'Exchange hashpartitioning').
      assert(!p.contains("Exchange"), s"bucketed join still shuffles:\n$p")
      assert(p.contains("Bucketed: true"), s"bucketed scan not used:\n$p")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", threshold)
  }

  test("partitioned_scan: the lang filter prunes partitions at the scan") {
    operators.ScaleOps.partitionedScan(spark, sfDir).count()
    val p = plan(operators.ScaleOps.partitionedScanRead(spark, sfDir))
    assert(p.contains("PartitionFilters") &&
      p.replaceAll("\\s+", " ").matches("(?s).*PartitionFilters: \\[[^\\]]*lang[^\\]]*\\].*"),
      s"lang filter not applied as a partition filter:\n$p")
  }

  test("wordcount: aggregation is partial then final (map-side combine)") {
    val p = plan(operators.TextCore.wordcount(spark, sfDir))
    assert("HashAggregate".r.findAllIn(p).length >= 2,
      s"expected partial+final aggregation:\n$p")
  }

  test("interval_join: containment is an equi-join, never a range product") {
    val p = plan(operators.ScaleOps.intervalJoin(spark, sfDir))
    assert(!p.contains("CartesianProduct"), s"cartesian in plan:\n$p")
    assert(!p.contains("BroadcastNestedLoopJoin"), s"nested-loop join:\n$p")
  }

  test("stratified_sample: scan prunes to (doc_id, source)") {
    val p = plan(operators.Pipeline.stratifiedSample(spark, sfDir))
    assert(!p.contains("text"), s"pruning failed: reads the text payload:\n$p")
  }

  test("heavy_hitters: sketch aggregates partial-then-final, candidates broadcast") {
    // The sketch pass is checkpointed out of the gate plan since r20
    // (it feeds two consumers) — pin its shape on the split-out frame.
    val sk = plan(operators.TextCore.heavyHitterSketch(spark, sfDir))
    assert("ObjectHashAggregate".r.findAllIn(sk).length >= 2,
      s"expected partial+final sketch aggregation:\n$sk")
    val p = plan(operators.TextCore.heavyHitters(spark, sfDir))
    assert(p.contains("BroadcastExchange"), s"candidate set not broadcast:\n$p")
  }

  test("source_cap: bounded-PQ aggregation is partial then final") {
    val p = plan(operators.Pipeline.sourceCap(spark, sfDir))
    assert("ObjectHashAggregate".r.findAllIn(p).length >= 2,
      s"expected partial+final ObjectHashAggregate:\n$p")
    assert(!p.contains("Window"), s"heap form must not window-sort:\n$p")
  }

  test("weighted_sample: A-ES heap aggregates partial then final, no sort") {
    val p = plan(operators.Pipeline.weightedSample(spark, sfDir))
    assert("ObjectHashAggregate".r.findAllIn(p).length >= 2,
      s"expected partial+final ObjectHashAggregate:\n$p")
    assert(!p.contains("Window"), s"heap form must not window-sort:\n$p")
  }

  test("cardinality_sketch: HLL aggregates partial then final (mergeable)") {
    val p = plan(operators.Pipeline.cardinalitySketch(spark, sfDir))
    // Both legs (direct sketch, shard merge) must partial-aggregate —
    // the register-array merge is the whole 100 TB story.
    assert("ObjectHashAggregate".r.findAllIn(p).length >= 4,
      s"expected partial+final HLL aggregation on both legs:\n$p")
  }

  test("value_quantiles_approx: sketch aggregates partial then final (mergeable)") {
    // The whole point of the swap: the percentile sketch must combine
    // map-side (partial ObjectHashAggregate) and merge at the reducer —
    // a plan with only a final aggregate would ship raw rows and
    // reintroduce the per-group sort's shuffle volume.
    val p = plan(operators.Pipeline.valueQuantilesApprox(spark, sfDir))
    assert("ObjectHashAggregate".r.findAllIn(p).length >= 2,
      s"expected partial+final sketch aggregation:\n$p")
    assert(!p.contains("Window"), s"approx form must not sort per group:\n$p")
  }

  test("decontaminate: the eval gram set broadcasts, the corpus side streams") {
    val p = plan(operators.Pipeline.decontaminate(spark, sfDir))
    assert(p.contains("BroadcastExchange"), s"eval gram set not broadcast:\n$p")
    assert(!p.contains("CartesianProduct"), s"cartesian crept in:\n$p")
  }

  test("ann_ivfpq_served: the plan reads stored index tables, never retrains") {
    // The train-once/serve-many claim as a plan property: every index
    // input (centroids, codebooks, codes) is a parquet SCAN of the
    // persisted model dir — k-means would show up as iterated
    // aggregates over checkpointed RDD scans instead.
    val p = plan(operators.Similarity.annIvfPqServed(spark, sfDir))
    assert("graft_annidx".r.findAllIn(p).length >= 3,
      s"expected centroids/codebooks/codes scans of the model dir:\n$p")
    assert(!p.contains("CartesianProduct"), s"cartesian crept in:\n$p")
  }

  test("serving from an upserted index: the delta union stays scan-shaped") {
    // The committed-delta read path must not change the serving plan
    // class: base + delta are parquet scans under a Union feeding the
    // same broadcast cell join — no retraining aggregates, no
    // cartesian, and the float re-rank still the only corpus read.
    val raw = Tables.embeddings(spark, sfDir)
      .select("vec_id", "embedding")
    val idx = java.nio.file.Files.createTempDirectory("graft_planups_idx_")
      .toString
    operators.Similarity.buildIndexAt(spark,
      raw.filter("vec_id % 4 != 3"), idx)
    operators.Similarity.annIndexUpsert(spark, idx, raw)
    val p = plan(operators.Similarity.serveFromIndex(spark, idx, raw))
    assert(p.contains("Union"), s"expected base+delta union of codes scans:\n$p")
    assert("graft_planups_idx".r.findAllIn(p).nonEmpty,
      s"expected scans of the upserted index dir:\n$p")
    assert(!p.contains("CartesianProduct"), s"cartesian crept in:\n$p")
  }

  test("decontaminate_fuzzy: the eval band frame broadcasts") {
    // Same posture as the exact form: the benchmark slice is the
    // broadcast side; the train-side band frame streams.
    val p = plan(operators.Dedup.decontaminateFuzzy(spark, sfDir))
    assert(p.contains("BroadcastExchange"), s"eval band frame not broadcast:\n$p")
    assert(!p.contains("CartesianProduct"), s"cartesian crept in:\n$p")
  }

  test("mix_apply: the target table broadcasts onto the ranked corpus") {
    val p = plan(operators.Pipeline.mixApply(spark, sfDir))
    assert(p.contains("BroadcastExchange"), s"targets not broadcast:\n$p")
  }

  test("md5-rank selection: every row_number window is bucket-partitioned") {
    // The scale pin for stratified_sample / mix_apply: no window may
    // partition by source alone (one task sorting a whole source); the
    // bucketed prefix-count decomposition partitions every corpus-sized
    // window by (source, bkt). The only source-partitioned window left
    // is the offsets prefix-sum, which sees <=256 COUNT rows per source.
    for (df <- Seq(operators.Pipeline.stratifiedSample(spark, sfDir),
        operators.Pipeline.mixApply(spark, sfDir),
        operators.Pipeline.shuffleShard(spark, sfDir))) {
      val p = plan(df)
      val rowNumberSpecs = "row_number\\(\\) windowspecdefinition\\(([^)]*)\\)".r
        .findAllMatchIn(p).map(_.group(1)).toSeq
      assert(rowNumberSpecs.nonEmpty, s"expected a boundary-bucket window:\n$p")
      rowNumberSpecs.foreach(spec =>
        assert(spec.contains("bkt"),
          s"row_number window not bucket-partitioned: $spec\n$p"))
    }
  }

  test("sequence_pack: the only unpartitioned window runs over super-buckets") {
    // The two-level prefix-sum pin: the bucket-offsets table is
    // corpus-proportional (n_docs/SEQ_BUCKET rows), so no unpartitioned
    // window may consume it — only the √-sized super-bucket aggregate
    // may flow through a global-order window. Every windowspecdefinition
    // that has no partition columns must therefore order on sbkt.
    val p = plan(operators.Pipeline.sequencePack(spark, sfDir))
    val specs = "windowspecdefinition\\(([^)]*)\\)".r
      .findAllMatchIn(p).map(_.group(1)).toSeq
    assert(specs.nonEmpty, s"expected window specs:\n$p")
    val unpartitioned = specs.filter(_.matches("^\\w+#\\d+L? (ASC|DESC).*"))
    assert(unpartitioned.nonEmpty,
      s"expected the super-bucket prefix window:\n$p")
    unpartitioned.foreach(s => assert(s.startsWith("sbkt"),
      s"unpartitioned window over a corpus-proportional input: $s\n$p"))
  }

  test("curation_pipeline stage 4: cap is a bounded-PQ aggregate, no window sort") {
    val p = plan(operators.Pipeline.capStageBoundedTopK(
      Tables.documents(spark, sfDir)
        .select(org.apache.spark.sql.functions.col("doc_id"),
          org.apache.spark.sql.functions.col("source"))))
    assert("ObjectHashAggregate".r.findAllIn(p).length >= 2,
      s"expected partial+final ObjectHashAggregate:\n$p")
    assert(!p.contains("Window"), s"cap stage must not window-sort:\n$p")
  }
}
