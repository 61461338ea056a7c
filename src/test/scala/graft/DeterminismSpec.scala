package graft

/** The driver gate hash-compares results, so every query must be
  * bit-stable across executions. This spec re-runs the queries whose
  * shapes most invite nondeterminism (collect_set/collect_list
  * ordering, LSH candidate joins, pivots, window ties) and asserts
  * identical output. */
class DeterminismSpec extends SparkSpecBase {

  private val risky = Seq(
    "inverted_index", // collect_list ordering → sort_array must pin it
    "boolean_retrieval", // collect_set + pivot + first
    "near_dedup", // candidate join order, distinct
    "simhash_dedup",
    "embedding_dedup",
    "cosine_topk", // window ties on rounded cosine
    "exact_dedup", // window over hash partitions
    "bigram_relfreq_stripes", // map_from_entries ordering
    "pagerank", // iterative + memoized path (now hash-gated)
    "pagerank_topk", // window ties on iterated doubles
    "ngram_jaccard", // aggregate-built bitmap + pair join order
    "media_features", // mapPartitions batch order
    "topk_per_group_heap", // typed-Aggregator merge order
    "spam_ensemble_trained", // three single-partition folds + pivot
    "value_quantiles", // percentile over group-collected doubles
    "ann_ivfpq_residual", // two trained quantizers + ADC shortlist ties
    "ann_ivfpq_topk", // same surface as residual: trained IVF+PQ + shortlist
    "ann_index_build", // trained artifacts must round-trip identically
    "ann_ivfpq_served", // rebuild + reserve must reproduce the answer
    "ann_pq_trained", // k-means avg reorder ulps under round(…, 6)
    "ann_lsh_multiprobe", // margin argmin ties + perturbed probe union
    "decontaminate_fuzzy", // LSH candidate join order + max/count agg
    "semantic_dedup", // within-cell pair join order + min/max agg
    "decontaminate_bloom", // subquery-built filter + hash56 join order
    "span_dedup", // first-occurrence window + collect_list reassembly
    "shuffle_shard", // bucketed prefix-sum rank decomposition
    "cosine_topk_filtered", // window ties on rounded cosine (label join)
    "ann_ivf_filtered", // probe join order + window ties on rounded cosine
    "ann_ivfpq_filtered", // persisted index + label-filtered ADC shortlist
    "bm25_rank", // tf join order + window ties on rounded scores
    "weighted_sample", // typed-Aggregator heap merge order + key ties
    "cardinality_sketch", // HLL register serialization + shard union order
    "ann_index_compact", // delta fold + generation swap must round-trip
    "bpe_train", // iterative argmax driver fold: count ties must break stably
    "bpe_encode") // greedy rewrite trajectory must replay identically

  risky.foreach { name =>
    test(s"$name is run-to-run deterministic") {
      val fn = SparkEntry.queries(name)
      Caches.clearAll()
      val a = fn(spark, sfDir).collect().map(_.toString).sorted
      Caches.clearAll()
      val b = fn(spark, sfDir).collect().map(_.toString).sorted
      assert(a.sameElements(b), s"$name differs between runs")
    }
  }
}
