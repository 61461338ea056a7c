package graft

import org.apache.spark.sql.functions._

/** Pins for the sampling/sketch operators:
  *
  *   - `weighted_sample` (A-ES weighted reservoir): the k-bounded-heap
  *     form equals a plain-Scala replay of the Efraimidis–Spirakis
  *     draw, weights actually steer selection, and the result is
  *     invariant under repartitioning;
  *   - `cardinality_sketch` (DataSketches HLL): the shard-merged
  *     estimate equals the direct estimate (lossless union algebra —
  *     the property that makes the sketch the `count_distinct` swap),
  *     the fixture-gate booleans hold, and the error contract holds in
  *     the genuinely ESTIMATING regime (10^5 distinct values, where
  *     HLL is approximating rather than recording).
  */
class SamplingSketchSpec extends SparkSpecBase {
  import spark.implicits._

  test("weighted_sample equals a sequential A-ES replay per source") {
    val got = operators.Pipeline.weightedSample(spark, sfDir)
      .select("source", "doc_id").as[(String, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val docs = Tables.documents(spark, sfDir)
      .select("source", "doc_id", "n_chars")
      .as[(String, Long, Long)].collect()
    val expected = docs.groupBy(_._1).map { case (src, rows) =>
      src -> rows.map { case (_, id, w) =>
        val u = (functions.TextFns.hash56Local(id.toString) + 1.0) /
          7.2057594037927936e16
        val key = math.round(-math.log(u) / math.max(w, 1L) * 1e6)
        (key, id)
      }.sortBy(identity).take(operators.Pipeline.WEIGHTED_SAMPLE_K)
        .map(_._2).toSet
    }
    assert(got == expected)
  }

  test("weighted_sample: weights steer selection; repartition-invariant") {
    // 40 docs of weight 1 and one doc of weight 10^6: the heavy doc's
    // exponential key is ~10^6 smaller than any light doc's, so it is
    // (deterministically, via the fixed hash draw) always selected.
    val docs = ((1L to 40L).map(i => (i, "s", 1L)) :+ (99L, "s", 1000000L))
      .toDF("doc_id", "source", "n_chars")
    def sample(df: org.apache.spark.sql.DataFrame): Set[Long] = {
      val tk = udaf(new graft.functions.BoundedTopK(4))
      // The PRODUCTION key expression — not a copy (a drifted copy
      // would keep this test green while the shipped query diverged).
      val key = operators.Pipeline.aesKeyMicro(col("doc_id"), col("n_chars"))
      df.withColumn("k", key).groupBy(col("source"))
        .agg(tk((-col("k")).as("v"), col("doc_id")).as("tk"))
        .select(explode(col("tk.entries.tie")).as("doc_id"))
        .as[Long].collect().toSet
    }
    val base = sample(docs)
    assert(base.contains(99L), s"heavy doc must win a slot, got $base")
    assert(base.size == 4)
    assert(sample(docs.repartition(7)) == base,
      "A-ES selection must not depend on physical layout")
  }

  test("weighted_sample: seeded fuzz vs the sequential replay on random corpora") {
    val rnd = new scala.util.Random(20260814L)
    for (fuzzRound <- 1 to 3) {
      val n = 50 + rnd.nextInt(150)
      val k = 1 + rnd.nextInt(6)
      val docs = (1 to n).map { i =>
        (rnd.nextLong(1L << 40).abs, s"s${rnd.nextInt(4)}",
          1L + rnd.nextInt(100000))
      }.distinctBy(_._1) // doc_id must be unique for the tiebreak
      val df = docs.toDF("doc_id", "source", "n_chars").repartition(5)
      val tk = udaf(new graft.functions.BoundedTopK(k))
      val key = operators.Pipeline.aesKeyMicro(col("doc_id"), col("n_chars"))
      val got = df.withColumn("kk", key).groupBy(col("source"))
        .agg(tk((-col("kk")).as("v"), col("doc_id")).as("tk"))
        .select(col("source"), explode(col("tk.entries.tie")).as("doc_id"))
        .as[(String, Long)].collect()
        .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
      val want = docs.groupBy(_._2).map { case (src, rows) =>
        src -> rows.map { case (id, _, w) =>
          val uu = (functions.TextFns.hash56Local(id.toString) + 1.0) /
            7.2057594037927936e16
          (math.round(-math.log(uu) / math.max(w, 1L) * 1e6), id)
        }.sorted.take(k).map(_._2).toSet
      }
      assert(got == want, s"fuzz round $fuzzRound (n=$n k=$k) diverged")
    }
  }

  test("cardinality_sketch: fixture booleans hold; merged ≡ direct") {
    val rows = operators.Pipeline.cardinalitySketch(spark, sfDir)
      .select("event_type", "approx_ok", "merge_ok")
      .as[(String, Boolean, Boolean)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (t, a, m) =>
      assert(a, s"$t: estimate outside the 5% contract")
      assert(m, s"$t: shard-merged estimate diverged from direct")
    }
  }

  test("HLL error contract and union algebra in the estimating regime") {
    val n = 100000L
    // Pinned multi-partition: the merged ≡ direct EXACT equality below
    // holds because BOTH legs go through partial-aggregation sketch
    // unions (the union drops Datasketches' HIP estimator, leaving the
    // estimate register-determined). A single-partition direct leg
    // (AQE coalesce, a future plan change) would keep its HIP estimate
    // and break exact equality with nothing actually wrong — so force
    // the shuffle shape the assertion's algebra depends on.
    val ids = spark.range(n).select((col("id") * 2654435761L).as("u"))
      .repartition(8, col("u"))
    val direct = ids.agg(hll_sketch_estimate(
      hll_sketch_agg(col("u"), lit(operators.Pipeline.HLL_LGK))).as("est"))
      .as[Long].head()
    // 2^12 registers ⇒ RSE ≈ 1.5%; 3σ ≈ 4.6% — the 5% gate contract.
    assert(math.abs(direct - n) <= operators.Pipeline.HLL_REL_TOL * n,
      s"direct estimate $direct vs $n")
    // Union of disjoint-shard sketches: same estimate as one sketch
    // over everything — the lossless merge that lets count-distinct
    // partial-aggregate at 100 TB.
    val merged = ids
      .withColumn("shard", pmod(col("u"), lit(operators.Pipeline.HLL_SHARDS)))
      .groupBy(col("shard"))
      .agg(hll_sketch_agg(col("u"), lit(operators.Pipeline.HLL_LGK)).as("sk"))
      .agg(hll_sketch_estimate(hll_union_agg(col("sk"), lit(false))).as("est"))
      .as[Long].head()
    assert(merged == direct,
      s"union algebra must be lossless: merged $merged vs direct $direct")
  }
}
