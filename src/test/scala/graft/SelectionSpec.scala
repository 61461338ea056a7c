package graft

import graft.operators.Pipeline
import org.apache.spark.sql.functions._

/** The round-12 data-selection ops: CCNet-style perplexity bucketing
  * and DSIR importance selection. Both are DuckDB-oracled gate
  * queries; these tests pin the SELECTION semantics on synthetic
  * corpora whose right answer is known by construction — the fixture
  * can only prove engine/oracle agreement, not that the method picks
  * what it should. */
class SelectionSpec extends SparkSpecBase {
  import spark.implicits._

  /** A corpus with three clearly-separated typicality tiers: `common`
    * tokens dominate, `mid` tokens are rarer, `rare` tokens appear
    * once each. Docs made of common tokens score high (head), of rare
    * tokens low (tail). */
  private def tieredDocs = {
    val common = (0 until 60).map(i => (i.toLong, "the of and to in"))
    val mid = (60 until 120).map(i => (i.toLong, s"alpha beta gamma delta m${i % 7}"))
    val rare = (120 until 180).map(i => (i.toLong, s"zx$i qw$i er$i ty$i ui$i"))
    (common ++ mid ++ rare).toDF("doc_id", "text")
  }

  test("perplexity_buckets: tiers land in the buckets their typicality dictates") {
    val got = Pipeline.perplexityBucketsOf(tieredDocs)
      .select($"doc_id", $"bucket").as[(Long, String)].collect().toMap
    assert(got.size == 180)
    // Every common doc is head, every rare doc is tail; the mid tier
    // fills the middle (exactly a third each by construction — no
    // cross-tier score ties possible with these vocabularies).
    (0L until 60L).foreach(id => assert(got(id) == "head", s"doc $id"))
    (60L until 120L).foreach(id => assert(got(id) == "middle", s"doc $id"))
    (120L until 180L).foreach(id => assert(got(id) == "tail", s"doc $id"))
  }

  test("perplexity_buckets: buckets are score-monotone and cover every doc") {
    val rows = Pipeline.perplexityBucketsOf(tieredDocs)
      .select($"bucket", $"avg_logprob").as[(String, Double)].collect()
    val byBucket = rows.groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    assert(byBucket.keySet == Set("head", "middle", "tail"))
    // The bucket boundaries are order statistics of the score: no
    // tail doc may outscore a middle doc, no middle doc a head doc.
    assert(byBucket("tail").max <= byBucket("middle").min)
    assert(byBucket("middle").max <= byBucket("head").min)
  }

  /** Sequential replay of the DSIR weight formula — identical math to
    * the distributed plan (same smoothing, same 6-decimal rounding,
    * same long-key ranking), so the comparison is exact. */
  private def dsirReplay(docs: Seq[(Long, String)], k: Int): Seq[(Long, Double)] = {
    val tokens = docs.map { case (id, text) =>
      id -> graft.functions.TextFns.tokenizeLocal(text)
    }
    val (target, raw) = tokens.partition(_._1 % Pipeline.EVAL_MOD == Pipeline.EVAL_RES)
    val ct = target.flatMap(_._2).groupBy(identity).view.mapValues(_.size.toLong).toMap
    val cr = raw.flatMap(_._2).groupBy(identity).view.mapValues(_.size.toLong).toMap
    val vocab = (ct.keySet ++ cr.keySet).size.toLong
    val (tt, tr) = (ct.values.sum, cr.values.sum)
    val weighted = raw.filter(_._2.nonEmpty).map { case (id, ts) =>
      val w = ts.map { t =>
        math.log((ct.getOrElse(t, 0L) + 1).toDouble / (tt + vocab)) -
          math.log((cr.getOrElse(t, 0L) + 1).toDouble / (tr + vocab))
      }.sum
      val rounded = BigDecimal(w).setScale(6, BigDecimal.RoundingMode.HALF_UP)
      (id, rounded.toDouble, (rounded * 1000000).toLongExact)
    }
    weighted.sortBy { case (id, _, key) => (-key, id) }.take(k)
      .map { case (id, w, _) => (id, w) }.sortBy(_._1)
  }

  /** Target slice (id % 10 == 5) speaks "physics"; raw docs are a mix
    * of physics-flavored and cooking-flavored. DSIR must surface the
    * physics-flavored raw docs. */
  private def shiftedDocs: Seq[(Long, String)] = {
    val target = Seq(5L, 15L, 25L, 35L).map(
      _ -> "quantum field energy momentum lagrangian symmetry gauge boson")
    val physicsRaw = Seq(1L, 2L, 3L, 4L).map(i =>
      i -> s"energy momentum symmetry gauge flux$i")
    val cookingRaw = Seq(6L, 7L, 8L, 9L).map(i =>
      i -> s"butter flour sugar oven whisk$i")
    target ++ physicsRaw ++ cookingRaw
  }

  test("dsir_select: picks the target-flavored raw docs first") {
    val got = Pipeline.dsirSelectOf(shiftedDocs.toDF("doc_id", "text"), 4)
      .select($"doc_id").as[Long].collect().toSet
    assert(got == Set(1L, 2L, 3L, 4L),
      s"expected the physics-flavored raw docs, got $got")
  }

  test("dsir_select: target-slice docs are never candidates") {
    val got = Pipeline.dsirSelectOf(shiftedDocs.toDF("doc_id", "text"), 100)
      .select($"doc_id").as[Long].collect()
    assert(got.forall(_ % Pipeline.EVAL_MOD != Pipeline.EVAL_RES))
    assert(got.length == 8) // every raw doc when K exceeds the corpus
  }

  test("dsir_select: distributed plan matches the sequential replay exactly") {
    // 120 docs over a drifting mixture — enough vocab overlap that
    // weights genuinely interleave across the rank-K boundary.
    val docs = (0L until 120L).map { i =>
      val style = if (i % Pipeline.EVAL_MOD == Pipeline.EVAL_RES)
        "gradient descent tensor layer attention"
      else if (i % 3 == 0) s"gradient tensor attention w${i % 11}"
      else if (i % 3 == 1) s"market price trade bond w${i % 11}"
      else s"gradient market layer price w${i % 13}"
      (i, style)
    }
    val want = dsirReplay(docs, 30)
    val got = Pipeline.dsirSelectOf(docs.toDF("doc_id", "text"), 30)
      .as[(Long, Double)].collect().toSeq
    assert(got == want)
  }
}
