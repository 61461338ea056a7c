package graft

import org.apache.spark.sql.functions._

/** Semantic invariants over the sf0.001 fixtures (SURVEY §5):
  * relative frequencies sum to 1 per group, PMI counts are symmetric,
  * dedup outputs respect their thresholds and symmetry. */
class InvariantSpec extends SparkSpecBase {
  import spark.implicits._

  test("interval_join: one row per event, equals the naive range form") {
    val binned = SparkEntry.queries("interval_join")(spark, sfDir)
    val events = Tables.events(spark, sfDir)
    assert(binned.count() == events.count())
    // Independent naive form: equi-join on user + BETWEEN filter (the
    // per-key range product the binned plan exists to avoid).
    val sess = streaming.StreamingOps.userSessions(events)
    val naive = events.select(col("event_id"), col("user_id"), col("ts"))
      .join(sess, Seq("user_id"))
      .filter(col("ts") >= col("session_start") && col("ts") < col("session_end"))
      .select(col("event_id"), col("user_id"), col("ts"),
        col("session_start"), col("n_events").as("session_n_events"))
    assert(binned.exceptAll(naive).isEmpty && naive.exceptAll(binned).isEmpty)
  }

  test("bigram_relfreq: relfreq sums to ~1 per left word") {
    val sums = operators.TextCore.bigramRelfreq(spark, sfDir)
      .groupBy("w1").agg(sum("relfreq").as("s"))
      .select("s").as[Double].collect()
    assert(sums.nonEmpty)
    sums.foreach(s => assert(math.abs(s - 1.0) < 1e-4, s"group sum $s"))
  }

  test("bigram relfreq pairs and stripes forms agree") {
    val pairs = operators.TextCore.bigramRelfreq(spark, sfDir)
      .select("w1", "w2", "relfreq")
    val stripes = operators.TextCore.bigramRelfreqStripes(spark, sfDir)
      .select("w1", "w2", "relfreq")
    assert(pairs.exceptAll(stripes).isEmpty && stripes.exceptAll(pairs).isEmpty)
  }

  test("pairs_pmi: symmetric in count, and equals stripes_pmi") {
    val pmi = operators.TextCore.pairsPmi(spark, sfDir).cache()
    val flipped = pmi.select(col("w2").as("w1"), col("w1").as("w2"),
      col("pmi"), col("cnt"))
    assert(pmi.exceptAll(flipped).isEmpty, "PMI must be symmetric")
    val stripes = operators.TextCore.stripesPmi(spark, sfDir)
    assert(pmi.exceptAll(stripes).isEmpty && stripes.exceptAll(pmi).isEmpty)
    pmi.unpersist()
  }

  test("near_dedup: pairs ordered, jaccard within [threshold, 1]") {
    val rows = operators.Dedup.nearDedup(spark, sfDir)
      .select("doc_a", "doc_b", "jaccard")
      .as[(Long, Long, Double)].collect()
    rows.foreach { case (a, b, j) =>
      assert(a < b)
      assert(j >= operators.Dedup.JACCARD_THRESHOLD && j <= 1.0)
    }
  }

  test("exact_dedup: every group has exactly one canonical doc") {
    val bad = operators.Pipeline.exactDedup(spark, sfDir)
      .groupBy("text_hash")
      .agg(sum(when(col("is_canonical"), 1).otherwise(0)).as("n"))
      .filter(col("n") =!= 1)
    assert(bad.isEmpty)
  }

  test("inverted_index: postings sorted by doc_id, df = postings length") {
    val rows = operators.InvertedIndex.invertedIndex(spark, sfDir)
      .select(col("df"),
        transform(col("postings"), p => p.getField("doc_id")).as("ids"))
      .as[(Long, Seq[Long])].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (df, ids) =>
      assert(df == ids.length)
      assert(ids == ids.sorted)
    }
  }

  test("cosine_topk: ranks contiguous from 1, cosine non-increasing") {
    val byQuery = operators.Similarity.cosineTopk(spark, sfDir)
      .select("query_id", "rank", "cosine")
      .as[(Long, Int, Double)].collect()
      .groupBy(_._1)
    assert(byQuery.nonEmpty)
    byQuery.values.foreach { rs =>
      val sorted = rs.sortBy(_._2)
      assert(sorted.map(_._2).toSeq == (1 to sorted.length))
      val cos = sorted.map(_._3)
      cos.sliding(2).foreach {
        case Array(x, y) => assert(x >= y)
        case _ =>
      }
    }
  }
}
