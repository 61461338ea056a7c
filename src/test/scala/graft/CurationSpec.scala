package graft

import graft.operators.{Dedup, Pipeline}
import org.apache.spark.sql.functions._

/** The round-7 corpus-curation ops: connected-components dedup
  * clustering and deterministic stratified sampling. Both are also
  * DuckDB-oracled gate queries; these tests pin the graph/window
  * mechanics on shapes the fixture cannot produce (long chains,
  * skewed strata). */
class CurationSpec extends SparkSpecBase {
  import spark.implicits._

  /** Brute-force union-find ground truth for tiny edge lists. */
  private def ufComponents(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.Map.empty[Long, Long]
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    parent.keys.map(k => k -> find(k)).toMap
  }

  private def runComponents(edges: Seq[(Long, Long)]): Map[Long, Long] =
    Dedup.components(edges.toDF("a", "b"))
      .as[(Long, Long)].collect().toMap

  test("components: a long path needs multiple propagation rounds") {
    // 0-1-2-...-9 is diameter 9: this exercises the convergence loop,
    // not just one iteration.
    val path = (0L until 9L).map(i => (i, i + 1))
    assert(runComponents(path) == ufComponents(path))
    assert(runComponents(path).values.toSet == Set(0L))
  }

  test("components: star alternation is diameter-proof on a 64-node chain") {
    // Diameter 63 — min-label propagation would need 63 rounds; the
    // large-star/small-star alternation must land in O(log² n).
    val chain = (0L until 63L).map(i => (i, i + 1))
    assert(runComponents(chain) == ufComponents(chain))
    val rounds = operators.Dedup.lastComponentsRounds.get
    assert(rounds <= 12, s"chain took $rounds rounds — diameter-bound?")
  }

  test("components: chain-of-cliques (the crawl near-dup pathology)") {
    // Cliques {0..3},{10..13},... bridged into one long component:
    // dense local clusters + a global chain, the shape crawl shingling
    // produces. Must collapse to comp 0 for every node.
    val cliques = (0 until 8).flatMap { c =>
      val base = c * 10L
      for (i <- 0 until 4; j <- i + 1 until 4) yield (base + i, base + j)
    }
    val bridges = (0 until 7).map(c => (c * 10L + 3, (c + 1) * 10L))
    val edges = scala.util.Random.shuffle(cliques ++ bridges)
    val got = runComponents(edges)
    assert(got == ufComponents(edges))
    assert(got.values.toSet == Set(0L))
  }

  test("components: disjoint cliques, a bridge, and reversed edges") {
    val edges = Seq(
      (5L, 3L), (3L, 4L), (4L, 5L),          // clique {3,4,5}
      (10L, 11L), (12L, 11L), (10L, 12L),    // clique {10,11,12}
      (20L, 21L),                            // isolated pair
      (5L, 10L))                             // bridge merges the cliques
    val got = runComponents(edges)
    assert(got == ufComponents(edges))
    assert(got(12L) == 3L && got(21L) == 20L)
  }

  test("components emit only nodes that appear in an edge") {
    val got = runComponents(Seq((7L, 2L)))
    assert(got == Map(7L -> 2L, 2L -> 2L))
  }

  test("components: random multigraphs agree with union-find") {
    // Randomized tail coverage past the hand-built shapes: duplicate
    // edges, reversed duplicates, self-contained islands, and merge
    // chains. Few samples — each drives the real distributed loop.
    val rnd = new scala.util.Random(7)
    (1 to 8).foreach { _ =>
      val n = 2 + rnd.nextInt(9)
      val edges = Seq.fill(1 + rnd.nextInt(14)) {
        val a = rnd.nextInt(n).toLong
        val b = rnd.nextInt(n).toLong
        if (a == b) (a, b + 100L) else (a, b) // avoid self-loop, keep node
      }
      assert(runComponents(edges) == ufComponents(edges),
        s"mismatch on edges $edges")
    }
  }

  test("dedup_components clusters agree with the pair query at sf0.001") {
    val pairs = SparkEntry.queries("near_dedup")(spark, sfDir)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSeq
    val comps = SparkEntry.queries("dedup_components")(spark, sfDir)
      .as[(Long, Long)].collect().toMap
    assert(comps == ufComponents(pairs))
  }

  test("capPerSource: skewed strata capped at the budget, deterministic") {
    val docs = ((1L to 100L).map(i => (i, "big")) ++
        (101L to 110L).map(i => (i, "small")) ++
        Seq((111L, "tiny"))).toDF("doc_id", "source")
    val budget = Seq(Tuple1(5L)).toDF("budget")
    val got = Pipeline.capPerSource(docs, budget)
      .as[(String, Long)].collect().toSeq.sorted
    val bySource = got.groupBy(_._1).view.mapValues(_.size).toMap
    assert(bySource == Map("big" -> 5, "small" -> 5, "tiny" -> 1))
    // Deterministic: a re-run (different partitioning) picks the same rows.
    val again = Pipeline.capPerSource(docs.repartition(7), budget)
      .as[(String, Long)].collect().toSeq.sorted
    assert(again == got)
    // The pick is the md5-rank prefix, not the id order.
    val expectBig = (1L to 100L)
      .sortBy(i => (java.security.MessageDigest.getInstance("MD5")
        .digest(i.toString.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString, i))
      .take(5).toSet
    assert(got.filter(_._1 == "big").map(_._2).toSet == expectBig)
  }

  test("source_cap: heap form equals the window form on the same key") {
    val heap = SparkEntry.queries("source_cap")(spark, sfDir)
      .as[(String, Long)].collect().toSeq
    val h = graft.functions.TextFns.hash56(col("doc_id").cast("string"))
    val window = Tables.documents(spark, sfDir)
      .withColumn("rk", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("source"))
          .orderBy(h, col("doc_id"))))
      .filter(col("rk") <= Pipeline.SOURCE_CAP_K)
      .select(col("source"), col("doc_id"))
      .orderBy(col("source"), col("doc_id"))
      .as[(String, Long)].collect().toSeq
    assert(heap == window)
  }

  test("token_budget_pack: bucketed prefix sum equals the global window") {
    val got = SparkEntry.queries("token_budget_pack")(spark, sfDir)
      .as[(Long, Long, Double, Long)].collect().toSeq
    val q = Pipeline.docQuality(spark, sfDir)
      .select(col("doc_id"), col("n_tokens"), col("quality"))
    val wGlobal = org.apache.spark.sql.expressions.Window
      .orderBy(col("quality").desc, col("doc_id"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    val budget = q.agg(floor(sum(col("n_tokens")) / 2).cast("long"))
      .collect().head.getLong(0)
    val naive = q.withColumn("cum_tokens", sum(col("n_tokens")).over(wGlobal).cast("long"))
      .filter(col("cum_tokens") <= budget)
      .select(col("doc_id"), col("n_tokens").cast("long"), col("quality"),
        col("cum_tokens"))
      .orderBy(col("doc_id"))
      .as[(Long, Long, Double, Long)].collect().toSeq
    assert(got == naive && got.nonEmpty)
  }

  test("packSequences: two-level prefix sum equals the naive global window (seeded fuzz)") {
    // The gate pins the fixture against DuckDB's single global window;
    // this fuzzes the √-super-bucket recursion on shapes the fixture
    // can't produce — sparse ids (empty buckets), zero-token docs,
    // bucket-boundary straddles — against a driver-side replay.
    val rnd = new scala.util.Random(1413L)
    for (_ <- 1 to 3) {
      val span = 2000 + rnd.nextInt(6000)
      val data = (0L until span.toLong)
        .filter(_ => rnd.nextDouble() < 0.4)
        .map(id => (id, rnd.nextInt(600).toLong))
      val got = Pipeline.packSequences(data.toDF("doc_id", "n_tokens"))
        .as[(Long, Long, Long, Long, Boolean)].collect().toSeq
      var cum = 0L
      val want = data.map { case (id, nt) =>
        val start = cum; cum += nt
        val seqId = start / Pipeline.SEQ_LEN
        val crosses = nt > 0 && (start + nt - 1) / Pipeline.SEQ_LEN != seqId
        (id, nt, seqId, start % Pipeline.SEQ_LEN, crosses)
      }
      assert(got == want && got.nonEmpty)
    }
  }

  test("curation_pipeline output satisfies every stage's constraint") {
    val out = SparkEntry.queries("curation_pipeline")(spark, sfDir)
      .as[(Long, String, Long, Double, Long)].collect().toSeq
    assert(out.nonEmpty)
    // Stage 1: quality floor.
    assert(out.forall(_._4 >= Pipeline.QUALITY_FLOOR))
    // Stage 4: per-source cap.
    assert(out.groupBy(_._2).values.forall(_.size <= Pipeline.SOURCE_CAP_K))
    // Stage 3: no non-canonical near-dup cluster member survives.
    val dropped = operators.Dedup.nearDupNonCanonical(spark, sfDir)
      .as[Long].collect().toSet
    assert(out.forall(r => !dropped.contains(r._1)))
    // Stage 1b: no repetition-flagged doc survives.
    val repFlagged = SparkEntry.queries("doc_repetition")(spark, sfDir)
      .filter(col("is_repetitive")).select("doc_id").as[Long].collect().toSet
    assert(out.forall(r => !repFlagged.contains(r._1)))
    // Stage 5: the kept set is a PREFIX of the (quality DESC, doc_id)
    // order (cum is non-decreasing, so the budget cut can't skip),
    // hence each cum_tokens is exactly the previous plus n_tokens.
    val packed = out.sortBy(r => (-r._4, r._1))
    assert(packed.head._5 == packed.head._3)
    packed.sliding(2).foreach {
      case Seq(a, b) => assert(b._5 == a._5 + b._3)
      case _ =>
    }
  }

  test("applyMixTargets: downsampling truncates by md5 rank, small sources keep all") {
    // The gate fixture is balanced (targets == source sizes), so the
    // truncation path only fires here: a skewed corpus with explicit
    // targets — the big source must keep EXACTLY its target, picked by
    // md5-rank prefix; a target past the source size keeps everything.
    val docs = ((1L to 100L).map(i => ("big", i)) ++
        (201L to 210L).map(i => ("small", i))).toDF("source", "doc_id")
    val targets = Seq(("big", 40L), ("small", 12L)).toDF("source", "target_docs")
    val got = Pipeline.applyMixTargets(docs, targets)
      .as[(String, Long)].collect().toSeq
    val bySource = got.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    assert(bySource("big").size == 40 && bySource("small") == (201L to 210L).toSet)
    val expectBig = (1L to 100L)
      .sortBy(i => (java.security.MessageDigest.getInstance("MD5")
        .digest(i.toString.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString, i))
      .take(40).toSet
    assert(bySource("big") == expectBig)
  }

  test("md5 bucketed selection == naive per-source window, mid-bucket targets") {
    // The decomposition's exactness proof at spec level: a corpus big
    // enough that every source spans many md5 buckets, targets chosen
    // to land strictly inside a bucket, compared against the naive
    // single-window form the DuckDB oracle runs.
    val docs = ((1L to 2800L).map(i => ("big", i)) ++
        (3001L to 3190L).map(i => ("mid", i)) ++
        Seq(("tiny", 4001L))).toDF("source", "doc_id")
    val targets = Seq(("big", 977L), ("mid", 55L), ("tiny", 100L))
      .toDF("source", "target_docs")
    val got = Pipeline.applyMixTargets(docs, targets)
      .as[(String, Long)].collect().toSet
    val naive = docs.join(broadcast(targets), "source")
      .withColumn("rk", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("source"))
          .orderBy(md5(col("doc_id").cast("string")), col("doc_id"))))
      .filter(col("rk") <= col("target_docs"))
      .select(col("source"), col("doc_id"))
      .as[(String, Long)].collect().toSet
    assert(got == naive)
    assert(got.count(_._1 == "big") == 977 && got.count(_._1 == "mid") == 55)
    assert(got.count(_._1 == "tiny") == 1)
  }

  test("md5 bucketed selection fuzz: random corpora and targets equal the window") {
    // Seed-deterministic randomized instances: skewed source sizes,
    // targets drawn across the whole [0, size+slack] range so every
    // bucket class (keep-whole, boundary, drop, target>size, target=0)
    // is hit across iterations.
    val rnd = new scala.util.Random(4242)
    for (round <- 1 to 6) {
      val sources = (0 until 1 + rnd.nextInt(4)).map(i => s"s$i")
      val docs = sources.flatMap { s =>
        val size = 1 + rnd.nextInt(400)
        // Non-contiguous ids so the md5 order is unrelated to insertion.
        Seq.fill(size)(rnd.nextLong(1000000L)).distinct.map(id => (s, id))
      }.toDF("source", "doc_id")
      val targets = sources.map(s => (s, rnd.nextLong(450L))).toDF("source", "target_docs")
      val got = Pipeline.applyMixTargets(docs, targets)
        .as[(String, Long)].collect().toSet
      val naive = docs.join(broadcast(targets), "source")
        .withColumn("rk", row_number().over(
          org.apache.spark.sql.expressions.Window.partitionBy(col("source"))
            .orderBy(md5(col("doc_id").cast("string")), col("doc_id"))))
        .filter(col("rk") <= col("target_docs"))
        .select(col("source"), col("doc_id"))
        .as[(String, Long)].collect().toSet
      assert(got == naive, s"round $round: bucketed != window " +
        s"(only-bucketed=${(got -- naive).take(3)}, only-window=${(naive -- got).take(3)})")
    }
  }

  test("mix_weights: weights normalize and targets re-fill the corpus") {
    val out = SparkEntry.queries("mix_weights")(spark, sfDir)
      .as[(String, Long, Double, Long)].collect().toSeq
    val total = out.map(_._2).sum
    assert(math.abs(out.map(_._3).sum - 1.0) < 1e-4)
    // Half-up per-source rounding drifts by at most half a doc each.
    assert(math.abs(out.map(_._4).sum - total) <= out.size / 2 + 1)
    // T<1 flattens: no source's target may deviate from proportional
    // in the WRONG direction (small sources gain, large ones lose).
    val avg = total.toDouble / out.size
    out.foreach { case (_, n, _, tgt) =>
      if (n < avg) assert(tgt >= n) else if (n > avg) assert(tgt <= n)
    }
  }

  test("pii_scrub: counts match the planting schedule and nothing survives the rewrite") {
    val out = SparkEntry.queries("pii_scrub")(spark, sfDir)
      .select(col("doc_id"), col("n_emails"), col("n_phones"), col("n_ips"))
      .as[(Long, Int, Int, Int)].collect().toSeq
    assert(out.nonEmpty)
    // The fixture corpus is PII-free word salad, so detection counts
    // are exactly the deterministic planting schedule — a non-planted
    // doc detecting anything (or a planted one detecting extra) means
    // a pattern matched raw fixture text and the oracle's exactness
    // claim is void.
    out.foreach { case (id, e, p, ip) =>
      assert(e == (if (id % 7 == 0) 1 else 0), s"doc $id emails $e")
      assert(p == (if (id % 11 == 0) 1 else 0), s"doc $id phones $p")
      assert(ip == (if (id % 13 == 0) 1 else 0), s"doc $id ips $ip")
    }
    assert(out.exists(_._2 > 0) && out.exists(_._3 > 0) && out.exists(_._4 > 0))
    // Redaction completeness on a raw-text replay: scrubbing the worst
    // doc (all three planted: id % 1001 == 0 → doc 0) leaves no match
    // for any pattern, and placeholders land where PII was.
    val text = Tables.documents(spark, sfDir)
      .filter(col("doc_id") === 0L).select(col("text")).as[String].head()
    val planted = s"$text contact user0@example.com now call 415-555-0000 today from 10.0.0.0"
    val scrubbed = planted
      .replaceAll(Pipeline.PII_EMAIL, "<EMAIL>")
      .replaceAll(Pipeline.PII_PHONE, "<PHONE>")
      .replaceAll(Pipeline.PII_IP, "<IP>")
    for (pat <- Seq(Pipeline.PII_EMAIL, Pipeline.PII_PHONE, Pipeline.PII_IP))
      assert(!pat.r.findFirstIn(scrubbed).isDefined,
        s"pattern $pat survived the rewrite: $scrubbed")
    assert(scrubbed.endsWith("contact <EMAIL> now call <PHONE> today from <IP>"))
  }

  test("stratified_sample budget halves the smallest source") {
    val out = SparkEntry.queries("stratified_sample")(spark, sfDir)
      .groupBy("source").agg(count(lit(1)).as("n"))
      .as[(String, Long)].collect().toMap
    val counts = Tables.documents(spark, sfDir)
      .groupBy("source").agg(count(lit(1)).as("n"))
      .as[(String, Long)].collect().toMap
    val budget = math.max(1L, counts.values.min / 2)
    assert(out.values.forall(_ == budget) && out.keySet == counts.keySet)
  }
}
