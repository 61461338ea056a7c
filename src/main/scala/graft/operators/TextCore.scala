package graft.operators

import graft.{QueryDef, QueryModule, Tables}
import graft.functions.TextFns
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Text-analytics core — the reference's tokenize→count family (9 of its
  * 17 workloads tokenize text): WordCount
  * (`/root/reference/MapReduce/Counting/WordCount.java:53-118`), PerfectX
  * (`MapReduce/Counting/PerfectX.java:58-73`), bigram relative frequency
  * (`Spark/Bigram/ComputeBigramRelativeFrequencyPairs.scala:52-87`,
  * `…Stripes.scala:44-61`) and pairs/stripes PMI
  * (`Spark/PMI/PairsPMI.scala:44-87`, `StripesPMI.scala:58-91`).
  *
  * The corpus is `documents.text` (one row = one "line" in the
  * reference's line-oriented model, FIXTURES.md). Tokenization is the
  * shared bespin-parity column expression [[TextFns.tokenize]].
  *
  * Spark-first design notes (vs the reference's hand-built dataflows):
  *   - the `(a,*)` marginal-key protocol + custom partitioner + secondary
  *     sort of the reference's relative-frequency jobs collapses to one
  *     `Window.partitionBy(w1)` sum (SURVEY §2.5);
  *   - per-doc pair expansion is a pure array expression
  *     (`transform`/`filter`/`flatten` + one `explode`) — no self-join
  *     shuffle, no UDF; the only shuffles are the final groupBys;
  *   - the stripes variants materialize the word → Map(coword → value)
  *     stripe with `map_from_entries(collect_list(...))` — the map form
  *     the reference shuffles as `HMapStFW` — then explode back to rows
  *     for the oracle-comparable output (SURVEY §7.3: MapType columns
  *     can't hash-compare in DuckDB).
  *
  * 100 TB posture: every pipeline is explode → groupBy over a bounded
  * vocabulary; partial aggregation makes the shuffle O(|vocab|) per
  * partition regardless of corpus size. No driver-side state except the
  * O(1) corpus-line count that PMI needs (the reference reads the same
  * scalar from a Hadoop counter, `PairsPMI.java:279`) — carried as a
  * 1-row broadcast-crossJoin DataFrame, not a collected literal.
  */
object TextCore extends QueryModule {

  /** PerfectX trigger word. The reference counts words following
    * "perfect" (`PerfectX.java:61-71`); the fixture vocabulary has no
    * "perfect", so the trigger is "spark" (documented single-point
    * substitution, same rule as FIXTURES.md's column substitutions). */
  val TRIGGER = "spark"

  /** PMI co-occurrence threshold (the reference's `-threshold` arg;
    * assignment default 10 — `PairsPMI.scala:71`). */
  val PMI_THRESHOLD = 10

  private def toks(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(col("doc_id"), TextFns.tokenize(col("text")).as("tokens"))

  /** DuckDB CTE prefix producing (doc_id, ts) tokenized docs. */
  private val tokCte =
    s"WITH t AS (SELECT doc_id, ${TextFns.tokenizeSql("text")} AS ts FROM documents)"

  // --- wordcount (WordCount.java:53-118; word → total occurrences) -------
  def wordcount(spark: SparkSession, dir: String): DataFrame =
    toks(spark, dir)
      .select(explode(col("tokens")).as("word"))
      .groupBy(col("word"))
      .agg(count(lit(1)).as("cnt"))
      .orderBy(col("word"))

  val wordcountSql =
    s"""$tokCte, w AS (SELECT unnest(ts) AS word FROM t)
       |SELECT word, count(*) AS cnt FROM w GROUP BY word ORDER BY word""".stripMargin

  // --- heavy_hitters: Misra–Gries candidates + exact recount --------------

  /** Sketch counters; the mergeable-summary error bound is
    * total/(HH_K+1), far below the report threshold, so no qualifying
    * token can be missed. */
  val HH_K = 64
  /** Heavy = cnt · HH_DENOM ≥ total (integer arithmetic — no float
    * threshold to disagree across engines). */
  val HH_DENOM = 30L

  /** The 1-row (sketch, total) aggregate pass — split out so PlanSpec
    * can pin its partial+final ObjectHashAggregate shape (the gate
    * plan hides it behind the checkpoint below). */
  private[graft] def heavyHitterSketch(spark: SparkSession,
      dir: String): DataFrame = {
    val words = toks(spark, dir).select(explode(col("tokens")).as("word"))
    val mg = udaf(new graft.functions.MisraGries(HH_K))
    words.agg(mg(col("word")).as("sk"), count(lit(1)).as("total"))
  }

  /** Tokens occupying ≥ 1/[[HH_DENOM]] of the corpus, found the
    * scale-correct way: a [[graft.functions.MisraGries]] sketch pass
    * bounds the candidate set to [[HH_K]] entries per partial buffer
    * (map-side combine, O(k) shuffle records — a billion-distinct
    * column never materializes a billion-row aggregate), then an EXACT
    * recount of the ≤ k candidates (broadcast semi-join, never a
    * collect) yields the deterministic final answer. `wordcount`+HAVING
    * gives the same rows on a corpus whose distinct count fits memory
    * — which is exactly what the DuckDB oracle does, so the gate
    * proves the sketch path drops nothing. */
  def heavyHitters(spark: SparkSession, dir: String): DataFrame = {
    val words = toks(spark, dir).select(explode(col("tokens")).as("word"))
    // Sketch and corpus total ride ONE aggregate pass (they were two
    // separate scan+tokenize+explode subtrees — r20 optimization
    // round); the 1-row result is lazily checkpointed because both the
    // candidate explode and the total cross-join consume it.
    val skTot = heavyHitterSketch(spark, dir)
      .localCheckpoint(false)
    val cand = skTot.select(explode(map_keys(col("sk.m"))).as("word"))
    words.join(broadcast(cand), Seq("word"), "left_semi")
      .groupBy(col("word")).agg(count(lit(1)).as("cnt"))
      .crossJoin(broadcast(skTot.select(col("total"))))
      .filter(col("cnt") * HH_DENOM >= col("total"))
      .select(col("word"), col("cnt"))
      .orderBy(col("word"))
  }

  val heavyHittersSql =
    s"""$tokCte, w AS (SELECT unnest(ts) AS word FROM t),
       |tot AS (SELECT count(*) AS total FROM w)
       |SELECT word, count(*) AS cnt FROM w, tot
       |GROUP BY word, tot.total HAVING count(*) * $HH_DENOM >= tot.total
       |ORDER BY word""".stripMargin

  // --- perfectx (PerfectX.java:58-73: count words after the trigger,
  //     keep those seen more than once, `:122-124`) ----------------------
  def perfectx(spark: SparkSession, dir: String): DataFrame =
    toks(spark, dir)
      .select(explode(TextFns.bigrams(col("tokens"))).as("bg"))
      .filter(col("bg.w1") === lit(TRIGGER))
      .select(col("bg.w2").as("word"))
      .groupBy(col("word"))
      .agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") > 1)
      .orderBy(col("word"))

  val perfectxSql =
    s"""$tokCte,
       |idx AS (SELECT ts, unnest(range(1, len(ts))) AS i FROM t WHERE len(ts) > 1),
       |bg AS (SELECT ts[i] AS w1, ts[i+1] AS w2 FROM idx)
       |SELECT w2 AS word, count(*) AS cnt FROM bg WHERE w1 = '$TRIGGER'
       |GROUP BY w2 HAVING count(*) > 1 ORDER BY word""".stripMargin

  // --- bigram relative frequency, pairs form
  //     (ComputeBigramRelativeFrequencyPairs.scala:52-87). The reference's
  //     `(a,*)` marginal emission + custom partitioner + in-partition
  //     running total becomes a Window marginal. ------------------------
  def bigramRelfreq(spark: SparkSession, dir: String): DataFrame = {
    val counts = toks(spark, dir)
      .select(explode(TextFns.bigrams(col("tokens"))).as("bg"))
      .select(col("bg.w1").as("w1"), col("bg.w2").as("w2"))
      .groupBy(col("w1"), col("w2"))
      .agg(count(lit(1)).as("cnt"))
    counts
      .withColumn("relfreq",
        round(col("cnt") / sum(col("cnt")).over(Window.partitionBy(col("w1"))), 6))
      .orderBy(col("w1"), col("w2"))
  }

  val bigramRelfreqSql =
    s"""$tokCte,
       |idx AS (SELECT ts, unnest(range(1, len(ts))) AS i FROM t WHERE len(ts) > 1),
       |bg AS (SELECT ts[i] AS w1, ts[i+1] AS w2 FROM idx),
       |c AS (SELECT w1, w2, count(*) AS cnt FROM bg GROUP BY w1, w2)
       |SELECT w1, w2, cnt,
       |  round(cnt / sum(cnt) OVER (PARTITION BY w1), 6) AS relfreq
       |FROM c ORDER BY w1, w2""".stripMargin

  // --- bigram relative frequency, stripes form
  //     (ComputeBigramRelativeFrequencyStripes.scala:44-61): build the
  //     word → Map(coword → relfreq) stripe, then explode back to rows. --
  def bigramRelfreqStripes(spark: SparkSession, dir: String): DataFrame = {
    val counts = toks(spark, dir)
      .select(explode(TextFns.bigrams(col("tokens"))).as("bg"))
      .select(col("bg.w1").as("w1"), col("bg.w2").as("w2"))
      .groupBy(col("w1"), col("w2"))
      .agg(count(lit(1)).as("cnt"))
    // The stripe: one row per w1 with the full co-word map, row-normalized
    // exactly as the reference's per-stripe `sum`+divide (`…Stripes.scala:58-61`).
    val stripes = counts
      .groupBy(col("w1"))
      .agg(map_from_entries(sort_array(collect_list(struct(col("w2"), col("cnt")))))
        .as("stripe"))
      .select(col("w1"),
        transform_values(col("stripe"),
          (_, v) => v / aggregate(map_values(col("stripe")), lit(0L), _ + _))
          .as("stripe"))
    stripes
      .select(col("w1"), explode(col("stripe")).as(Seq("w2", "rf")))
      .select(col("w1"), col("w2"), round(col("rf"), 6).as("relfreq"))
      .orderBy(col("w1"), col("w2"))
  }

  val bigramRelfreqStripesSql =
    s"""$tokCte,
       |idx AS (SELECT ts, unnest(range(1, len(ts))) AS i FROM t WHERE len(ts) > 1),
       |bg AS (SELECT ts[i] AS w1, ts[i+1] AS w2 FROM idx),
       |c AS (SELECT w1, w2, count(*) AS cnt FROM bg GROUP BY w1, w2)
       |SELECT w1, w2,
       |  round(cnt / sum(cnt) OVER (PARTITION BY w1), 6) AS relfreq
       |FROM c ORDER BY w1, w2""".stripMargin

  // --- PMI core shared by the pairs and stripes forms -------------------
  // Reference semantics (PairsPMI.scala:44-87): per line, the first 40
  // distinct tokens; c(w) = #lines containing w; c(a,b) = #lines
  // containing both; PMI = log10(N·c(a,b) / (c(a)·c(b))).
  private def pmiFrom(pairCounts: DataFrame, docTokens: DataFrame): DataFrame = {
    val nDf = docTokens.agg(count(lit(1)).as("n"))
    val words = docTokens.select(col("doc_id"), explode(col("toks")).as("w"))
    val wc = words.groupBy(col("w")).agg(count(lit(1)).as("c"))
    pairCounts
      .join(broadcast(wc.select(col("w").as("w1"), col("c").as("c1"))), "w1")
      .join(broadcast(wc.select(col("w").as("w2"), col("c").as("c2"))), "w2")
      .crossJoin(broadcast(nDf))
      .select(col("w1"), col("w2"),
        round(log10(col("n") * col("cnt") / (col("c1") * col("c2"))), 6).as("pmi"),
        col("cnt"))
      .orderBy(col("w1"), col("w2"))
  }

  // Deliberately NO repartition boundary here (unlike Dedup.shingles):
  // the three consumers (pair expansion, wc marginal, corpus count)
  // each tokenize once per SCAN, not per array reference — the pair
  // expansion's nested lambdas bind `toks` as one projection input, and
  // the groupBys materialize right above it. A/B at sf0.1 measured the
  // exchange at +0.4s vs ~0.15s for the three extra tokenize passes;
  // the occasional 2.6-3.2s bench readings are machine noise (the
  // adaptive third bench run absorbs them).
  private def docTokens(spark: SparkSession, dir: String): DataFrame =
    toks(spark, dir)
      .select(col("doc_id"), TextFns.first40Distinct(col("tokens")).as("toks"))

  /** All ordered co-occurring pairs per doc as a pure array expression
    * (reference: `combinations(2).flatMap(_.permutations)`,
    * `PairsPMI.scala:64`) — no self-join, one explode, one groupBy.
    * Only the w1 < w2 direction is exploded and aggregated (tokens are
    * per-doc DISTINCT, so c(a,b) = c(b,a) exactly); the mirror
    * direction is added back AFTER the count+threshold — halving the
    * explode volume and the shuffle's bytes for identical output rows
    * (guide §2.3 shuffle-fewer-bytes; r20 optimization round). */
  private def pairCounts(dt: DataFrame): DataFrame = {
    val half = dt.select(explode(
        flatten(transform(col("toks"), a =>
          transform(filter(col("toks"), b => b > a),
            b => struct(a.as("w1"), b.as("w2")))))).as("p"))
      .select(col("p.w1").as("w1"), col("p.w2").as("w2"))
      .groupBy(col("w1"), col("w2"))
      .agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") >= PMI_THRESHOLD)
      .localCheckpoint(false)
    half.unionAll(
      half.select(col("w2").as("w1"), col("w1").as("w2"), col("cnt")))
  }

  // --- pairs PMI (PairsPMI.scala:44-87) ---------------------------------
  def pairsPmi(spark: SparkSession, dir: String): DataFrame = {
    val dt = docTokens(spark, dir)
    pmiFrom(pairCounts(dt), dt)
  }

  /** Shared oracle: the pairs and stripes programs must agree exactly. */
  private val pmiSql =
    s"""$tokCte,
       |d AS (SELECT doc_id, list_distinct(ts[1:40]) AS toks FROM t),
       |n AS (SELECT count(*) AS n FROM d),
       |w AS (SELECT doc_id, unnest(toks) AS w FROM d),
       |wc AS (SELECT w, count(*) AS c FROM w GROUP BY w),
       |p AS (SELECT a.w AS w1, b.w AS w2 FROM w a JOIN w b
       |      ON a.doc_id = b.doc_id AND a.w <> b.w),
       |pc AS (SELECT w1, w2, count(*) AS cnt FROM p GROUP BY w1, w2
       |       HAVING count(*) >= $PMI_THRESHOLD)
       |SELECT pc.w1, pc.w2,
       |  round(log10(n.n * pc.cnt / (c1.c * c2.c)), 6) AS pmi, pc.cnt AS cnt
       |FROM pc
       |JOIN wc c1 ON pc.w1 = c1.w
       |JOIN wc c2 ON pc.w2 = c2.w
       |CROSS JOIN n
       |ORDER BY pc.w1, pc.w2""".stripMargin

  // --- stripes PMI (StripesPMI.scala:58-91): aggregate per-word stripes
  //     (MapType co-occurrence maps), then explode back to pair rows. ----
  def stripesPmi(spark: SparkSession, dir: String): DataFrame = {
    val dt = docTokens(spark, dir)
    // Stripe assembly: rows → per-w1 map (the reference's HMapStFW merge,
    // `StripesPMI.scala:71-73`) → explode back for the comparable output.
    val stripes = pairCounts(dt)
      .groupBy(col("w1"))
      .agg(map_from_entries(sort_array(collect_list(struct(col("w2"), col("cnt")))))
        .as("stripe"))
    val pairs = stripes
      .select(col("w1"), explode(col("stripe")).as(Seq("w2", "cnt")))
    pmiFrom(pairs, dt)
  }

  override def entries: Seq[QueryDef] = Seq(
    QueryDef("wordcount", wordcount, Some(wordcountSql),
      "word → total occurrences over documents.text"),
    QueryDef("heavy_hitters", heavyHitters, Some(heavyHittersSql),
      "Misra-Gries sketch candidates + exact recount (two-phase)"),
    QueryDef("perfectx", perfectx, Some(perfectxSql),
      s"words following '$TRIGGER', kept when seen more than once"),
    QueryDef("bigram_relfreq", bigramRelfreq, Some(bigramRelfreqSql),
      "bigram relative frequency, pairs form (Window marginal)"),
    QueryDef("bigram_relfreq_stripes", bigramRelfreqStripes, Some(bigramRelfreqStripesSql),
      "bigram relative frequency via MapType stripes"),
    QueryDef("pairs_pmi", pairsPmi, Some(pmiSql),
      s"pointwise mutual information, pairs form, threshold $PMI_THRESHOLD"),
    QueryDef("stripes_pmi", stripesPmi, Some(pmiSql),
      "PMI via MapType stripes — must agree exactly with pairs_pmi"))
}
