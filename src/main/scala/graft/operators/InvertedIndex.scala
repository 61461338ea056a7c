package graft.operators

import graft.{QueryDef, QueryModule, Tables}
import graft.functions.TextFns
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Inverted index + boolean retrieval + per-group top-k — the
  * reference's IR slice:
  *
  *   - postings build (`BuildInvertedIndexCompressed.java:58-143`):
  *     term → sorted (doc_id, tf) postings. The reference hand-rolls
  *     VInt + delta-gap compression into a MapFile; here the logical
  *     output is `ARRAY<STRUCT<doc_id, tf>>` and Parquet's
  *     delta/dictionary encodings subsume the byte-level work
  *     (SURVEY §4.8).
  *   - boolean retrieval (`BooleanRetrievalCompressed.java:68-123`):
  *     postfix AND/OR queries. The stack evaluator is a driver-side
  *     *query compiler* (as in the reference) — it folds a fixed query
  *     list into `array_intersect`/`array_union` column expressions
  *     over per-term docid sets; no per-query job, no collect.
  *   - per-group top-k (`ExtractTopPersonalizedPageRankNodes.java:58-148`):
  *     the reference's bounded priority queues become
  *     `row_number() OVER (PARTITION BY …) <= k`.
  *
  * 100 TB posture: the index build is explode → two hash aggregations
  * (term,doc) then (term) — all partial-agg friendly. Retrieval pivots
  * only the queried terms (a handful) into one row; document sets for
  * web-scale postings would be sharded (doc-partitioned index), noted
  * in the scaladoc rather than implemented since the reference's
  * semantics are single-list.
  */
object InvertedIndex extends QueryModule {

  /** Fixed retrieval workload (postfix, as the reference's
    * `"waterloo stanford OR cheriton AND"` README examples). Terms are
    * fixture-vocabulary words. */
  val QUERIES: Seq[String] = Seq(
    "spark join AND",
    "hash table OR",
    "spark join AND scan OR",
    "the a AND batch AND",
    "window merge OR stream AND")

  val TOPK_K = 3

  private def termDocTf(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(col("doc_id"), explode(TextFns.tokenize(col("text"))).as("term"))
      .groupBy(col("term"), col("doc_id"))
      .agg(count(lit(1)).as("tf"))

  // --- inverted_index: term → df, cf, sorted postings --------------------
  def invertedIndex(spark: SparkSession, dir: String): DataFrame =
    termDocTf(spark, dir)
      .groupBy(col("term"))
      .agg(
        count(lit(1)).as("df"),
        sum(col("tf")).as("cf"),
        sort_array(collect_list(struct(col("doc_id"), col("tf")))).as("postings"))
      .orderBy(col("term"))

  /** Gate projection of [[invertedIndex]]: the `ARRAY<STRUCT>` postings
    * rendered as `"doc:tf;doc:tf;…"` — nested types crash generic
    * row-comparison harnesses, so the registered entry is scalar-only;
    * the array-typed function above stays the library API. */
  def invertedIndexGate(spark: SparkSession, dir: String): DataFrame =
    invertedIndex(spark, dir).withColumn("postings",
      array_join(transform(col("postings"),
        p => concat_ws(":", p.getField("doc_id"), p.getField("tf"))), ";"))

  val invertedIndexSql =
    s"""WITH t AS (SELECT doc_id, ${TextFns.tokenizeSql("text")} AS ts FROM documents),
       |w AS (SELECT doc_id, unnest(ts) AS term FROM t),
       |tfs AS (SELECT term, doc_id, count(*) AS tf FROM w GROUP BY term, doc_id)
       |SELECT term, count(*) AS df, CAST(sum(tf) AS BIGINT) AS cf,
       |  string_agg(doc_id || ':' || tf, ';' ORDER BY doc_id) AS postings
       |FROM tfs GROUP BY term ORDER BY term""".stripMargin

  // --- boolean_retrieval: postfix AND/OR over docid sets -----------------

  /** Distinct terms referenced by the query workload. */
  private val QUERY_TERMS: Seq[String] =
    QUERIES.flatMap(_.split(" ")).filterNot(t => t == "AND" || t == "OR").distinct

  /** Postfix stack evaluator (reference
    * `BooleanRetrievalCompressed.java:68-87`), generic in the term →
    * docset lookup so the same fold builds the Spark expression and the
    * DuckDB SQL. AND = intersect, OR = union-distinct (`:93-123`). */
  private def evalPostfix[T](query: String, term: String => T,
      and: (T, T) => T, or: (T, T) => T): T =
    query.split(" ").foldLeft(List.empty[T]) {
      case (b :: a :: rest, "AND") => and(a, b) :: rest
      case (b :: a :: rest, "OR") => or(a, b) :: rest
      case (stack, t) => term(t) :: stack
    } match {
      case result :: Nil => result
      case _ => throw new IllegalArgumentException(s"malformed postfix query: $query")
    }

  /** Interactive entry point (the reference's REPL loop,
    * `BooleanRetrievalCompressed.java:208-216`): evaluate ONE arbitrary
    * postfix query against the corpus and return its docid set. The
    * fixed-workload query below reuses the same machinery. */
  def retrieve(spark: SparkSession, dir: String, query: String): DataFrame = {
    val terms = query.split(" ").filterNot(t => t == "AND" || t == "OR").distinct.toSeq
    val docsets = termDocTf(spark, dir)
      .filter(col("term").isin(terms: _*))
      .groupBy(col("term"))
      .agg(sort_array(collect_set(col("doc_id"))).as("docs"))
      .groupBy()
      .pivot("term", terms)
      .agg(first(col("docs")))
    val docs = array_sort(evalPostfix[Column](query,
      t => coalesce(col(s"`$t`"), array().cast("array<long>")),
      (a, b) => array_intersect(a, b),
      (a, b) => array_union(a, b)))
    docsets.select(lit(query).as("query"), size(docs).as("n_docs"), docs.as("docs"))
  }

  def booleanRetrieval(spark: SparkSession, dir: String): DataFrame = {
    // One row holding each queried term's sorted docid set as a column
    // (pivot over the handful of workload terms — never the full vocab).
    val docsets = termDocTf(spark, dir)
      .filter(col("term").isin(QUERY_TERMS: _*))
      .groupBy(col("term"))
      .agg(sort_array(collect_set(col("doc_id"))).as("docs"))
      .groupBy()
      .pivot("term", QUERY_TERMS)
      .agg(first(col("docs")))
    // ALL workload queries evaluate in one projection over that single
    // row — explode of a (query, docs) struct array — so the docsets
    // aggregate runs exactly once by construction (a per-query
    // union-of-branches would re-aggregate per branch unless exchange
    // reuse happened to fire; PlanSpec pins the no-Union shape).
    val results = QUERIES.map { q =>
      val docs = array_sort(evalPostfix[Column](q,
        t => coalesce(col(s"`$t`"), array().cast("array<long>")),
        (a, b) => array_intersect(a, b),
        (a, b) => array_union(a, b)))
      struct(lit(q).as("query"), docs.as("docs"))
    }
    docsets
      .select(explode(array(results: _*)).as("r"))
      .select(col("r.query").as("query"), size(col("r.docs")).as("n_docs"),
        col("r.docs").as("docs"))
      .orderBy(col("query"))
  }

  /** Gate projection of [[booleanRetrieval]]: docid set as a csv string
    * (see [[invertedIndexGate]] for why). */
  def booleanRetrievalGate(spark: SparkSession, dir: String): DataFrame =
    booleanRetrieval(spark, dir)
      .withColumn("docs", array_join(col("docs").cast("array<string>"), ","))

  val booleanRetrievalSql = {
    // One-row pivot of the workload terms' docsets (the SQL mirror of the
    // Spark pivot). Subqueries live in a plain projection here — DuckDB
    // rejects them inside the list-macro lambdas the fold builds below.
    val pivotCols = QUERY_TERMS.map { t =>
      s"coalesce((SELECT list_sort(list(DISTINCT doc_id)) FROM w WHERE term = '$t'), []) AS t_$t"
    }.mkString(", ")
    val rows = QUERIES.map { q =>
      val docs = evalPostfix[String](q,
        t => s"t_$t",
        (a, b) => s"list_sort(list_intersect($a, $b))",
        (a, b) => s"list_sort(list_distinct(list_concat($a, $b)))")
      s"SELECT '$q' AS query, len(list_sort($docs)) AS n_docs, coalesce(array_to_string(list_sort($docs), ','), '') AS docs FROM p"
    }.mkString(" UNION ALL ")
    s"""WITH t AS (SELECT doc_id, ${TextFns.tokenizeSql("text")} AS ts FROM documents),
       |w AS (SELECT doc_id, unnest(ts) AS term FROM t),
       |p AS (SELECT $pivotCols),
       |r AS ($rows)
       |SELECT * FROM r ORDER BY query""".stripMargin
  }

  // --- bm25_rank: ranked retrieval over the same index -------------------

  /** BM25 parameters (the Robertson defaults everyone ships). IDF is
    * the Lucene `ln(1 + (N - df + 0.5)/(df + 0.5))` form — strictly
    * positive, so a degenerate stop-word query can't flip a ranking
    * with negative contributions. */
  val BM25_K1 = 1.2
  val BM25_B = 0.75
  val BM25_K = 5

  /** Fixed free-text ranking workload — the ranked companion of
    * [[QUERIES]] (same fixture vocabulary, no operators). */
  val RANK_QUERIES: Seq[String] = Seq(
    "spark join scan",
    "hash table stream",
    "window merge batch",
    "the a spark")

  /** Ranked retrieval: BM25 top-[[BM25_K]] docs per workload query —
    * boolean retrieval answers WHICH docs match, this answers which
    * match BEST (the reference's IR slice stops at boolean; ranked
    * retrieval is the canonical completion of that surface).
    *
    * Shape, scale-first: tf rows are filtered to the workload's terms
    * BEFORE the (term, doc) aggregate (Catalyst pushes the grouping-col
    * filter below it, so the explode never materializes the full
    * vocabulary); per-term df and the query→term map broadcast (both
    * O(workload)); doc length is a row-wise `size(tokenize())` — no
    * extra shuffle to compute it — and joins the tf rows on doc_id, the
    * one honest equi-join; N/avgdl ride the 1-row broadcast-scalar
    * pattern (`pairs_pmi` precedent). Per-term contributions round at
    * birth (9) and the per-doc sum rounds to 6 — the module's
    * cross-engine float convention — before the rank window.
    */
  private def bm25For(spark: SparkSession, dir: String,
      queries: Seq[String]): DataFrame = {
    import spark.implicits._
    val terms = queries.flatMap(_.split(" ")).filter(_.nonEmpty).distinct
    val qterms = queries.flatMap(q => q.split(" ").filter(_.nonEmpty).distinct
      .map(t => (q, t))).toDF("query", "term")
    // Tiny (doc_id, int) frame consumed by BOTH the scalars aggregate
    // and the contrib join — checkpoint so the corpus is tokenized
    // once, not once per consumer.
    val docs = Tables.documents(spark, dir)
      .select(col("doc_id"), size(TextFns.tokenize(col("text"))).as("dl"))
      .localCheckpoint()
    val scalars = docs.agg(count(lit(1)).as("n_docs"), avg(col("dl")).as("avgdl"))
    // tfs feeds both the contribution rows and the df aggregate — cut
    // the lineage once so the corpus explode doesn't run per branch.
    val tfs = termDocTf(spark, dir).filter(col("term").isin(terms: _*))
      .localCheckpoint()
    val dfs = tfs.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val contrib = tfs
      .join(broadcast(qterms), "term")
      .join(broadcast(dfs), "term")
      .join(docs, "doc_id")
      .crossJoin(broadcast(scalars))
      .withColumn("contrib", round(
        log(lit(1.0) + (col("n_docs") - col("df") + 0.5) / (col("df") + 0.5)) *
          (col("tf") * (BM25_K1 + 1)) /
          (col("tf") + lit(BM25_K1) * (lit(1 - BM25_B) + lit(BM25_B) * col("dl") / col("avgdl"))),
        9))
    val w = Window.partitionBy(col("query"))
      .orderBy(col("score").desc, col("doc_id"))
    contrib.groupBy(col("query"), col("doc_id"))
      .agg(round(sum(col("contrib")), 6).as("score"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= BM25_K)
      .orderBy(col("query"), col("rank"))
  }

  def bm25Rank(spark: SparkSession, dir: String): DataFrame =
    bm25For(spark, dir, RANK_QUERIES)

  /** Interactive entry ([[retrieve]]'s ranked sibling): BM25 top-k for
    * ONE free-text query — drives the REPL's `rank` command. */
  def rank(spark: SparkSession, dir: String, query: String): DataFrame =
    bm25For(spark, dir, Seq(query.trim.toLowerCase))

  val bm25RankSql = {
    val terms = RANK_QUERIES.flatMap(_.split(" ")).distinct
    val qvals = RANK_QUERIES.flatMap(q => q.split(" ").distinct.map(t => s"('$q', '$t')"))
      .mkString(", ")
    s"""WITH t AS (SELECT doc_id, ${TextFns.tokenizeSql("text")} AS ts FROM documents),
       |d AS (SELECT doc_id, len(ts) AS dl FROM t),
       |s AS (SELECT count(*) AS n_docs, avg(dl) AS avgdl FROM d),
       |w AS (SELECT doc_id, unnest(ts) AS term FROM t),
       |tfs AS (SELECT term, doc_id, count(*) AS tf FROM w
       |  WHERE term IN (${terms.map(t => s"'$t'").mkString(", ")})
       |  GROUP BY term, doc_id),
       |dfs AS (SELECT term, count(*) AS df FROM tfs GROUP BY term),
       |q AS (SELECT * FROM (VALUES $qvals) AS q(query, term)),
       |c AS (SELECT q.query, tfs.doc_id,
       |    round(ln(1.0 + (s.n_docs - dfs.df + 0.5) / (dfs.df + 0.5)) *
       |      (tfs.tf * ($BM25_K1 + 1)) /
       |      (tfs.tf + $BM25_K1 * (1 - $BM25_B + $BM25_B * d.dl / s.avgdl)),
       |    9) AS contrib
       |  FROM tfs JOIN q ON q.term = tfs.term
       |    JOIN dfs ON dfs.term = tfs.term
       |    JOIN d ON d.doc_id = tfs.doc_id CROSS JOIN s),
       |a AS (SELECT query, doc_id, round(sum(contrib), 6) AS score
       |  FROM c GROUP BY query, doc_id)
       |SELECT query, doc_id, score, CAST(row_number() OVER (
       |    PARTITION BY query ORDER BY score DESC, doc_id) AS INT) AS rank
       |FROM a QUALIFY rank <= $BM25_K ORDER BY query, rank""".stripMargin
  }

  // --- retrieval_fetch: join hits back to the collection -----------------
  /** The reference echoes each matching sentence by seeking raw byte
    * offsets into the collection (`BooleanRetrievalCompressed.java:160-166`);
    * the Spark-native form joins the hit docids back to the `documents`
    * table and projects a snippet — no byte offsets, plain equi-join
    * with predicate pushdown on the fetch side. */
  val FETCH_QUERY = "spark join AND"
  val SNIPPET_LEN = 60

  def retrievalFetch(spark: SparkSession, dir: String): DataFrame = {
    val hits = booleanRetrieval(spark, dir)
      .filter(col("query") === FETCH_QUERY)
      .select(explode(col("docs")).as("doc_id"))
    hits.join(Tables.documents(spark, dir), Seq("doc_id"))
      .select(col("doc_id"), col("lang"),
        substring(col("text"), 1, SNIPPET_LEN).as("snippet"))
      .orderBy(col("doc_id"))
  }

  val retrievalFetchSql = {
    val docs = evalPostfix[String](FETCH_QUERY,
      t => s"t_$t",
      (a, b) => s"list_sort(list_intersect($a, $b))",
      (a, b) => s"list_sort(list_distinct(list_concat($a, $b)))")
    val pivotCols = QUERY_TERMS.map { t =>
      s"coalesce((SELECT list_sort(list(DISTINCT doc_id)) FROM w WHERE term = '$t'), []) AS t_$t"
    }.mkString(", ")
    s"""WITH t AS (SELECT doc_id, ${TextFns.tokenizeSql("text")} AS ts FROM documents),
       |w AS (SELECT doc_id, unnest(ts) AS term FROM t),
       |p AS (SELECT $pivotCols),
       |h AS (SELECT unnest($docs) AS doc_id FROM p)
       |SELECT d.doc_id, d.lang, substr(d.text, 1, $SNIPPET_LEN) AS snippet
       |FROM h JOIN documents d ON h.doc_id = d.doc_id
       |ORDER BY d.doc_id""".stripMargin
  }

  // --- topk_per_group: row_number over a partitioned window --------------
  /** Top-k docs by n_chars per language — the standalone form of the
    * reference's per-source top-k extraction. */
  def topkPerGroup(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("lang"))
      .orderBy(col("n_chars").desc, col("doc_id"))
    Tables.documents(spark, dir)
      .select(col("lang"), col("doc_id"), col("n_chars"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= TOPK_K)
      .orderBy(col("lang"), col("rank"))
  }

  val topkPerGroupSql =
    s"""SELECT lang, doc_id, n_chars,
       |  CAST(row_number() OVER (
       |    PARTITION BY lang ORDER BY n_chars DESC, doc_id) AS INT) AS rank
       |FROM documents QUALIFY rank <= $TOPK_K ORDER BY lang, rank""".stripMargin

  // --- topk_per_group_heap: bounded-PQ aggregate form --------------------
  /** The same top-k via the [[graft.functions.BoundedTopK]] typed
    * Aggregator: k-bounded partial buffers with map-side combine
    * instead of a full per-group sort — the form that survives
    * billion-row groups (see BoundedTopK's scaladoc). Shares the
    * window form's oracle, proving the two interchangeable. */
  def topkPerGroupHeap(spark: SparkSession, dir: String): DataFrame = {
    val tk = udaf(new graft.functions.BoundedTopK(TOPK_K))
    Tables.documents(spark, dir)
      .groupBy(col("lang"))
      .agg(tk(col("n_chars").cast("long"), col("doc_id")).as("tk"))
      .select(col("lang"), posexplode(col("tk.entries")))
      .toDF("lang", "pos", "e")
      .select(col("lang"), col("e.tie").as("doc_id"),
        col("e.v").as("n_chars"),
        (col("pos") + 1).cast("int").as("rank"))
      .orderBy(col("lang"), col("rank"))
  }

  override def entries: Seq[QueryDef] = Seq(
    QueryDef("inverted_index", invertedIndexGate, Some(invertedIndexSql),
      "term → df/cf/sorted postings over documents"),
    QueryDef("boolean_retrieval", booleanRetrievalGate, Some(booleanRetrievalSql),
      "postfix AND/OR retrieval over per-term docid sets"),
    QueryDef("bm25_rank", bm25Rank, Some(bm25RankSql),
      "BM25 ranked retrieval: top-k docs per free-text workload query"),
    QueryDef("retrieval_fetch", retrievalFetch, Some(retrievalFetchSql),
      "join retrieval hits back to documents for snippets"),
    QueryDef("topk_per_group", topkPerGroup, Some(topkPerGroupSql),
      "top-k per group via row_number window"),
    QueryDef("topk_per_group_heap", topkPerGroupHeap, Some(topkPerGroupSql),
      "top-k per group via the bounded-PQ typed Aggregator (same oracle)"))
}
