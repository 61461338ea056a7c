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
    QueryDef("retrieval_fetch", retrievalFetch, Some(retrievalFetchSql),
      "join retrieval hits back to documents for snippets"),
    QueryDef("topk_per_group", topkPerGroup, Some(topkPerGroupSql),
      "top-k per group via row_number window"),
    QueryDef("topk_per_group_heap", topkPerGroupHeap, Some(topkPerGroupSql),
      "top-k per group via the bounded-PQ typed Aggregator (same oracle)"))
}
