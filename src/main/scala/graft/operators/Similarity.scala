package graft.operators

import graft.{QueryDef, QueryModule, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over `embeddings.embedding` (ARRAY<FLOAT>, 64-d) —
  * brief north star, no reference counterpart.
  *
  *   - `cosine_topk`: brute-force exact top-k for a query workload —
  *     the correctness baseline. Work is O(|queries|·|corpus|), the
  *     shape of a query-serving scan: the query side is broadcast, the
  *     corpus side streams, nothing is collected.
  *   - `ann_lsh_topk`: the scale path — random-hyperplane (sign) LSH;
  *     16-bit signatures, banded into 4 chunks; candidates share ≥1
  *     chunk; exact cosine re-ranking within candidates only. The
  *     oracle replicates the identical algorithm (hyperplanes inlined
  *     as literals), so the check is exact, not approximate.
  *
  * All vector math is pure column expressions (`zip_with`/`aggregate`
  * after widening float→double) inside codegen; no UDF, no driver-side
  * vectors. Cosines are rounded to 6 decimals and ranked by
  * (rounded cosine desc, vec_id) so rank boundaries cannot diverge
  * between engines.
  */
object Similarity extends QueryModule {

  /** Query workload: every 50th vector. */
  val QUERY_MOD = 50
  val TOP_K = 5

  /** Random-hyperplane LSH: 16 Rademacher (±1) planes over 64 dims,
    * 4 chunks × 4 bits. */
  val N_PLANES = 16
  val DIM = 64
  val ANN_CHUNKS = 4
  val ANN_CHUNK_BITS = N_PLANES / ANN_CHUNKS

  val PLANES: Array[Array[Double]] = {
    val rnd = new scala.util.Random(43)
    Array.fill(N_PLANES, DIM)(if (rnd.nextBoolean()) 1.0 else -1.0)
  }

  private def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

  /** (vec_id, v double[], nrm): the normalized corpus. */
  private def corpus(spark: SparkSession, dir: String): DataFrame =
    Tables.embeddings(spark, dir)
      .select(col("vec_id"),
        transform(col("embedding"), _.cast("double")).as("v"))
      .withColumn("nrm",
        sqrt(aggregate(transform(col("v"), x => x * x), lit(0.0), (a, x) => a + x)))

  // --- cosine_topk: exact brute-force baseline ---------------------------
  def cosineTopk(spark: SparkSession, dir: String): DataFrame = {
    val e = corpus(spark, dir)
    val q = e.filter(col("vec_id") % QUERY_MOD === 0)
      .select(col("vec_id").as("query_id"), col("v").as("qv"), col("nrm").as("qnrm"))
    val scored = e.crossJoin(broadcast(q))
      .filter(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id"),
        round(dot(col("qv"), col("v")) / (col("qnrm") * col("nrm")), 6).as("cosine"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("vec_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= TOP_K)
      .orderBy(col("query_id"), col("rank"))
  }

  private val corpusSql =
    """WITH e AS (SELECT vec_id,
      |  list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM embeddings),
      |n AS (SELECT vec_id, v,
      |  sqrt(list_sum(list_transform(v, x -> x * x))) AS nrm FROM e)""".stripMargin

  val cosineTopkSql =
    s"""$corpusSql,
       |p AS (SELECT q.vec_id AS query_id, c.vec_id AS vec_id,
       |  round(list_sum(list_transform(range(1, $DIM + 1), i -> q.v[i] * c.v[i]))
       |        / (q.nrm * c.nrm), 6) AS cosine
       |  FROM n q JOIN n c ON q.vec_id % $QUERY_MOD = 0 AND c.vec_id <> q.vec_id),
       |r AS (SELECT *, CAST(row_number() OVER (
       |        PARTITION BY query_id ORDER BY cosine DESC, vec_id) AS INT) AS rank
       |      FROM p)
       |SELECT query_id, vec_id, cosine, rank FROM r
       |WHERE rank <= $TOP_K ORDER BY query_id, rank""".stripMargin

  // --- ann_lsh_topk: sign-LSH candidates + exact re-rank -----------------
  private def signature(v: Column): Column =
    (0 until N_PLANES).map { p =>
      when(dot(v, typedlit(PLANES(p))) > 0, lit(1 << p)).otherwise(lit(0))
    }.reduce(_ + _)

  def annLshTopk(spark: SparkSession, dir: String): DataFrame = {
    val sigs = corpus(spark, dir).withColumn("sig", signature(col("v")))
    val chunks = sigs.select(col("vec_id"), col("v"), col("nrm"),
        posexplode(array((0 until ANN_CHUNKS).map(c =>
          shiftrightunsigned(col("sig"), c * ANN_CHUNK_BITS)
            .bitwiseAND(lit((1 << ANN_CHUNK_BITS) - 1))): _*)))
      .toDF("vec_id", "v", "nrm", "chunk_idx", "chunk_val")
    val q = chunks.filter(col("vec_id") % QUERY_MOD === 0)
      .select(col("vec_id").as("query_id"), col("v").as("qv"),
        col("nrm").as("qnrm"), col("chunk_idx"), col("chunk_val"))
    // Candidates = corpus vectors sharing ≥1 signature chunk with the query.
    val cand = chunks.join(broadcast(q), Seq("chunk_idx", "chunk_val"))
      .filter(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id"), col("qv"), col("qnrm"),
        col("v"), col("nrm"))
      .dropDuplicates("query_id", "vec_id")
    val scored = cand.select(col("query_id"), col("vec_id"),
      round(dot(col("qv"), col("v")) / (col("qnrm") * col("nrm")), 6).as("cosine"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("vec_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= TOP_K)
      .orderBy(col("query_id"), col("rank"))
  }

  val annLshTopkSql = {
    val planesLit = PLANES
      .map(_.mkString("[", ", ", "]")).mkString("[", ", ", "]")
    s"""$corpusSql,
       |s AS (SELECT vec_id, v, nrm,
       |  CAST(list_sum(list_transform(range(1, $N_PLANES + 1), p ->
       |    CASE WHEN list_sum(list_transform(range(1, $DIM + 1),
       |           i -> v[i] * ($planesLit)[p][i])) > 0
       |         THEN (1 << (p - 1)) ELSE 0 END)) AS INT) AS sig
       |  FROM n),
       |ch AS (SELECT vec_id, v, nrm, c AS chunk_idx,
       |  (sig >> (c * $ANN_CHUNK_BITS)) & ${(1 << ANN_CHUNK_BITS) - 1} AS chunk_val
       |  FROM s, unnest(range(0, $ANN_CHUNKS)) AS u(c)),
       |cand AS (SELECT DISTINCT q.vec_id AS query_id, c.vec_id AS vec_id
       |  FROM ch q JOIN ch c
       |    ON q.chunk_idx = c.chunk_idx AND q.chunk_val = c.chunk_val
       |  WHERE q.vec_id % $QUERY_MOD = 0 AND c.vec_id <> q.vec_id),
       |p AS (SELECT cand.query_id, cand.vec_id,
       |  round(list_sum(list_transform(range(1, $DIM + 1), i -> q.v[i] * c.v[i]))
       |        / (q.nrm * c.nrm), 6) AS cosine
       |  FROM cand
       |  JOIN n q ON q.vec_id = cand.query_id
       |  JOIN n c ON c.vec_id = cand.vec_id),
       |r AS (SELECT *, CAST(row_number() OVER (
       |        PARTITION BY query_id ORDER BY cosine DESC, vec_id) AS INT) AS rank
       |      FROM p)
       |SELECT query_id, vec_id, cosine, rank FROM r
       |WHERE rank <= $TOP_K ORDER BY query_id, rank""".stripMargin
  }

  override def entries: Seq[QueryDef] = Seq(
    QueryDef("cosine_topk", cosineTopk, Some(cosineTopkSql),
      "exact brute-force cosine top-k for the query workload"),
    QueryDef("ann_lsh_topk", annLshTopk, Some(annLshTopkSql),
      "random-hyperplane LSH candidates + exact cosine re-rank"))
}
