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
  *     64-bit signatures, banded into 8 chunks of 8 bits; candidates
  *     share ≥1 chunk; exact cosine re-ranking within candidates only.
  *     The oracle replicates the identical algorithm (hyperplanes
  *     inlined as literals), so the check is exact, not approximate.
  *
  * All vector math is pure column expressions (`zip_with`/`aggregate`
  * after widening float→double) inside codegen; no UDF, no driver-side
  * vectors. Cosines are rounded to 6 decimals and ranked by
  * (rounded cosine desc, vec_id) so rank boundaries cannot diverge
  * between engines.
  */
object Similarity extends QueryModule {

  /** Query workload: a FIXED number of query vectors, chosen by stride
    * (every ⌈n/K⌉-th vec_id) — a serving workload's size is set by the
    * caller, not by corpus growth, so the brute-force baseline stays
    * O(K·n) and the ANN paths O(K·candidates) as the corpus scales.
    * The stride comes from a 1-row count aggregate cross-joined in (no
    * driver collect), exactly like the IVF codebook's. */
  val K_QUERIES = 10
  val TOP_K = 5

  /** Random-hyperplane LSH: 64 Rademacher (±1) planes over 64 dims,
    * banded into 8 chunks × 8 bits (signature is a full long).
    *
    * Width math (the near_dedup-style recall/cost derivation): with
    * p(s) = 1 − θ(s)/π the per-bit agreement at cosine s, a chunk of
    * r = 8 bits matches with p(s)^8 and ≥1 of b = 8 chunks matches
    * with 1 − (1 − p(s)^8)^8 — at s = 0.9, p ≈ 0.856, recall ≈ 0.83;
    * at s = 0.45 (the dedup threshold) recall ≈ 0.22; at s = 0
    * (background) a chunk space of 2^8 = 256 values cuts expected
    * bucket occupancy 16× vs the old 4-bit chunks, so candidate
    * volume is O(b·n²/256) per chunk instead of O(n²/16) — the
    * parameter that had to scale. Production tuning for higher
    * recall at a fixed threshold = more tables (b) or multi-probe,
    * both constants, not structure. */
  val N_PLANES = 64
  val DIM = 64
  val ANN_CHUNKS = 8
  val ANN_CHUNK_BITS = N_PLANES / ANN_CHUNKS

  val PLANES: Array[Array[Double]] = {
    val rnd = new scala.util.Random(43)
    Array.fill(N_PLANES, DIM)(if (rnd.nextBoolean()) 1.0 else -1.0)
  }

  private def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

  /** 1-row (qstride) relation derived from a per-vector DataFrame. */
  private def qstrideDf(perVec: DataFrame): DataFrame =
    perVec.agg(
      ceil(count(lit(1)).cast("double") / K_QUERIES).cast("long").as("qstride"))

  /** Restrict a per-vector DataFrame to the fixed query workload. */
  private def queryWorkload(perVec: DataFrame, strideSrc: DataFrame): DataFrame =
    perVec.crossJoin(broadcast(qstrideDf(strideSrc)))
      .filter(col("vec_id") % col("qstride") === 0)
      .drop("qstride")

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
    val q = queryWorkload(e, e)
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
    s"""WITH e AS (SELECT vec_id,
       |  list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM embeddings),
       |n AS (SELECT vec_id, v,
       |  sqrt(list_sum(list_transform(v, x -> x * x))) AS nrm FROM e),
       |qst AS (SELECT CAST(ceil(CAST(count(*) AS DOUBLE) / $K_QUERIES) AS BIGINT)
       |        AS qstride FROM n)""".stripMargin

  val cosineTopkSql =
    s"""$corpusSql,
       |p AS (SELECT q.vec_id AS query_id, c.vec_id AS vec_id,
       |  round(list_sum(list_transform(range(1, $DIM + 1), i -> q.v[i] * c.v[i]))
       |        / (q.nrm * c.nrm), 6) AS cosine
       |  FROM n q CROSS JOIN qst JOIN n c
       |    ON q.vec_id % qstride = 0 AND c.vec_id <> q.vec_id),
       |r AS (SELECT *, CAST(row_number() OVER (
       |        PARTITION BY query_id ORDER BY cosine DESC, vec_id) AS INT) AS rank
       |      FROM p)
       |SELECT query_id, vec_id, cosine, rank FROM r
       |WHERE rank <= $TOP_K ORDER BY query_id, rank""".stripMargin

  // --- ann_lsh_topk: sign-LSH candidates + exact re-rank -----------------
  /** Row-major flattened plane matrix for the native expression. */
  private val PLANES_FLAT: Array[Double] = PLANES.flatten

  /** Native codegen'd signature: one (plane × dim) loop per row via
    * [[graft.functions.SignLshSignature]] — replaces 64 interpreted
    * `aggregate(zip_with(...))` folds per vector (the round-3 bench
    * regression). SignLshSpec asserts bit parity with the fold form on
    * both the codegen and interpreted paths. */
  private def signature(spark: SparkSession, v: Column): Column = {
    graft.functions.SignLshSignature.register(spark, PLANES_FLAT, DIM)
    call_function(graft.functions.SignLshSignature.FUNC_NAME, v)
  }

  def annLshTopk(spark: SparkSession, dir: String): DataFrame = {
    // repartition = stage boundary: materializes `v` before the
    // chunk-extraction references (CollapseProject would otherwise
    // re-run the float→double transform per derived column).
    val sigs = corpus(spark, dir).repartition(col("vec_id"))
      .withColumn("sig", signature(spark, col("v")))
    val chunks = sigs.select(col("vec_id"), col("v"), col("nrm"),
        posexplode(array((0 until ANN_CHUNKS).map(c =>
          shiftrightunsigned(col("sig"), c * ANN_CHUNK_BITS)
            .bitwiseAND(lit((1L << ANN_CHUNK_BITS) - 1))): _*)))
      .toDF("vec_id", "v", "nrm", "chunk_idx", "chunk_val")
    val q = queryWorkload(chunks, sigs)
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

  /** Planes as a VALUES relation: DuckDB re-materializes an inline
    * nested-list literal on every `[p][i]` access (≈4 min for 500
    * vectors); the join form evaluates each plane row once. The bit
    * value ships as a precomputed BIGINT literal because DuckDB's `<<`
    * refuses to shift into the sign bit (`1::BIGINT << 63` overflows);
    * the per-row sum runs in HUGEINT and casts back to the signed
    * 64-bit signature (adding distinct powers of two never carries, so
    * the sum IS the bit pattern). */
  private def planesCte: String =
    PLANES.zipWithIndex
      .map { case (pl, i) =>
        s"(${i + 1}, [${pl.mkString(", ")}], CAST(${1L << i} AS BIGINT))"
      }
      .mkString("planes(p, pl, bit) AS (VALUES ", ", ", ")")

  private def sigCte: String =
    s"""s0 AS (SELECT vec_id, CAST(sum(
       |    CASE WHEN list_sum(list_transform(range(1, $DIM + 1),
       |           i -> n.v[i] * planes.pl[i])) > 0
       |         THEN planes.bit ELSE 0 END) AS BIGINT) AS sig
       |  FROM n CROSS JOIN planes GROUP BY vec_id),
       |s AS (SELECT n.vec_id, n.v, n.nrm, s0.sig FROM n JOIN s0 USING (vec_id))""".stripMargin

  val annLshTopkSql = {
    s"""$corpusSql,
       |$planesCte,
       |$sigCte,
       |ch AS (SELECT vec_id, v, nrm, c AS chunk_idx,
       |  (sig >> (c * $ANN_CHUNK_BITS)) & ${(1 << ANN_CHUNK_BITS) - 1} AS chunk_val
       |  FROM s, unnest(range(0, $ANN_CHUNKS)) AS u(c)),
       |cand AS (SELECT DISTINCT q.vec_id AS query_id, c.vec_id AS vec_id
       |  FROM ch q CROSS JOIN qst JOIN ch c
       |    ON q.chunk_idx = c.chunk_idx AND q.chunk_val = c.chunk_val
       |  WHERE q.vec_id % qstride = 0 AND c.vec_id <> q.vec_id),
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

  // --- ann_ivf_topk: inverted-file (IVF) variant -------------------------
  /** IVF: a FIXED-size deterministic codebook — [[K_CENTROIDS]] vectors
    * chosen by stride (every ⌈n/K⌉-th vec_id), each vector assigned to
    * its nearest centroid; queries probe the NPROBE nearest cells and
    * search only there. The O() contract at scale: the codebook is an
    * O(K) broadcast and assignment is O(n·K) — both independent of
    * corpus growth (K is a constant; a production system would take
    * K ≈ √n and train the codebook, but the dataflow is identical).
    * The stride derives from a 1-row count aggregate cross-joined in —
    * no driver collect. Assignment/probing rank by rounded cosine with
    * centroid-id tiebreaks, so the oracle (same algorithm in SQL) is
    * exact. */
  val K_CENTROIDS = 64
  val CENTROID_OFF = 1
  val NPROBE = 3
  val IVF_TOP_K = 3

  def annIvfTopk(spark: SparkSession, dir: String): DataFrame = {
    val e = corpus(spark, dir)
    val stride = e.agg(
      ceil(count(lit(1)).cast("double") / K_CENTROIDS).cast("long").as("stride"))
    // offset reduced mod stride: at n ≤ K the stride degenerates to 1
    // and a fixed offset of 1 would select NOTHING (x % 1 is always 0);
    // reduced, every vector becomes its own centroid — the correct
    // tiny-corpus limit.
    val cent = e.crossJoin(broadcast(stride))
      .filter(col("vec_id") % col("stride") === lit(CENTROID_OFF) % col("stride"))
      .select(col("vec_id").as("cid"), col("v").as("cv"), col("nrm").as("cnrm"))
    def nearestCells(side: DataFrame, keep: Int): DataFrame = {
      val w = Window.partitionBy(col("vec_id"))
        .orderBy(col("ccos").desc, col("cid"))
      side.crossJoin(broadcast(cent))
        .select(col("vec_id"), col("v"), col("nrm"), col("cid"),
          round(dot(col("v"), col("cv")) / (col("nrm") * col("cnrm")), 6).as("ccos"))
        .withColumn("crank", row_number().over(w))
        .filter(col("crank") <= keep)
    }
    val assigned = nearestCells(e, 1)
      .select(col("vec_id"), col("v"), col("nrm"), col("cid").as("cell"))
    val probes = nearestCells(queryWorkload(e, e), NPROBE)
      .select(col("vec_id").as("query_id"), col("v").as("qv"),
        col("nrm").as("qnrm"), col("cid").as("cell"))
    val scored = assigned.join(broadcast(probes), Seq("cell"))
      .filter(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id"),
        round(dot(col("qv"), col("v")) / (col("qnrm") * col("nrm")), 6).as("cosine"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("vec_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= IVF_TOP_K)
      .orderBy(col("query_id"), col("rank"))
  }

  val annIvfTopkSql =
    s"""$corpusSql,
       |st AS (SELECT CAST(ceil(CAST(count(*) AS DOUBLE) / $K_CENTROIDS) AS BIGINT)
       |         AS stride FROM n),
       |cent AS (SELECT vec_id AS cid, v AS cv, nrm AS cnrm FROM n CROSS JOIN st
       |         WHERE vec_id % stride = $CENTROID_OFF % stride),
       |ac AS (SELECT n.vec_id, n.v, n.nrm, cent.cid,
       |  round(list_sum(list_transform(range(1, $DIM + 1), i -> n.v[i] * cent.cv[i]))
       |        / (n.nrm * cent.cnrm), 6) AS ccos
       |  FROM n CROSS JOIN cent),
       |ar AS (SELECT *, row_number() OVER (
       |    PARTITION BY vec_id ORDER BY ccos DESC, cid) AS crank FROM ac),
       |assigned AS (SELECT vec_id, v, nrm, cid AS cell FROM ar WHERE crank = 1),
       |probes AS (SELECT vec_id AS query_id, v AS qv, nrm AS qnrm, cid AS cell
       |  FROM ar CROSS JOIN qst
       |  WHERE crank <= $NPROBE AND vec_id % qstride = 0),
       |p AS (SELECT probes.query_id, assigned.vec_id,
       |  round(list_sum(list_transform(range(1, $DIM + 1),
       |          i -> probes.qv[i] * assigned.v[i]))
       |        / (probes.qnrm * assigned.nrm), 6) AS cosine
       |  FROM assigned JOIN probes ON assigned.cell = probes.cell
       |  WHERE assigned.vec_id <> probes.query_id),
       |r AS (SELECT *, CAST(row_number() OVER (
       |        PARTITION BY query_id ORDER BY cosine DESC, vec_id) AS INT) AS rank
       |      FROM p)
       |SELECT query_id, vec_id, cosine, rank FROM r
       |WHERE rank <= $IVF_TOP_K ORDER BY query_id, rank""".stripMargin

  // --- interactive serving path ------------------------------------------
  /** Exact top-k neighbours of ONE corpus vector — the ad-hoc serving
    * entry point (the similarity analogue of
    * [[InvertedIndex.retrieve]]'s REPL query): the single query row is
    * broadcast, the corpus streams once, top-k via sort+limit
    * (TakeOrderedAndProject). The fixed-workload `cosine_topk` query
    * reuses the same scoring expression. */
  def nearestTo(spark: SparkSession, dir: String, vecId: Long, k: Int): DataFrame = {
    val e = corpus(spark, dir)
    val q = e.filter(col("vec_id") === vecId)
      .select(col("v").as("qv"), col("nrm").as("qnrm"))
    e.crossJoin(broadcast(q))
      .filter(col("vec_id") =!= vecId)
      .select(col("vec_id"),
        round(dot(col("qv"), col("v")) / (col("qnrm") * col("nrm")), 6).as("cosine"))
      .orderBy(col("cosine").desc, col("vec_id"))
      .limit(k)
  }

  // --- embedding_dedup: cosine near-dup pairs via sign-LSH buckets -------
  /** Embedding-cosine near-duplicate pairs: LSH-bucketed candidates
    * (share ≥1 signature chunk), exact-cosine verified. The oracle
    * replicates the identical algorithm — at this similarity level
    * sign-LSH recall is probabilistic, so the candidate generator IS
    * the spec, exactly as in `ann_lsh_topk`. */
  val DEDUP_COSINE = 0.45

  def embeddingDedup(spark: SparkSession, dir: String): DataFrame = {
    val e = corpus(spark, dir)
    val sigs = e.withColumn("sig", signature(spark, col("v")))
      .repartition(col("vec_id"))
    // Candidate pairs are id-only — the chunk join multiplies rows by
    // bucket occupancy, so carrying the 64-double vectors through it
    // would materialize them once per colliding pair. Vectors are
    // fetched after dropDuplicates (the oracle mirrors this shape).
    val chunks = sigs.select(col("vec_id"),
        posexplode(array((0 until ANN_CHUNKS).map(c =>
          shiftrightunsigned(col("sig"), c * ANN_CHUNK_BITS)
            .bitwiseAND(lit((1 << ANN_CHUNK_BITS) - 1))): _*)))
      .toDF("vec_id", "chunk_idx", "chunk_val")
    val cand = chunks.select(col("vec_id").as("id_a"), col("chunk_idx"), col("chunk_val"))
      .join(chunks.select(col("vec_id").as("id_b"), col("chunk_idx"), col("chunk_val")),
        Seq("chunk_idx", "chunk_val"))
      .filter(col("id_a") < col("id_b"))
      .dropDuplicates("id_a", "id_b")
    cand
      .join(e.select(col("vec_id").as("id_a"), col("v").as("v_a"),
        col("nrm").as("n_a")), "id_a")
      .join(e.select(col("vec_id").as("id_b"), col("v").as("v_b"),
        col("nrm").as("n_b")), "id_b")
      .select(col("id_a"), col("id_b"),
        round(dot(col("v_a"), col("v_b")) / (col("n_a") * col("n_b")), 6).as("cosine"))
      .filter(col("cosine") >= DEDUP_COSINE)
      .orderBy(col("id_a"), col("id_b"))
  }

  val embeddingDedupSql = {
    s"""$corpusSql,
       |$planesCte,
       |$sigCte,
       |ch AS (SELECT vec_id, v, nrm, c AS chunk_idx,
       |  (sig >> (c * $ANN_CHUNK_BITS)) & ${(1 << ANN_CHUNK_BITS) - 1} AS chunk_val
       |  FROM s, unnest(range(0, $ANN_CHUNKS)) AS u(c)),
       |cand AS (SELECT DISTINCT a.vec_id AS id_a, b.vec_id AS id_b
       |  FROM ch a JOIN ch b
       |    ON a.chunk_idx = b.chunk_idx AND a.chunk_val = b.chunk_val
       |  WHERE a.vec_id < b.vec_id),
       |p AS (SELECT cand.id_a, cand.id_b,
       |  round(list_sum(list_transform(range(1, $DIM + 1), i -> x.v[i] * y.v[i]))
       |        / (x.nrm * y.nrm), 6) AS cosine
       |  FROM cand
       |  JOIN n x ON x.vec_id = cand.id_a
       |  JOIN n y ON y.vec_id = cand.id_b)
       |SELECT id_a, id_b, cosine FROM p
       |WHERE cosine >= $DEDUP_COSINE ORDER BY id_a, id_b""".stripMargin
  }

  override def entries: Seq[QueryDef] = Seq(
    QueryDef("cosine_topk", cosineTopk, Some(cosineTopkSql),
      "exact brute-force cosine top-k for the query workload"),
    QueryDef("ann_lsh_topk", annLshTopk, Some(annLshTopkSql),
      "random-hyperplane LSH candidates + exact cosine re-rank"),
    QueryDef("ann_ivf_topk", annIvfTopk, Some(annIvfTopkSql),
      "IVF: deterministic codebook, nprobe cell search + re-rank"),
    QueryDef("embedding_dedup", embeddingDedup, Some(embeddingDedupSql),
      "embedding-cosine near-dup pairs via sign-LSH buckets"))
}
