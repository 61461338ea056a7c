package graft.operators

import graft.Tables
import graft.functions.TextFns
import org.apache.spark.sql.SparkSession

/** Driver-gate oracle for the sequential-SGD family — the materialized
  * JUNG-oracle pattern (SURVEY §5; reference precedent
  * `/root/reference/PageRank/SequentialPageRank.java:102-117`: an
  * independent single-node implementation is the ground truth for a
  * computation SQL cannot express).
  *
  * The four SGD queries (`spam_train`, `spam_train_shuffled`,
  * `spam_apply`, `spam_ensemble_trained`) are order-sensitive sequential
  * folds, so no set-oriented DuckDB query can reproduce them. What
  * DuckDB CAN check is a literal: this object replays the training in
  * plain driver-side Scala — its own immutable-map fold and the
  * plain-Scala featurization mirror ([[TextFns.hash56Local]] /
  * [[TextFns.tokenizeLocal]]), sharing no Spark execution with the
  * queries under test — and renders the replay's result as a
  * `VALUES` table. The driver then hash-compares Spark-vs-replay like
  * any other oracle, closing the four `no_oracle` gate rows.
  *
  * The oracle is generated at Verify-dump time for the sfDir being
  * verified (via [[graft.OracleContext]]), so it stays correct at
  * every scale factor instead of pinning one corpus' weights. FP discipline: the replay reproduces the exact float-op
  * order of the single-partition fold (left-to-right sums in token
  * order), and rounded columns mirror Spark's `round` semantics
  * (`BigDecimal.valueOf(x).setScale(n, HALF_UP)`).
  */
object SpamOracle {

  private val cache =
    scala.collection.concurrent.TrieMap.empty[String, Replay]
  graft.Caches.register(() => cache.clear())

  private def replay(): Replay = {
    val (spark, dir) = graft.OracleContext.get
    cache.getOrElseUpdate(dir, new Replay(spark, dir))
  }

  def trainSql(): String = replay().trainSql
  def trainShuffledSql(): String = replay().trainShuffledSql
  def applySql(): String = replay().applySql
  def ensembleTrainedSql(): String = replay().ensembleTrainedSql

  /** Spark's `round(x, n)` for DoubleType: decimal HALF_UP via
    * BigDecimal.valueOf — mirrored exactly, NOT math.round tricks. */
  private def round6(x: Double): Double =
    java.math.BigDecimal.valueOf(x).setScale(6, java.math.RoundingMode.HALF_UP)
      .doubleValue()

  /** Round-trip double literal: parsed from VARCHAR so DuckDB's strtod
    * reconstructs the exact bits of the replay's double. */
  private def dlit(x: Double): String = s"CAST('${x.toString}' AS DOUBLE)"

  private def valuesSql(rows: Seq[String], alias: String, order: String): String =
    s"SELECT * FROM (VALUES ${rows.mkString(", ")}) AS $alias ORDER BY $order"

  private final class Replay(spark: SparkSession, dir: String) {
    import SpamClassifier.{DELTA, DIM, ENSEMBLE_SLICES, SHUFFLE_SALT}

    /** Plain-Scala featurization of the corpus (the mirror SpamSpec
      * pins against the Spark column pipeline; the featurization itself
      * is DuckDB-oracled via `spam_instances`). */
    private val instances: Vector[SpamInstance] = {
      import spark.implicits._
      Tables.documents(spark, dir).select("doc_id", "text")
        .as[(Long, String)].collect().sortBy(_._1)
        .map { case (id, text) =>
          SpamInstance(id,
            (TextFns.hash56Local(id.toString) % 2).toInt,
            TextFns.tokenizeLocal(text)
              .map(t => (TextFns.hash56Local(t) % DIM).toInt))
        }.toVector
    }

    /** Independent sequential fold — immutable map, but the identical
      * float-op ORDER as the engine's fold: score accumulates
      * left-to-right over the features (duplicates kept), then each
      * feature occurrence adds the constant step. */
    private def fold(inst: Seq[SpamInstance]): Vector[(Int, Double)] = {
      var w = Map.empty[Int, Double]
      inst.foreach { ins =>
        var score = 0.0
        ins.features.foreach(f => score += w.getOrElse(f, 0.0))
        val step = (ins.label - 1.0 / (1.0 + math.exp(-score))) * DELTA
        ins.features.foreach(f => w = w.updated(f, w.getOrElse(f, 0.0) + step))
      }
      w.toVector.sortBy(_._1)
    }

    private def score(w: Map[Int, Double], ins: SpamInstance): Double = {
      var s = 0.0
      ins.features.foreach(f => s += w.getOrElse(f, 0.0))
      s
    }

    private def weightsSql(ws: Vector[(Int, Double)]): String =
      valuesSql(
        ws.map { case (f, w) => s"(CAST($f AS INT), ${dlit(w)})" },
        "t(feature, weight)", "feature")

    private val sorted = instances // already doc_id-ascending
    private lazy val model: Vector[(Int, Double)] = fold(sorted)

    lazy val trainSql: String = weightsSql(model)

    lazy val trainShuffledSql: String = weightsSql(fold(
      sorted.sortBy(ins =>
        (TextFns.hash56Local(SHUFFLE_SALT + ins.doc_id), ins.doc_id))))

    lazy val applySql: String = {
      val w = model.toMap
      valuesSql(
        sorted.map { ins =>
          val s = score(w, ins)
          val label = if (s > 0) "spam" else "ham"
          s"(CAST(${ins.doc_id} AS BIGINT), CAST(${ins.label} AS INT), " +
            s"${dlit(round6(s))}, '$label')"
        },
        "t(doc_id, actual, score, predicted)", "doc_id")
    }

    lazy val ensembleTrainedSql: String = {
      val models = (0 until ENSEMBLE_SLICES).map(m =>
        fold(sorted.filter(_.doc_id % ENSEMBLE_SLICES == m)).toMap)
      valuesSql(
        sorted.map { ins =>
          val scores = models.map(score(_, ins))
          val avg = scores.reduce(_ + _) / ENSEMBLE_SLICES
          val vote = scores.map(s => if (s > 0) 1 else -1).sum
          val la = if (avg > 0) "spam" else "ham"
          val lv = if (vote > 0) "spam" else "ham"
          s"(CAST(${ins.doc_id} AS BIGINT), ${dlit(round6(avg))}, " +
            s"CAST($vote AS INT), '$la', '$lv')"
        },
        "t(doc_id, avg_score, vote, label_avg, label_vote)", "doc_id")
    }
  }
}
