package graft.operators

import graft.{QueryDef, QueryModule, Tables}
import graft.functions.TextFns
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** One labeled training instance (FIXTURES.md featurization of
  * `documents`): label = fingerprint parity of the doc id, features =
  * token fingerprints mod [[SpamClassifier.DIM]], in token order with
  * duplicates kept (the reference's instances also repeat features). */
final case class SpamInstance(doc_id: Long, label: Int, features: Seq[Int])

/** Spam classifier — the reference's SGD trio
  * (`/root/reference/Spark/Spam Classifier/TrainSpamClassifier.scala:42-70`,
  * `ApplySpamClassifier.scala:43-50`, `ApplyEnsembleSpamClassifier.scala:54-75`).
  *
  * Training is *inherently sequential*: the reference groups the whole
  * corpus into ONE reducer key (`TrainSpamClassifier.scala:19,46`) and
  * folds instances through a mutable weight map in order. The faithful
  * Spark form is `repartition(1).sortWithinPartitions(doc_id)` +
  * `mapPartitions` — a deliberate single-task stage (SURVEY §2.10), NOT
  * a distributed aggregation, because `w(f) += (y − p)·δ` at step i
  * depends on every earlier step. Everything around it (featurization,
  * scoring, ensembling) is distributed column work.
  *
  * Oracle strategy: the trained-model path has no SQL equivalent
  * (sequential state), so `spam_train`/`spam_apply` are covered by an
  * exact plain-Scala replay in ScalaTest (the JUNG-style sequential
  * oracle pattern, SURVEY §5) and get the driver's rows-only check.
  * The scoring/ensembling machinery IS oracle-checked via
  * `spam_apply_fixed`/`spam_ensemble`, which score against fixed
  * arithmetic models expressible in both engines.
  */
object SpamClassifier extends QueryModule {

  /** Feature space size (hashed-trick dimensionality). */
  val DIM = 1024
  /** SGD learning rate (reference δ — `TrainSpamClassifier.scala:21`). */
  val DELTA = 0.002
  /** Deterministic-shuffle salt for the shuffled-training variant. */
  val SHUFFLE_SALT = "graft-shuffle-42"

  /** Fixed pseudo-random linear models for the oracle-checked scoring
    * path: w_m(f) = ((a_m·f + b_m) mod 1000 − 500) / 1000. */
  val FIXED_MODELS: Seq[(Long, Long)] = Seq((37L, 11L), (101L, 3L), (61L, 29L))

  // --- featurization -----------------------------------------------------

  private def featurized(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir).select(
      col("doc_id"),
      pmod(TextFns.hash56(col("doc_id").cast("string")), lit(2L)).cast("int")
        .as("label"),
      transform(TextFns.tokenize(col("text")),
        t => pmod(TextFns.hash56(t), lit(DIM.toLong)).cast("int")).as("features"))

  /** `spam_instances`: the featurization itself, oracle-checked (it is
    * pure column work, so both engines must agree exactly). */
  def spamInstances(spark: SparkSession, dir: String): DataFrame =
    featurized(spark, dir).orderBy(col("doc_id"))

  /** Gate projection of [[spamInstances]]: the feature array as a csv
    * string — nested types crash generic row-comparison harnesses, so
    * the registered entry is scalar-only. */
  def spamInstancesGate(spark: SparkSession, dir: String): DataFrame =
    spamInstances(spark, dir)
      .withColumn("features", array_join(col("features").cast("array<string>"), ","))

  val spamInstancesSql = {
    val h = TextFns.hash56Sql("t")
    s"""SELECT doc_id,
       |  CAST(${TextFns.hash56Sql("CAST(doc_id AS VARCHAR)")} % 2 AS INT) AS label,
       |  coalesce(array_to_string(list_transform(${TextFns.tokenizeSql("text")},
       |    t -> CAST($h % $DIM AS INT)), ','), '') AS features
       |FROM documents ORDER BY doc_id""".stripMargin
  }

  // --- training ----------------------------------------------------------

  /** The sequential SGD fold (shared by the Spark single-partition task
    * and the ScalaTest oracle — same code, same order, same floats). */
  def sgdFold(instances: Iterator[SpamInstance]): Seq[(Int, Double)] = {
    val w = scala.collection.mutable.HashMap.empty[Int, Double]
    instances.foreach { ins =>
      val score = ins.features.iterator.map(f => w.getOrElse(f, 0.0)).sum
      val prob = 1.0 / (1.0 + math.exp(-score))
      ins.features.foreach { f =>
        w.update(f, w.getOrElse(f, 0.0) + (ins.label - prob) * DELTA)
      }
    }
    w.toSeq.sortBy(_._1)
  }

  private def trainOn(inst: DataFrame, spark: SparkSession): DataFrame = {
    import spark.implicits._
    inst.as[SpamInstance]
      .repartition(1).sortWithinPartitions(col("doc_id"))
      .mapPartitions(it => sgdFold(it).iterator)
      .toDF("feature", "weight")
  }

  /** Memoized trained model per (session, sfDir) — the reference's
    * Apply job reads the model Train materialized to HDFS
    * (`ApplySpamClassifier.scala:32-38`); here the single-task training
    * result is computed once and reused across queries. */
  private val modelCache = new graft.SessionMemo[String, DataFrame]
  graft.Caches.register(() => modelCache.clear())

  private def trainedModel(spark: SparkSession, dir: String): DataFrame =
    modelCache.getOrElseUpdate(spark, dir)(
      trainOn(featurized(spark, dir), spark).localCheckpoint(true))

  /** `spam_train`: weights from one sequential pass in doc_id order. */
  def spamTrain(spark: SparkSession, dir: String): DataFrame =
    trainedModel(spark, dir).orderBy(col("feature"))

  /** `spam_train_shuffled`: the reference's optional training-set
    * shuffle (`TrainSpamClassifier.scala:34-40`, `orderBy(rand)`) in a
    * deterministic form — permute by salted fingerprint instead of
    * `rand(seed)`, whose output depends on physical partitioning. */
  def spamTrainShuffled(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    featurized(spark, dir)
      .withColumn("shuffle_key",
        TextFns.hash56(concat(lit(SHUFFLE_SALT), col("doc_id").cast("string"))))
      .as[(Long, Int, Seq[Int], Long)]
      .repartition(1)
      .sortWithinPartitions(col("shuffle_key"), col("doc_id"))
      .map { case (id, label, features, _) => SpamInstance(id, label, features) }
      .mapPartitions(it => sgdFold(it).iterator)
      .toDF("feature", "weight")
      .orderBy(col("feature"))
  }

  // --- applying ----------------------------------------------------------

  /** `spam_apply`: score every doc against the trained model —
    * explode features ⋈ broadcast(model) ⋈ sum, the reference's
    * broadcast-map probe (`ApplySpamClassifier.scala:43-50`) as a
    * broadcast hash join. */
  def spamApply(spark: SparkSession, dir: String): DataFrame = {
    val model = trainedModel(spark, dir)
    val inst = featurized(spark, dir)
    val exploded = inst.select(col("doc_id"), explode(col("features")).as("feature"))
    exploded
      .join(broadcast(model), Seq("feature"), "left_outer")
      .groupBy(col("doc_id"))
      .agg(sum(coalesce(col("weight"), lit(0.0))).as("score"))
      // docs with zero features never appear in exploded; reattach
      .join(inst.select(col("doc_id"), col("label").as("actual")), Seq("doc_id"), "right_outer")
      .select(col("doc_id"), col("actual"),
        round(coalesce(col("score"), lit(0.0)), 6).as("score"),
        when(coalesce(col("score"), lit(0.0)) > 0, "spam").otherwise("ham")
          .as("predicted"))
      .orderBy(col("doc_id"))
  }

  // --- fixed-model scoring (oracle-checked) ------------------------------

  private def fixedScore(features: Column, a: Long, b: Long): Column =
    aggregate(features, lit(0.0), (acc, f) =>
      acc + (pmod(f.cast("long") * a + b, lit(1000L)) - 500L).cast("double") / 1000.0)

  private def fixedScoreSql(a: Long, b: Long): String =
    s"""list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
       |    list_transform(features, f ->
       |      CAST((CAST(f AS BIGINT) * $a + $b) % 1000 - 500 AS DOUBLE) / 1000.0)),
       |    (acc, x) -> acc + x)""".stripMargin

  /** `spam_apply_fixed`: the scoring pipeline against one fixed model. */
  def spamApplyFixed(spark: SparkSession, dir: String): DataFrame = {
    val (a, b) = FIXED_MODELS.head
    featurized(spark, dir)
      .select(col("doc_id"), col("label").as("actual"),
        round(fixedScore(col("features"), a, b), 6).as("score"))
      .withColumn("predicted", when(col("score") > 0, "spam").otherwise("ham"))
      .orderBy(col("doc_id"))
  }

  val spamApplyFixedSql = {
    val (a, b) = FIXED_MODELS.head
    s"""WITH i AS (SELECT doc_id,
       |  CAST(${TextFns.hash56Sql("CAST(doc_id AS VARCHAR)")} % 2 AS INT) AS actual,
       |  list_transform(${TextFns.tokenizeSql("text")},
       |    t -> CAST(${TextFns.hash56Sql("t")} % ${DIM} AS INT)) AS features
       |  FROM documents),
       |s AS (SELECT doc_id, actual, round(${fixedScoreSql(a, b)}, 6) AS score FROM i)
       |SELECT doc_id, actual, score,
       |  CASE WHEN score > 0 THEN 'spam' ELSE 'ham' END AS predicted
       |FROM s ORDER BY doc_id""".stripMargin
  }

  // --- trained ensemble --------------------------------------------------

  /** Number of deterministic training slices for the trained ensemble. */
  val ENSEMBLE_SLICES = 3

  private val sliceModelCache = new graft.SessionMemo[String, DataFrame]
  graft.Caches.register(() => sliceModelCache.clear())

  /** Three INDEPENDENTLY trained models — the reference's real ensemble
    * trains each member on its own corpus split
    * (`ApplyEnsembleSpamClassifier.scala:35-79`, group_x/y/z); here the
    * splits are the deterministic slices doc_id mod 3. Each member is
    * its own sequential single-partition fold; the union is
    * (model_id, feature, weight). */
  private def sliceModels(spark: SparkSession, dir: String): DataFrame =
    sliceModelCache.getOrElseUpdate(spark, dir) {
      (0 until ENSEMBLE_SLICES).map { m =>
        trainOn(featurized(spark, dir)
          .filter(col("doc_id") % ENSEMBLE_SLICES === m), spark)
          .withColumn("model_id", lit(m))
      }.reduce(_.unionAll(_)).localCheckpoint(true)
    }

  /** `spam_ensemble_trained`: score every doc against each trained
    * member (one explode ⋈ broadcast(models) ⋈ pivot — the per-model
    * probe shares a single shuffle), then average + vote exactly as
    * the fixed ensemble does. Sequential-training semantics ⇒ no SQL
    * oracle; SpamSpec replays the three folds in plain Scala. */
  def spamEnsembleTrained(spark: SparkSession, dir: String): DataFrame = {
    val models = sliceModels(spark, dir)
    val inst = featurized(spark, dir)
    val scores = inst
      .select(col("doc_id"), explode(col("features")).as("feature"))
      .join(broadcast(models), Seq("feature"))
      .groupBy(col("doc_id"))
      .pivot("model_id", 0 until ENSEMBLE_SLICES)
      .agg(sum(col("weight")))
      // docs with no features (or features unseen by every model)
      // never reach the pivot; reattach with zero scores.
      .join(inst.select(col("doc_id")), Seq("doc_id"), "right_outer")
    val s = (0 until ENSEMBLE_SLICES).map(m => coalesce(col(s"$m"), lit(0.0)))
    val avg = s.reduce(_ + _) / ENSEMBLE_SLICES
    val vote = s.map(x => when(x > 0, 1).otherwise(-1)).reduce(_ + _)
    scores.select(col("doc_id"),
        round(avg, 6).as("avg_score"),
        vote.as("vote"),
        when(avg > 0, "spam").otherwise("ham").as("label_avg"),
        when(vote > 0, "spam").otherwise("ham").as("label_vote"))
      .orderBy(col("doc_id"))
  }

  /** `spam_ensemble`: average + vote over the three fixed models
    * (`ApplyEnsembleSpamClassifier.scala:54-75`). */
  def spamEnsemble(spark: SparkSession, dir: String): DataFrame = {
    val scores = FIXED_MODELS.map { case (a, b) => fixedScore(col("features"), a, b) }
    val avg = scores.reduce(_ + _) / scores.length
    val vote = scores.map(s => when(s > 0, 1).otherwise(-1)).reduce(_ + _)
    featurized(spark, dir)
      .select(col("doc_id"),
        round(avg, 6).as("avg_score"),
        vote.as("vote"),
        when(avg > 0, "spam").otherwise("ham").as("label_avg"),
        when(vote > 0, "spam").otherwise("ham").as("label_vote"))
      .orderBy(col("doc_id"))
  }

  val spamEnsembleSql = {
    val scoreCols = FIXED_MODELS.zipWithIndex.map { case ((a, b), i) =>
      s"${fixedScoreSql(a, b)} AS s$i"
    }.mkString(", ")
    val avg = FIXED_MODELS.indices.map(i => s"s$i").mkString("(", " + ", s") / ${FIXED_MODELS.length}")
    val vote = FIXED_MODELS.indices
      .map(i => s"CASE WHEN s$i > 0 THEN 1 ELSE -1 END").mkString(" + ")
    s"""WITH i AS (SELECT doc_id,
       |  list_transform(${TextFns.tokenizeSql("text")},
       |    t -> CAST(${TextFns.hash56Sql("t")} % ${DIM} AS INT)) AS features
       |  FROM documents),
       |s AS (SELECT doc_id, $scoreCols FROM i),
       |e AS (SELECT doc_id, $avg AS avg_raw, $vote AS vote FROM s)
       |SELECT doc_id, round(avg_raw, 6) AS avg_score, vote,
       |  CASE WHEN avg_raw > 0 THEN 'spam' ELSE 'ham' END AS label_avg,
       |  CASE WHEN vote > 0 THEN 'spam' ELSE 'ham' END AS label_vote
       |FROM e ORDER BY doc_id""".stripMargin
  }

  override def entries: Seq[QueryDef] = Seq(
    QueryDef("spam_instances", spamInstancesGate, Some(spamInstancesSql),
      "deterministic featurization of documents into labeled instances"),
    QueryDef("spam_train", spamTrain, None,
      "sequential SGD weights (single sorted partition; VALUES replay oracle)",
      oracleGen = Some(() => SpamOracle.trainSql())),
    QueryDef("spam_train_shuffled", spamTrainShuffled, None,
      "SGD on a deterministic permutation of the training set",
      oracleGen = Some(() => SpamOracle.trainShuffledSql())),
    QueryDef("spam_apply", spamApply, None,
      "score docs against the trained model via broadcast join",
      oracleGen = Some(() => SpamOracle.applySql())),
    QueryDef("spam_apply_fixed", spamApplyFixed, Some(spamApplyFixedSql),
      "scoring pipeline against a fixed arithmetic model"),
    QueryDef("spam_ensemble", spamEnsemble, Some(spamEnsembleSql),
      "ensemble average + vote over three fixed models"),
    QueryDef("spam_ensemble_trained", spamEnsembleTrained, None,
      "ensemble over three models trained on doc_id-mod-3 slices (VALUES replay oracle)",
      oracleGen = Some(() => SpamOracle.ensembleTrainedSql())))
}
