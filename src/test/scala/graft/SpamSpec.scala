package graft

import graft.functions.TextFns
import graft.operators.{SpamClassifier, SpamInstance}
import org.apache.spark.sql.functions._

/** Sequential oracle for the SGD trainer (SURVEY §5: the JUNG-oracle
  * pattern): re-derive the instances and replay the exact fold in plain
  * Scala; weights must match the Spark job bit-for-bit (same order,
  * same float ops). */
class SpamSpec extends SparkSpecBase {
  import spark.implicits._

  /** Plain-Scala featurization mirroring the Spark column pipeline. */
  private def localInstances(): Seq[SpamInstance] = {
    val docs = Tables.documents(spark, sfDir)
      .select("doc_id", "text").as[(Long, String)].collect().sortBy(_._1)
    docs.map { case (id, text) =>
      SpamInstance(id,
        (TextFns.hash56Local(id.toString) % 2).toInt,
        TextFns.tokenizeLocal(text)
          .map(t => (TextFns.hash56Local(t) % SpamClassifier.DIM).toInt))
    }.toSeq
  }

  test("featurization matches the plain-Scala mirror") {
    val sparkSide = SpamClassifier.spamInstances(spark, sfDir)
      .as[SpamInstance].collect().toSeq
    assert(sparkSide == localInstances())
  }

  test("spam_train weights match the sequential replay exactly") {
    val expected = SpamClassifier.sgdFold(localInstances().iterator)
    val got = SpamClassifier.spamTrain(spark, sfDir)
      .as[(Int, Double)].collect().toSeq
    assert(got == expected) // bit-identical: same fold, same order
  }

  test("spam_train_shuffled differs from sorted-order training") {
    val sorted = SpamClassifier.spamTrain(spark, sfDir)
      .as[(Int, Double)].collect().toMap
    val shuffled = SpamClassifier.spamTrainShuffled(spark, sfDir)
      .as[(Int, Double)].collect().toMap
    assert(sorted.keySet == shuffled.keySet)
    assert(sorted != shuffled, "order-sensitivity: permuted input must change weights")
  }

  test("spam_apply scores match a local replay of model application") {
    val w = SpamClassifier.sgdFold(localInstances().iterator).toMap
    val expected = localInstances().map { ins =>
      ins.doc_id -> ins.features.iterator.map(f => w.getOrElse(f, 0.0)).sum
    }.toMap
    val got = SpamClassifier.spamApply(spark, sfDir)
      .select("doc_id", "score").as[(Long, Double)].collect()
    assert(got.length == expected.size)
    got.foreach { case (id, s) =>
      assert(math.abs(s - expected(id)) < 1e-6, s"doc $id")
    }
  }

  test("spam_ensemble_trained matches a local replay of three slice folds") {
    val all = localInstances()
    val models = (0 until SpamClassifier.ENSEMBLE_SLICES).map { m =>
      SpamClassifier.sgdFold(
        all.filter(_.doc_id % SpamClassifier.ENSEMBLE_SLICES == m).iterator).toMap
    }
    val expected = all.map { ins =>
      val scores = models.map(w => ins.features.iterator.map(f => w.getOrElse(f, 0.0)).sum)
      val avg = scores.sum / models.length
      val vote = scores.map(s => if (s > 0) 1 else -1).sum
      ins.doc_id -> ((avg, vote))
    }.toMap
    val got = SpamClassifier.spamEnsembleTrained(spark, sfDir)
      .select("doc_id", "avg_score", "vote").as[(Long, Double, Int)].collect()
    assert(got.length == expected.size)
    got.foreach { case (id, avg, vote) =>
      assert(math.abs(avg - expected(id)._1) < 1e-6, s"doc $id avg")
      assert(vote == expected(id)._2, s"doc $id vote")
    }
  }

  test("ensemble vote and average labels are consistent with scores") {
    val rows = SpamClassifier.spamEnsemble(spark, sfDir)
      .select("avg_score", "vote", "label_avg", "label_vote")
      .as[(Double, Int, String, String)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (avg, vote, la, lv) =>
      assert(math.abs(vote) <= SpamClassifier.FIXED_MODELS.length)
      if (avg > 0) assert(la == "spam") else assert(la == "ham")
      if (vote > 0) assert(lv == "spam") else assert(lv == "ham")
    }
  }
}
