package graft

import graft.functions.{LogSumExp, TextFns}
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** ScalaCheck properties over the pure-function layer (SURVEY §5):
  * these run on generated inputs, not fixtures, and pin the algebraic
  * contracts the oracle-parity arguments rely on. Sampling is
  * seed-deterministic (no scalatest bridge in the offline deps — the
  * generators drive plain assertion loops). */
class PropertySpec extends SparkSpecBase {

  private def forAll[A](g: Gen[A], n: Int = 100)(check: A => Unit): Unit = {
    val params = Gen.Parameters.default
    var produced = 0
    var seed = 0L
    while (produced < n && seed < n * 20L) {
      g.apply(params, Seed(seed)).foreach { a => check(a); produced += 1 }
      seed += 1
    }
    assert(produced >= n / 2, s"generator too sparse: $produced samples")
  }

  private def forAll2[A, B](ga: Gen[A], gb: Gen[B], n: Int = 100)(
      check: (A, B) => Unit): Unit =
    forAll(for { a <- ga; b <- gb } yield (a, b), n)(t => check(t._1, t._2))

  private val text: Gen[String] =
    Gen.listOf(Gen.frequency(
      8 -> Gen.alphaNumChar,
      2 -> Gen.oneOf(' ', '\t', '\n', '.', ',', '!', 'é', '文')))
      .map(_.mkString)

  test("BoundedTopK equals global sort-take for arbitrary inputs and splits") {
    import graft.functions.{BoundedTopK, TopKEntry}
    val entries = Gen.listOf(for {
      // full-range longs: Long.MinValue must sort LAST (a negate-based
      // comparator overflows on it)
      v <- Gen.frequency(8 -> Gen.chooseNum(-100L, 100L),
        1 -> Gen.oneOf(Long.MinValue, Long.MaxValue))
      t <- Gen.chooseNum(0L, 50L)
    } yield TopKEntry(v, t))
    forAll2(entries, Gen.chooseNum(1, 7)) { (xs, k) =>
      val agg = new BoundedTopK(k)
      val expected = xs.sortWith((a, b) =>
        a.v > b.v || (a.v == b.v && a.tie < b.tie)).take(k)
      // sequential reduce
      assert(xs.foldLeft(agg.zero)(agg.reduce).entries == expected)
      // arbitrary split + merge (partial aggregation path)
      val cut = xs.length / 3
      val (l, r) = xs.splitAt(cut)
      val merged = agg.merge(
        l.foldLeft(agg.zero)(agg.reduce), r.foldLeft(agg.zero)(agg.reduce))
      assert(merged.entries == expected)
      assert(merged.entries.size <= k)
    }
  }

  test("tokenizeLocal: tokens are non-empty, lowercase alnum only") {
    forAll(text) { s =>
      val toks = TextFns.tokenizeLocal(s)
      assert(toks.forall(t => t.nonEmpty && t.forall(c => c.isDigit || ('a' <= c && c <= 'z'))))
    }
  }

  test("tokenizeLocal: idempotent over its own output") {
    forAll(text) { s =>
      val once = TextFns.tokenizeLocal(s)
      assert(TextFns.tokenizeLocal(once.mkString(" ")) == once)
    }
  }

  test("hash56Local: stable, 56-bit, and order-distinguishing") {
    forAll2(Gen.alphaNumStr, Gen.alphaNumStr) { (a, b) =>
      val ha = TextFns.hash56Local(a)
      assert(ha == TextFns.hash56Local(a))
      assert(ha >= 0L && ha < (1L << 56))
      if (a != b) assert(ha != TextFns.hash56Local(b) || a == b)
    }
  }

  test("LogSumExp: matches naive log(sum(exp)) where the naive form is safe") {
    val xs = Gen.nonEmptyListOf(Gen.choose(-50.0, 50.0))
    forAll(xs) { v =>
      val stable = LogSumExp.finish(v.foldLeft(LogSumExp.zero)(LogSumExp.reduce))
      val naive = math.log(v.map(math.exp).sum)
      assert(math.abs(stable - naive) < 1e-9 * math.max(1.0, math.abs(naive)))
    }
  }

  test("LogSumExp: merge is associative and commutative (partial agg safe)") {
    val buf = Gen.listOfN(3, Gen.nonEmptyListOf(Gen.choose(-800.0, 800.0)))
    forAll(buf) { parts =>
      val bufs = parts.map(_.foldLeft(LogSumExp.zero)(LogSumExp.reduce))
      val Seq(a, b, c) = bufs
      val left = LogSumExp.finish(LogSumExp.merge(LogSumExp.merge(a, b), c))
      val right = LogSumExp.finish(LogSumExp.merge(a, LogSumExp.merge(b, c)))
      val swapped = LogSumExp.finish(LogSumExp.merge(LogSumExp.merge(b, a), c))
      assert(math.abs(left - right) < 1e-9 * math.max(1.0, math.abs(left)))
      assert(math.abs(left - swapped) < 1e-9 * math.max(1.0, math.abs(left)))
    }
  }

  test("LogSumExp: stable far outside naive range (no overflow/underflow)") {
    val big = Gen.nonEmptyListOf(Gen.choose(700.0, 900.0))
    forAll(big) { v =>
      val stable = LogSumExp.finish(v.foldLeft(LogSumExp.zero)(LogSumExp.reduce))
      assert(!stable.isInfinite && stable >= v.max)
      assert(stable <= v.max + math.log(v.length) + 1e-9)
    }
  }

  test("MisraGries: candidates cover every above-bound item, any split") {
    import graft.functions.{MisraGries, MGBuffer}
    val k = 5
    val agg = new MisraGries(k)
    val stream = Gen.listOfN(60,
      Gen.frequency(6 -> Gen.const("hot"), 3 -> Gen.const("warm"),
        4 -> Gen.oneOf("a", "b", "c", "d", "e", "f", "g", "h")))
    val cut = Gen.listOfN(3, Gen.chooseNum(0, 60))
    forAll2(stream, cut, 60) { (xs, cuts) =>
      // arbitrary 4-way split, sequential reduce per part, tree merge
      val bounds = (0 +: cuts.sorted :+ xs.length).distinct.sorted
      val parts = bounds.zip(bounds.tail).map { case (a, b) =>
        xs.slice(a, b).foldLeft(agg.zero)(agg.reduce)
      }
      val merged = parts.foldLeft(agg.zero)(agg.merge)
      val exact = xs.groupBy(identity).view.mapValues(_.size.toLong)
      // Mergeable-summary guarantee: true count > n/(k+1) => surfaced,
      // and no counter ever exceeds its true count.
      exact.foreach { case (item, cnt) =>
        if (cnt * (k + 1) > xs.length)
          assert(merged.m.contains(item), s"missed $item ($cnt/${xs.length})")
      }
      merged.m.foreach { case (item, c) =>
        assert(c <= exact.getOrElse(item, 0L), s"overcount $item")
      }
    }
  }

  test("star components equal union-find on generated graphs") {
    // Generated multigraphs past CurationSpec's hand-built shapes:
    // denser, larger id space, duplicate/reversed edges. Few samples —
    // each drives the full distributed alternation loop.
    val graph: Gen[List[(Long, Long)]] = for {
      n <- Gen.chooseNum(3, 18)
      m <- Gen.chooseNum(2, 30)
      es <- Gen.listOfN(m, for {
        a <- Gen.chooseNum(0, n - 1)
        b <- Gen.chooseNum(0, n - 1)
      } yield (a.toLong, b.toLong))
    } yield es.filter { case (a, b) => a != b }
    import spark.implicits._
    forAll(graph, 6) { es =>
      if (es.nonEmpty) {
        val got = operators.Dedup.components(es.toDF("a", "b"))
          .as[(Long, Long)].collect().toMap
        val parent = scala.collection.mutable.Map.empty[Long, Long]
        def find(x: Long): Long = {
          val p = parent.getOrElseUpdate(x, x)
          if (p == x) x else { val r = find(p); parent(x) = r; r }
        }
        es.foreach { case (a, b) =>
          val (ra, rb) = (find(a), find(b))
          if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
        }
        assert(got == parent.keys.map(k => k -> find(k)).toMap,
          s"mismatch on $es")
      }
    }
  }

  test("SGD fold: permutation changes weights but not the feature set") {
    val inst = Gen.listOfN(20, for {
      id <- Gen.choose(0L, 1000L)
      label <- Gen.oneOf(0, 1)
      fs <- Gen.nonEmptyListOf(Gen.choose(0, 63))
    } yield operators.SpamInstance(id, label, fs))
    forAll(inst) { is =>
      val w1 = operators.SpamClassifier.sgdFold(is.iterator)
      val w2 = operators.SpamClassifier.sgdFold(is.reverse.iterator)
      assert(w1.map(_._1) == w2.map(_._1).sorted.distinct.sorted
        || w1.map(_._1).toSet == w2.map(_._1).toSet)
    }
  }
}
