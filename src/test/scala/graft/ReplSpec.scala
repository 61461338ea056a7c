package graft

import org.apache.spark.sql.functions._

/** The REPL's dispatcher must route to the same library entries the
  * gate queries certify — so these only pin routing and argument
  * handling, not retrieval semantics (RetrievalSpec / SimilaritySpec
  * own those). */
class ReplSpec extends SparkSpecBase {
  import spark.implicits._

  test("q routes to boolean retrieval and returns the query's row") {
    val df = Repl.dispatch(spark, sfDir, "  q fast table AND slow OR ").get
    val row = df.select(col("query"), col("n_docs")).collect().head
    assert(row.getString(0) == "fast table AND slow OR")
    val expect = operators.InvertedIndex
      .retrieve(spark, sfDir, "fast table AND slow OR")
      .select(col("n_docs")).as[Int].head()
    assert(row.getInt(1) == expect)
  }

  test("rank routes to BM25 and lowercases the free text") {
    val df = Repl.dispatch(spark, sfDir, " rank Spark JOIN scan ").get
    val rows = df.select(col("query"), col("rank")).collect()
    assert(rows.nonEmpty && rows.forall(_.getString(0) == "spark join scan"))
    assert(rows.map(_.getInt(1)).max <= operators.InvertedIndex.BM25_K)
  }

  test("sim routes to nearestTo with default and explicit k") {
    val dflt = Repl.dispatch(spark, sfDir, "sim 0").get
    assert(dflt.count() == operators.Similarity.TOP_K)
    val k3 = Repl.dispatch(spark, sfDir, "sim 0 3").get.as[(Long, Double)]
      .collect().toSeq
    assert(k3.size == 3)
    val direct = operators.Similarity.nearestTo(spark, sfDir, 0L, 3)
      .as[(Long, Double)].collect().toSeq
    assert(k3 == direct)
  }

  test("near routes to the doc's near-dup cluster; singletons self-report") {
    // A doc the gate's components output clusters: its REPL cluster is
    // exactly the rows of its component. A doc with no near-dups gets
    // the singleton (doc_id, doc_id) row; an absent id, zero rows.
    val comps = SparkEntry.queries("dedup_components")(spark, sfDir)
      .as[(Long, Long)].collect().toSeq
    assert(comps.nonEmpty, "fixture must contain near-dup clusters")
    val (member, comp) = comps.head
    val expect = comps.filter(_._2 == comp).toSet
    val got = Repl.dispatch(spark, sfDir, s"near $member").get
      .as[(Long, Long)].collect().toSet
    assert(got == expect)
    val clustered = comps.map(_._1).toSet
    val singleton = Tables.documents(spark, sfDir).select(col("doc_id"))
      .as[Long].collect().find(!clustered(_)).get
    assert(Repl.dispatch(spark, sfDir, s"near $singleton").get
      .as[(Long, Long)].collect().toSeq == Seq((singleton, singleton)))
    assert(Repl.dispatch(spark, sfDir, "near 999999999").get.count() == 0)
    assert(Repl.dispatch(spark, sfDir, "near -1").isEmpty)
  }

  test("admit routes to the single-candidate probe with both verdicts") {
    // A doc with a near-dup elsewhere in the corpus collides with the
    // rest-of-corpus state (would_admit = false); a singleton doc
    // probes clean. An absent id yields zero rows; a negative id, the
    // help path.
    val comps = SparkEntry.queries("dedup_components")(spark, sfDir)
      .as[(Long, Long)].collect().toSeq
    // Probe a doc from a VERIFIED pair whose partner is its cluster
    // canonical: admitBatch keeps only admitted (canonical) members'
    // band keys in state, so an arbitrary cluster member's only direct
    // partners could all be dropped non-canonicals (transitive
    // cluster) and the collision assertion would fail spuriously
    // (fixture-shape-dependent). A canonical partner's keys are
    // guaranteed in state.
    val compOf = comps.toMap
    val pairs = SparkEntry.queries("near_dedup")(spark, sfDir)
      .select(col("doc_a"), col("doc_b")).as[(Long, Long)].collect().toSeq
    val dup = pairs.collectFirst {
      case (a, b) if compOf.get(a).contains(b) => a
      case (a, b) if compOf.get(b).contains(a) => b
    }.getOrElse(fail("fixture has no pair touching its cluster canonical"))
    val dupRow = Repl.dispatch(spark, sfDir, s"admit $dup").get
      .as[(Long, Long, Boolean)].collect().toSeq
    assert(dupRow.size == 1 && dupRow.head._1 == dup)
    assert(!dupRow.head._3 && dupRow.head._2 > 0,
      s"near-dup doc $dup must collide with the rest-of-corpus state")
    // A doc outside every VERIFIED cluster normally probes clean, but
    // n_hits counts raw band collisions (verification-independent), so
    // pin only verdict-consistency plus the library agreement — the
    // probe must equal probeVerdicts' own math, not a test-side
    // assumption that unclustered implies collision-free.
    val clustered = comps.map(_._1).toSet
    val singleton = Tables.documents(spark, sfDir).select(col("doc_id"))
      .as[Long].collect().find(!clustered(_))
      .getOrElse(fail("fixture has no unclustered doc"))
    val s = Repl.dispatch(spark, sfDir, s"admit $singleton").get
      .as[(Long, Long, Boolean)].collect().toSeq
    assert(s.size == 1 && s.head._1 == singleton)
    assert(s.head._3 == (s.head._2 == 0L))
    assert(Repl.dispatch(spark, sfDir, "admit 999999999").get.count() == 0)
    assert(Repl.dispatch(spark, sfDir, "admit -1").isEmpty)
  }

  test("ann routes to the persisted-index serve with default and explicit k") {
    val d = Repl.dispatch(spark, sfDir, "ann 0").get
      .as[(Long, Double, Int)].collect().toSeq
    assert(d.size == operators.Similarity.IVF_TOP_K)
    assert(d.map(_._3) == (1 to operators.Similarity.IVF_TOP_K))
    val d1 = Repl.dispatch(spark, sfDir, "ann 0 1").get
      .as[(Long, Double, Int)].collect().toSeq
    assert(d1.size == 1 && d1.head == d.head,
      "explicit k=1 must be the same top row")
    assert(Repl.dispatch(spark, sfDir, "ann -1").isEmpty)
    assert(Repl.dispatch(spark, sfDir, "ann 0 0").isEmpty)
  }

  test("blank and unknown input dispatch to None") {
    assert(Repl.dispatch(spark, sfDir, "   ").isEmpty)
    assert(Repl.dispatch(spark, sfDir, "frobnicate 1").isEmpty)
    assert(Repl.dispatch(spark, sfDir, "sim notanumber").isEmpty)
    assert(Repl.dispatch(spark, sfDir, "q").isEmpty)
  }

  test("exit path releases registered caches") {
    // The quit path must drain every Caches-registered memo: a
    // long-lived interactive session otherwise pins its accumulated
    // DataFrame-valued plans past the point anything can use them.
    var cleared = false
    Caches.register(() => cleared = true)
    Repl.onExit()
    assert(cleared, "Repl.onExit must run Caches.clearAll")
  }
}
