package graft.tools

import graft.operators.PageRank

/** Round-21 settle for the pagerank message-checkpoint eagerness
  * contradiction (r20 verdict item 1): the builder's stash-A/B said the
  * LAZY per-iteration checkpoint wins (-15%/-22%) while the driver's
  * cold runs said it LOST (0.66x/0.65x vs r19's eager variant). The two
  * measurements were taken in different machine-noise epochs; this
  * probe removes that confound by interleaving eager and lazy runs of
  * the same binary inside ONE JVM — rep k runs eager then lazy (order
  * alternates per rep to cancel drift) with a cache clear before every
  * run, so both variants see the same JIT/noise conditions.
  *
  * `sbt "runMain graft.tools.PrCkptProbe [reps]"` (default 10). */
object PrCkptProbe {
  def main(args: Array[String]): Unit = {
    val reps = args.headOption.flatMap(_.toIntOption).getOrElse(10)
    val (spark, sfDir) = ToolSession.build()
    val queries = Seq("pagerank", "pagerank_topk")
    val fns = queries.map(q => q -> graft.SparkEntry.queries(q)).toMap

    def run(q: String, eager: Boolean): Double = {
      PageRank.eagerMsgCkpt = eager
      graft.Caches.clearAll()
      val t0 = System.nanoTime()
      fns(q)(spark, sfDir).count()
      (System.nanoTime() - t0) / 1e9
    }

    // Warmup both variants, uncounted.
    queries.foreach { q => run(q, eager = true); run(q, eager = false) }

    val t = scala.collection.mutable.Map[(String, Boolean), Vector[Double]]()
      .withDefaultValue(Vector.empty)
    for (rep <- 1 to reps; q <- queries) {
      // Alternate which variant goes first so slow drift cancels.
      val order = if (rep % 2 == 0) Seq(true, false) else Seq(false, true)
      order.foreach { eager =>
        val s = run(q, eager)
        t((q, eager)) = t((q, eager)) :+ s
      }
    }
    PageRank.eagerMsgCkpt = false // restore the shipped default

    def stats(v: Vector[Double]): String = {
      val s = v.sorted
      f"min=${s.head}%.3f med=${s(s.size / 2)}%.3f mean=${s.sum / s.size}%.3f"
    }
    queries.foreach { q =>
      val e = t((q, true)); val l = t((q, false))
      println(f"PRCKPT $q reps=$reps EAGER ${stats(e)} | LAZY ${stats(l)} " +
        f"| lazy/eager med ratio=${l.sorted.apply(l.size / 2) / e.sorted.apply(e.size / 2)}%.3f")
      println(s"  eager: ${e.map(x => f"$x%.3f").mkString(",")}")
      println(s"  lazy : ${l.map(x => f"$x%.3f").mkString(",")}")
    }
    spark.stop()
  }
}
