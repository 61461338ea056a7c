package graft

import org.scalatest.funsuite.AnyFunSuite

/** Bench.prevBench parses two artifact families: its own whole-line
  * BENCH_FULL files and the driver's BENCH_r snapshots, which keep only
  * the TAIL of stdout (the round-7 prev/delta outage was a tail whose
  * `"queries":{` anchor was cut off). Pure-JVM — no Spark session. */
class BenchPrevSpec extends AnyFunSuite {

  private def withDir(files: (String, String)*)(body: java.io.File => Unit): Unit = {
    val dir = java.nio.file.Files.createTempDirectory("bench_prev_spec_").toFile
    try {
      files.foreach { case (name, content) =>
        java.nio.file.Files.writeString(dir.toPath.resolve(name), content)
      }
      body(dir)
    } finally {
      dir.listFiles().foreach(_.delete()); dir.delete()
    }
  }

  private val fullLine =
    """{"metric":"total","value":9.0,"unit":"sec","queries":{"q1":1.5,"q2":7.5},"prev":{},"delta":{},"errors":{},"sf":"x"}"""

  test("whole-line FULL artifact parses exactly") {
    withDir("BENCH_FULL_r07.json" -> fullLine) { dir =>
      assert(Bench.prevBench(dir, Some(8)) == Map("q1" -> 1.5, "q2" -> 7.5))
    }
  }

  test("driver tail with the queries anchor cut off falls back to the prev-prefix") {
    // Mimics the real artifact: escaped quotes, head truncated mid-name,
    // prev/delta objects AFTER the queries — whose values must NOT leak
    // into the parse (q1 would otherwise be overwritten by its delta).
    val tail =
      """{"n": 7, "rc": 0, "tail": "ame\":0.9,\"q1\":1.5,\"q2\":7.5},\"prev\":{\"q1\":9.9},\"delta\":{\"q1\":-8.4},\"errors\":{}}\n"}"""
    withDir("BENCH_r07.json" -> tail) { dir =>
      val got = Bench.prevBench(dir, Some(8))
      assert(got("q1") == 1.5 && got("q2") == 7.5)
    }
  }

  test("within a round the FULL artifact beats the driver tail") {
    val tail = """{"tail": "\"q1\":111.0},\"prev\":{},\"delta\":{}}"}"""
    withDir("BENCH_r07.json" -> tail, "BENCH_FULL_r07.json" -> fullLine) { dir =>
      assert(Bench.prevBench(dir, Some(8))("q1") == 1.5)
    }
  }

  test("only rounds strictly before the current one qualify") {
    withDir(
      "BENCH_FULL_r07.json" -> fullLine,
      "BENCH_FULL_r08.json" ->
        """{"metric":"total","value":1.0,"unit":"sec","queries":{"q1":42.0},"prev":{},"delta":{},"errors":{},"sf":"x"}""") { dir =>
      assert(Bench.prevBench(dir, Some(8))("q1") == 1.5)
      assert(Bench.prevBench(dir, Some(7)).isEmpty)
    }
  }

  test("no artifacts means no prev") {
    withDir() { dir => assert(Bench.prevBench(dir, Some(1)).isEmpty) }
  }

  test("only the NEWEST driver round is ambiguous: older finished rounds stay eligible") {
    // Round 7 carried an in-round re-run long ago (its FULL postdates
    // its stamp — a relationship that persists forever); round 8 is
    // re-running NOW (same signature) with the round inferred. Round 8
    // must be excluded as current, but round 7 — provably finished,
    // since a later stamp exists — must be the prev, not round 6.
    val r6 =
      """{"metric":"total","value":9.0,"unit":"sec","queries":{"q1":6.0},"prev":{},"delta":{},"errors":{},"sf":"x"}"""
    withDir(
      "BENCH_FULL_r06.json" -> r6,
      "BENCH_r07.json" -> """{"tail": "\"q1\":77.0},\"prev\":{}}"}""",
      "BENCH_FULL_r07.json" -> fullLine,
      "BENCH_r08.json" -> """{"tail": "\"q1\":88.0},\"prev\":{}}"}""",
      "BENCH_FULL_r08.json" ->
        """{"metric":"total","value":1.0,"unit":"sec","queries":{"q1":42.0},"prev":{},"delta":{},"errors":{},"sf":"x"}""") { dir =>
      def mtime(name: String, t: Long): Unit =
        assert(new java.io.File(dir, name).setLastModified(t))
      mtime("BENCH_FULL_r06.json", 1000000000000L)
      mtime("BENCH_r07.json", 1000000001000L)
      mtime("BENCH_FULL_r07.json", 1000000002000L) // old in-round re-run
      mtime("BENCH_r08.json", 1000000003000L)
      mtime("BENCH_FULL_r08.json", 1000000004000L) // re-running NOW
      assert(Bench.prevBench(dir, None)("q1") == 1.5)
    }
  }

  test("driver-JSON outer keys (n, rc) never enter the prev map") {
    // The tail-anchored scan: only pairs inside the "tail" value may
    // parse, so the wrapper's own numeric keys stay out even when the
    // queries anchor is cut off and the prefix fallback fires.
    val tail =
      """{"n": 7, "rc": 0, "tail": "ame\":0.9,\"q1\":1.5},\"prev\":{\"q1\":9.9},\"delta\":{}}\n"}"""
    withDir("BENCH_r07.json" -> tail) { dir =>
      val got = Bench.prevBench(dir, Some(8))
      assert(!got.contains("n") && !got.contains("rc"), s"outer keys leaked: $got")
      assert(got("q1") == 1.5)
    }
  }

  test("inferred round excludes an in-round re-run (FULL newer than driver stamp)") {
    // No SPARK_GRAFT_ROUND: after the driver stamps BENCH_r07, a
    // re-run rewrites BENCH_FULL_r07 (now NEWER than the stamp) and
    // would otherwise infer round 8 and read its own artifacts as
    // "previous". The mtime tiebreak must push it back to round 6.
    val r6 =
      """{"metric":"total","value":9.0,"unit":"sec","queries":{"q1":6.0},"prev":{},"delta":{},"errors":{},"sf":"x"}"""
    withDir(
      "BENCH_FULL_r06.json" -> r6,
      "BENCH_r07.json" -> """{"tail": "\"q1\":77.0},\"prev\":{}}"}""",
      "BENCH_FULL_r07.json" -> fullLine) { dir =>
      def mtime(name: String, t: Long): Unit =
        assert(new java.io.File(dir, name).setLastModified(t))
      mtime("BENCH_FULL_r06.json", 1000000000000L)
      mtime("BENCH_r07.json", 1000000001000L)
      mtime("BENCH_FULL_r07.json", 1000000002000L) // re-run after the stamp
      assert(Bench.prevBench(dir, None)("q1") == 6.0)
      // With the driver's explicit round, round 7 is legitimately prior.
      assert(Bench.prevBench(dir, Some(8))("q1") == 1.5)
    }
  }
}
