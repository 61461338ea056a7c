package graft

import graft.functions.TextFns
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

/** Tokenizer parity + guard behavior (bespin semantics: lowercase, keep
  * [a-z0-9], split whitespace, drop empties — SURVEY §2.8). */
class TextFnsSpec extends SparkSpecBase {
  import spark.implicits._

  private def tok(s: String): Seq[String] =
    Seq(s).toDF("text")
      .select(TextFns.tokenize(col("text")).as("t"))
      .as[Seq[String]].head()

  test("tokenize: lowercases and strips punctuation") {
    assert(tok("Hello, World!") == Seq("hello", "world"))
  }

  test("tokenize: keeps digits") {
    assert(tok("spark4 v2.0 100%") == Seq("spark4", "v20", "100"))
  }

  test("tokenize: collapses whitespace runs and trims") {
    assert(tok("  a\t\tb   c\n") == Seq("a", "b", "c"))
  }

  test("tokenize: drops non-latin characters (bespin keeps only a-z0-9)") {
    assert(tok("café 数据 naïve") == Seq("caf", "nave"))
  }

  test("tokenize: empty and all-punctuation strings give empty arrays") {
    assert(tok("") == Seq.empty)
    assert(tok("!!! ... ???") == Seq.empty)
  }

  test("bigrams: guarded on short arrays (no exception, empty result)") {
    val out = Seq("one", "", "a b c").toDF("text")
      .select(TextFns.bigrams(TextFns.tokenize(col("text"))).as("bg"))
      .collect()
    assert(out(0).getSeq[Row](0).isEmpty)
    assert(out(1).getSeq[Row](0).isEmpty)
    assert(out(2).getSeq[Row](0).map(r => (r.getString(0), r.getString(1)))
      == Seq(("a", "b"), ("b", "c")))
  }

  test("first40Distinct: dedups and caps at 40") {
    val toks = (1 to 50).map(i => s"w${i % 20}")
    val out = Seq(toks).toDF("t")
      .select(TextFns.first40Distinct(col("t")).as("d"))
      .as[Seq[String]].head()
    assert(out.distinct == out)
    assert(out.toSet == (0 until 20).map(i => s"w$i").toSet)
  }

  test("tokenize parity with the DuckDB SQL fragment's semantics") {
    // The SQL fragment is asserted by the driver's oracle gate end-to-end;
    // here we pin the exact regex contract the two sides share.
    assert(tok("a-b c_d") == Seq("ab", "cd")) // punctuation removed, not split
    assert(tok("x  y") == Seq("x", "y"))
  }
}
