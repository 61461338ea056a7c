package graft

import graft.operators.Dedup

/** The SparkSessionExtensions injection point: the context is built
  * with `spark.sql.extensions=graft.GraftExtensions`, so the native
  * expressions must be callable from PLAIN SQL without any runtime
  * `register` having run first — and must agree with the engine's
  * configured coefficients. Queries run through a FRESH `newSession()`
  * (clean temp-function registry rebuilt from the extensions): other
  * suites legitimately shadow the shared session's binding with narrow
  * test variants, and this spec must not depend on suite order. */
class ExtensionsSpec extends SparkSpecBase {
  import spark.implicits._

  private lazy val fresh = spark.newSession()

  test("graft_minhash is injected and uses the engine coefficients") {
    val sig = fresh.sql("SELECT graft_minhash(array(CAST(42 AS BIGINT))) AS s")
      .as[Seq[Long]].collect().head
    assert(sig.length == Dedup.MINHASH_K)
    val x = 42L % Dedup.MH_P
    val expected = Dedup.MH_A.zip(Dedup.MH_B).map { case (a, b) =>
      (a * x + b) % Dedup.MH_P
    }.toSeq
    assert(sig == expected)
  }

  test("graft_simhash is injected with the engine bit width") {
    // one element: every bit of the element's low SIMHASH_BITS wins the
    // majority vote, so the signature is the element masked to 56 bits.
    val sig = fresh.sql("SELECT graft_simhash(array(CAST(12345 AS BIGINT))) AS s")
      .as[Long].collect().head
    assert(sig == (12345L & ((1L << Dedup.SIMHASH_BITS) - 1)))
  }

  test("the extension descriptions build evaluable expressions") {
    assert(GraftExtensions.functions.map(_._1.funcName).sorted ==
      Seq("graft_minhash", "graft_nfc", "graft_nfkc_cf",
        "graft_ngrampack", "graft_shingle56", "graft_signlsh",
        "graft_simhash", "graft_tokhash56",
        "graft_url_normalize", "graft_vdot", "graft_vsqdist",
        "graft_vsqnorm"))
  }

  test("the vector kernels are injected: dot/sqdist/sqnorm from plain SQL") {
    val (d, s, n) = fresh.sql(
        """SELECT graft_vdot(array(1.0D, 2.0D), array(3.0D, 4.0D)) AS d,
          |       graft_vsqdist(array(1.0D, 2.0D), array(3.0D, 4.0D)) AS s,
          |       graft_vsqnorm(array(3.0D, 4.0D)) AS n""".stripMargin)
      .as[(Double, Double, Double)].collect().head
    assert(d == 11.0 && s == 8.0 && n == 25.0)
  }

  test("wrong-arity vector-kernel calls fail as analysis errors, not internal ones") {
    val e = intercept[org.apache.spark.sql.AnalysisException] {
      fresh.sql("SELECT graft_vdot(array(1.0D))").collect()
    }
    assert(e.getMessage.contains("graft_vdot"))
  }

  test("graft_nfkc_cf is injected: compat forms collapse and case folds") {
    // fi ligature U+FB01 -> "fi"; fullwidth G U+FF27 -> "g" after the
    // fold; the ASCII tail lowercases.
    val out = fresh.sql("SELECT graft_nfkc_cf('ﬁle ＧO') AS s")
      .as[String].collect().head
    assert(out == "file go")
  }

  test("graft_url_normalize is injected with the full canonicalization") {
    val out = fresh.sql(
        "SELECT graft_url_normalize('HTTP://User@WWW.Ex.COM:80/A%7eb/?q=Z#f') AS s")
      .as[String].collect().head
    assert(out == "http://User@www.ex.com/A~b?q=Z")
  }

  test("graft_nfc is injected and composes decomposed accents") {
    // 'e' + U+0301 combining acute must compose to U+00E9 under NFC.
    // (Spark's SQL `chr` wraps at 256, unlike DuckDB's -- build the
    // decomposed input with an explicit escape.)
    val out = fresh.sql("SELECT graft_nfc('cafe\u0301') AS s")
      .as[String].collect().head
    assert(out == "caf\u00e9")
    assert(out.length == 4)
  }

  test("graft_signlsh is injected with the engine plane matrix") {
    import graft.operators.Similarity
    // e1 basis vector: bit p set iff plane_p's first coefficient > 0.
    val v = Array.tabulate(Similarity.DIM)(i => if (i == 0) "1.0D" else "0.0D")
    val sig = fresh.sql(
        s"SELECT graft_signlsh(array(${v.mkString(",")})) AS s")
      .as[Long].collect().head
    val expected = Similarity.PLANES.indices.foldLeft(0L) { (s, p) =>
      if (Similarity.PLANES(p)(0) > 0) s | (1L << p) else s
    }
    assert(sig == expected)
  }
}
