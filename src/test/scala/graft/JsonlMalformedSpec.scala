package graft

import org.apache.spark.sql.functions._

/** Pins the premises the `jsonl_malformed` gate stands on:
  *
  *  1. MARGIN — every clean JSONL document line is comfortably longer
  *     than the truncation prefix, so "truncate to CORRUPT_KEEP
  *     characters" (== bytes on the ASCII fixture; Spark's substring
  *     counts characters) is unconditionally malformed (a line
  *     shorter than the prefix
  *     would survive truncation intact and silently turn a planted
  *     fault into a clean row).
  *  2. ID RECOVERY — the kept prefix always contains the full
  *     `"doc_id":N` field (schema order puts it first), so quarantine
  *     triage can regexp the id out of every corrupt raw record.
  *  3. CONTRACT — corrupt rows surface with `_corrupt_record` set and
  *     data columns unusable; clean rows parse bit-identically to the
  *     parquet source. Counts follow the fault plan exactly.
  */
class JsonlMalformedSpec extends SparkSpecBase {
  import spark.implicits._

  test("every clean line is far longer than the truncation prefix " +
    "and carries doc_id within it") {
    val lines =
      spark.read.text(Tables.jsonlCorruptDir(spark, sfDir, "documents"))
    val withLen = lines.select(col("value"),
      length(col("value")).as("len"),
      regexp_extract(col("value"), "\"doc_id\":(\\d+)", 1).as("id"))
    // Every line (clean or truncated) still yields its doc_id.
    assert(withLen.filter(col("id") === "").count() === 0L,
      "a staged line lost its doc_id field")
    // Truncated lines are exactly the prefix; clean lines exceed it —
    // no line can sit AT the boundary ambiguously.
    val atOrBelow = withLen.filter(col("len") <= Tables.CORRUPT_KEEP)
    assert(atOrBelow.filter(col("len") < Tables.CORRUPT_KEEP).count() === 0L,
      "a clean line was shorter than the truncation prefix")
    // And the margin premise: the SHORTEST clean line clears the
    // prefix by a wide margin (so truncation always tears the object).
    val minClean = withLen.filter(col("len") > Tables.CORRUPT_KEEP)
      .agg(min(col("len"))).as[Long].head()
    assert(minClean > Tables.CORRUPT_KEEP + 10,
      s"margin too thin: shortest clean line $minClean vs prefix " +
        s"${Tables.CORRUPT_KEEP}")
  }

  test("quarantine contract: fault plan counts, id recovery, clean parity") {
    val out = operators.Pipeline.jsonlMalformed(spark, sfDir).collect()
    val docs = Tables.documents(spark, sfDir)
      .select(col("doc_id")).as[Long].collect().toSet
    assert(out.length === docs.size, "a row was dropped or duplicated")
    assert(out.map(_.getLong(0)).toSet === docs,
      "doc_id recovery failed for some corrupt row")
    val expectedBad =
      docs.count(id => id % Tables.CORRUPT_MOD == Tables.CORRUPT_RES)
    val gotBad = out.count(_.getString(1) == "corrupt")
    assert(gotBad === expectedBad, "fault plan and quarantine disagree")
    assert(gotBad > 0, "fixture planted no corruption — gate is vacuous")
    // Clean parity: surviving rows' payloads equal the parquet-side
    // content hash (any JSONL round-trip corruption would shift them).
    val expected = Tables.documents(spark, sfDir)
      .select(col("doc_id"),
        (functions.TextFns.hash56(col("text")) % 1000003L).as("h"))
      .as[(Long, Long)].collect().toMap
    out.foreach { r =>
      if (r.getString(1) == "corrupt") assert(r.getLong(2) === 0L)
      else assert(r.getLong(2) === expected(r.getLong(0)),
        s"clean row ${r.getLong(0)} payload drifted")
    }
  }
}
