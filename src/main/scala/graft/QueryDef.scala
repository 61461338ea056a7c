package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One engine capability: a named DataFrame program over the fixture tables
  * plus (when SQL-expressible) a DuckDB oracle that must hash-match it.
  *
  * Oracle-parity rules used across all modules (SURVEY.md §7.3, §8):
  *   - money/quantity sums go through DecimalType so both engines sum
  *     exactly (double sums are partition-order dependent);
  *   - ratios/logs/similarities stay double but are `round(x, n)`-ed
  *     identically on both sides;
  *   - every query ends in a deterministic ORDER BY with a unique
  *     tiebreaker, so LIMIT boundaries cannot diverge between engines;
  *   - FINAL output columns are only BIGINT / DOUBLE / VARCHAR /
  *     timestamp: DECIMAL outputs render with engine-specific
  *     trailing-zero scale (cast the exact decimal result to DOUBLE at
  *     the end), SQL-side integer sums widen to HUGEINT (wrap in
  *     `CAST(... AS BIGINT)`), and ARRAY/STRUCT outputs break generic
  *     row-comparison harnesses (register a delimited-string gate
  *     projection; keep the array-typed function as the library API);
  *   - iterative DuckDB oracles mark every CTE `AS MATERIALIZED` —
  *     inlined CTE chains re-evaluate exponentially.
  */
final case class QueryDef(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String],
    doc: String = "",
    /** Lazily-rendered oracle for queries whose ground truth is only
      * computable at dump time (the SGD family's VALUES replay —
      * [[graft.operators.SpamOracle]]): evaluated when Verify dumps
      * oracle_sql.json, after the replay context is configured, and
      * skipped (weaker rows-only check) when no context is available. */
    oracleGen: Option[() => String] = None)

trait QueryModule {
  def entries: Seq[QueryDef]
}
