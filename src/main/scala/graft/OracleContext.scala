package graft

import org.apache.spark.sql.SparkSession

/** The (session, sfDir) a dump-time oracle generator should replay —
  * installed by `Verify.main` before `SparkEntry.oracleSql` is dumped.
  * Generators ([[operators.SpamOracle]], the auto-geometry LSH oracle)
  * need the live corpus to render their ground truth (sequential
  * replays, corpus-count-derived parameters), which no static SQL
  * string can carry across scale factors. Outside a configured Verify
  * run, [[get]] throws and the affected entries fall back to the
  * rows-only check.
  */
object OracleContext {
  /** The one exception that legitimately downgrades a generated oracle
    * to the rows-only check. A distinct type (not a bare
    * IllegalStateException) so that a generator's own bugs — whatever
    * they throw — still fail the dump visibly. */
  final class Unconfigured extends IllegalStateException(
    "OracleContext not configured: dump-time oracles are only rendered " +
      "inside a Verify run (Verify.main calls OracleContext.configure)")

  @volatile private var ctx: Option[(SparkSession, String)] = None

  def configure(spark: SparkSession, sfDir: String): Unit =
    ctx = Some((spark, sfDir))

  def get: (SparkSession, String) = ctx.getOrElse(throw new Unconfigured)
}
