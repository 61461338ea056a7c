package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Fixture-table loaders (FIXTURES.md). One parquet dir per table under the
  * scale-factor dir. Loaded as plain DataFrames so Catalyst keeps full
  * pushdown/pruning; callers select/filter and let the optimizer reach the
  * parquet scan.
  */
object Tables {
  def load(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame = load(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame = load(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame = load(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame = load(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame = load(s, d, "lineitem")
  /** events.parquet's `ts` physical type has drifted across fixture
    * generations: TIMESTAMP(NANOS) (which Spark's vectorized reader
    * rejects — read as long via `nanosAsLong`, then truncate ns→µs with
    * integer division; epoch-nanos exceed 2^53 so a double round-trip
    * would corrupt them) vs plain TIMESTAMP(MICROS) without timezone
    * (read natively as TIMESTAMP_NTZ). Adapt on the observed schema so
    * either generation loads to the same µs-precision TIMESTAMP
    * column: NTZ is cast to the session-timezone type — value-
    * preserving under the engine's fixed UTC session timezone, and
    * required by everything watermark/window-shaped downstream
    * (EventTimeWatermark rejects TIMESTAMP_NTZ outright). DuckDB reads
    * the same column naively with the same values, so oracle parity
    * holds either way. */
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = load(s, d, "events")
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        raw.withColumn("ts", org.apache.spark.sql.functions.timestamp_micros(
          org.apache.spark.sql.functions.expr("ts div 1000")))
      case org.apache.spark.sql.types.TimestampNTZType =>
        raw.withColumn("ts",
          org.apache.spark.sql.functions.col("ts").cast("timestamp"))
      case _ => raw // already the session-timezone timestamp type
    }
  }
  def documents(s: SparkSession, d: String): DataFrame = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")
}
