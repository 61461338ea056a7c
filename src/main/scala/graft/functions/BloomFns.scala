package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate

/** Spark's OWN runtime-filter expressions (the machinery behind
  * `spark.sql.optimizer.runtime.bloomFilter.*`), surfaced as callable
  * session functions for plans the optimizer's automatic injection
  * cannot reach:
  *
  *   - `graft_bloom_agg(hash)` — [[BloomFilterAggregate]]: folds long
  *     hashes into one serialized-BloomFilter binary value.
  *   - `graft_bloom_might(bf, hash)` — [[BloomFilterMightContain]]:
  *     probes it; the filter side must be foldable or a scalar
  *     subquery (the expression deserializes once per task and
  *     codegens the probe), so callers pass the aggregate through a
  *     scalar subquery, exactly as `InjectRuntimeFilter` does.
  *
  * Both are codegen'd engine built-ins — no UDF boundary anywhere.
  */
object BloomFns {
  val AGG_NAME = "graft_bloom_agg"
  val MIGHT_NAME = "graft_bloom_might"

  /** Sized for a fixed-small build side (an eval suite does not grow
    * with the corpus): 2^20 expected items over 2^23 bits = 8 bits per
    * item (1 MiB on the wire) — fpp ≈ 2% at FULL 2^20 capacity, and
    * far below 0.1% at realistic eval gram counts (≤2^17 items leaves
    * 64 bits each). Correctness never depends on this — the filter
    * only PREfilters above an exact verify join; an undersized filter
    * admits more rows to the join, nothing else. */
  val EXPECTED_ITEMS: Long = 1L << 20
  val NUM_BITS: Long = 1L << 23

  private val registered =
    java.util.Collections.newSetFromMap(
      new java.util.WeakHashMap[SparkSession, java.lang.Boolean]())

  /** Idempotently registers both functions in the session's
    * FunctionRegistry (single lock over check+replace, the
    * MinHashSignature idiom). */
  def register(spark: SparkSession): Unit =
    registered.synchronized {
      if (!registered.contains(spark)) {
        spark.sessionState.functionRegistry.createOrReplaceTempFunction(
          AGG_NAME,
          exprs => new BloomFilterAggregate(exprs.head,
            Literal(EXPECTED_ITEMS), Literal(NUM_BITS)),
          "built-in")
        spark.sessionState.functionRegistry.createOrReplaceTempFunction(
          MIGHT_NAME,
          exprs => BloomFilterMightContain(exprs.head, exprs(1)),
          "built-in")
        registered.add(spark)
      }
    }
}
