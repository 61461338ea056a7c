package graft.tools
import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.Dedup._
// Temporary profiling harness; not part of the library surface.
object NgramProfile {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.1"
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"PROFILE $label: ${(System.nanoTime() - t0) / 1e9}%.2f s  -> $r"); r }
    // packed-codepoint gram: 4 x 14-bit codepoints -> 56 bits, no hash
    def packedGrams = {
      val t = col("text")
      val gram = (i: Column) => (0 until NGRAM_N).map { o =>
        pmod(ascii(t.substr(i + o, lit(1))), lit(16384)).cast("long") *
          (1L << (14 * (NGRAM_N - 1 - o)))
      }.reduce(_ + _)
      graft.Tables.documents(spark, dir)
        .filter(length(t) >= NGRAM_N)
        .select(col("doc_id"), col("source"),
          array_distinct(transform(
            sequence(lit(1), length(t) - (NGRAM_N - 1)), gram)).as("g"))
        .withColumn("n", size(col("g")))
        .repartition(col("doc_id"))
    }
    time("warmup") { packedGrams.select(sum(col("n"))).collect()(0) }
    time("packed grams sum(n)") { packedGrams.select(sum(col("n"))).collect()(0) }
    time("packed grams sum(n) again") { packedGrams.select(sum(col("n"))).collect()(0) }
    spark.stop()
  }
}
