package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Interactive query loop — the Spark mirror of the reference's stdin
  * drivers (`BooleanRetrievalCompressed.java:218`'s query loop; the
  * course CLIs' ad-hoc lookups), the one reference behavior with no
  * batch analogue. Each command dispatches to the SAME library entry
  * the gate queries exercise, so the loop adds an edge, not a second
  * implementation:
  *
  * {{{
  *   q <postfix boolean query>   e.g.  q fast table AND slow OR
  *   sim <vec_id> [k]            exact top-k neighbours of a vector
  *   quit
  * }}}
  *
  * Driver-side printing is the point of a REPL; everything underneath
  * stays the distributed plans ([[operators.InvertedIndex.retrieve]]
  * evaluates the whole query workload in one pass,
  * [[operators.Similarity.nearestTo]] is a broadcast-probe
  * TakeOrderedAndProject). ReplSpec drives [[dispatch]] directly.
  */
object Repl {

  /** Parse one REPL line into the DataFrame it queries, or None for
    * blank/unrecognized input. Split out of the stdin loop for tests. */
  def dispatch(spark: SparkSession, sfDir: String, line: String): Option[DataFrame] =
    line.trim.split("\\s+").toSeq match {
      case Seq("") => None
      case Seq("sim", id) if id.forall(_.isDigit) =>
        Some(operators.Similarity.nearestTo(spark, sfDir, id.toLong,
          operators.Similarity.TOP_K))
      case Seq("sim", id, k) if id.forall(_.isDigit) && k.forall(_.isDigit) =>
        Some(operators.Similarity.nearestTo(spark, sfDir, id.toLong, k.toInt))
      case "q" +: rest if rest.nonEmpty =>
        Some(operators.InvertedIndex.retrieve(spark, sfDir, rest.mkString(" ")))
      case _ => None
    }

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    println(s"graft repl over $sfDir — `q <postfix boolean>`, `sim <vec_id> [k]`, `quit`")
    var line = scala.io.StdIn.readLine("graft> ")
    while (line != null && line.trim != "quit" && line.trim != "exit") {
      dispatch(spark, sfDir, line) match {
        case Some(df) =>
          try df.show(50, truncate = false)
          catch { case e: Exception => println(s"error: ${e.getMessage}") }
        case None => println("commands: q <postfix boolean query> | sim <vec_id> [k] | quit")
      }
      line = scala.io.StdIn.readLine("graft> ")
    }
    spark.stop()
  }
}
