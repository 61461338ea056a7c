package graft

/** Registry of memoized intermediate results (trained models, iterated
  * rank tables — the Spark-native analogue of the reference's
  * HDFS-materialized job outputs that downstream jobs re-read).
  *
  * Cross-query reuse is a real library property (pagerank_topk reads
  * pagerank's ranks, spam_apply reads spam_train's model), but it must
  * not hide compute from the benchmark: `graft.Bench` clears this
  * registry before every timed run so per-query timings are honest
  * cold-compute numbers (warm JVM, cold results). */
object Caches {
  private val clearables =
    new java.util.concurrent.CopyOnWriteArrayList[() => Unit]()

  def register(clear: () => Unit): Unit = clearables.add(clear)

  def clearAll(): Unit = clearables.forEach(f => f())

  /** Short stable PATH key (4-byte-MD5 hex of the path STRING — not a
    * content hash; callers that need regeneration-in-place safety mix
    * in their own dataset fingerprint, as the ANN index identity does
    * with the embeddings file's mtime+size) — the one definition
    * behind every per-dataset temp location and view name (ANN index
    * dirs, bloom eval views). */
  def pathKey(dir: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(dir.getBytes("UTF-8")).take(4).map(b => f"$b%02x").mkString
}
