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

/** Session-scoped memo table — the one container behind every
  * per-(session, key) memo and staging registry in the library.
  * Entries are reached through a `WeakHashMap` keyed by the OWNING
  * SparkSession (the posture the function-registry caches such as
  * `UrlNormalize.registered` already use).
  *
  * Collectability — precisely (r15 advice corrected the earlier
  * blanket claim): a `WeakHashMap` entry is reclaimable only if its
  * VALUE does not strongly reach its KEY. Each cell nulls its thunk
  * once the value is computed (an un-nulled thunk closure would retain
  * the session as a field for the cell's lifetime), so memos whose
  * values are session-free — the String-valued staging registries,
  * which are most instances — really are collected with their
  * session. DataFrame-valued memos (trained models, cluster tables)
  * are NOT: a DataFrame strongly references its owning session, so the
  * value reaches the key and the entry survives until an explicit
  * [[SessionMemo.clear]] / [[Caches.clearAll]] (the classic
  * WeakHashMap value→key caveat). A long-lived multi-session process
  * that churns sessions must therefore clear the DataFrame-valued
  * memos when it retires a session — most are registered with
  * [[Caches]] (`clearAll()` empties them); the deliberately
  * unregistered clusters memo pins its session until its own
  * `clear()`, the documented cost of its warm read-through.
  *
  * Compute-once is guaranteed PER KEY, not per memo: the map stores
  * lazily-initialized cells inserted with an atomic `putIfAbsent` (a
  * bare `TrieMap.getOrElseUpdate` evaluates the thunk in every racing
  * thread), and the winning cell's `lazy val` runs the thunk under
  * that cell's own initialization lock. Concurrent first-touch of
  * DIFFERENT keys — e.g. two tables staging to disk — therefore
  * proceeds in parallel; only same-key racers block on each other
  * (round-14 advice: the earlier memo-wide lock serialized unrelated
  * stagings behind one slow one). A thunk that throws leaves its cell
  * uninitialized, so the next caller retries — the same retry
  * semantics the map-wide form had. The memo-wide lock survives only
  * for the O(1) session→map lookup and `clear`. */
final class SessionMemo[K, V] {
  import org.apache.spark.sql.SparkSession

  /** One per-key compute slot; `lazy val` gives the per-cell lock.
    * The thunk is HELD IN A VAR AND NULLED once the value lands: a
    * constructor param referenced from a lazy-val body stays a field,
    * and these closures typically capture the owning session — keeping
    * one alive would give every entry a value→key strong path and
    * defeat the WeakHashMap (r15 advice). A thunk that throws leaves
    * both the cell uninitialized and the thunk in place, so the next
    * caller retries. */
  private final class Cell(thunk0: () => V) {
    private[this] var thunk: () => V = thunk0
    lazy val value: V = { val v = thunk(); thunk = null; v }
  }

  private val bySession = new java.util.WeakHashMap[
    SparkSession, scala.collection.concurrent.TrieMap[K, Cell]]()

  private def mapFor(s: SparkSession): scala.collection.concurrent.TrieMap[K, Cell] =
    bySession.synchronized {
      var m = bySession.get(s)
      if (m == null) {
        m = scala.collection.concurrent.TrieMap.empty[K, Cell]
        bySession.put(s, m)
      }
      m
    }

  def getOrElseUpdate(s: SparkSession, k: K)(v: => V): V = {
    val m = mapFor(s)
    val fresh = new Cell(() => v)
    m.putIfAbsent(k, fresh).getOrElse(fresh).value
  }

  /** Blocks only if THIS key's computation is in flight (it then
    * returns the computed value, as the map-wide form did). */
  def get(s: SparkSession, k: K): Option[V] =
    mapFor(s).get(k).map(_.value)

  /** The memoized value; throws like a map lookup when absent. */
  def apply(s: SparkSession, k: K): V = mapFor(s)(k).value

  def update(s: SparkSession, k: K, v: V): Unit = {
    val cell = new Cell(() => v)
    cell.value // pre-force: a stored constant, nothing to defer
    mapFor(s)(k) = cell
  }

  def clear(): Unit = bySession.synchronized { bySession.clear() }
}
