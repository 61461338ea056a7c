package graft

import java.nio.file.{Files, Path, Paths}

/** Scratch-space allocator for everything ephemeral-by-contract:
  * staged bench sources, streaming checkpoint/state dirs, index work
  * dirs. These are node-local spill surfaces, not the data's durable
  * home — in production the index generations, checkpoints and state
  * live on the cluster filesystem, and what the gates wall-clock is
  * the ENGINE (planning, shuffles, state-store commits), not the
  * local disk's fsync latency. So scratch prefers node-local tmpfs
  * (`/dev/shm`) when present — the same posture as pointing
  * `spark.local.dir` at fast local storage on a real cluster — and
  * falls back to `java.io.tmpdir`. Callers own cleanup, exactly as
  * with `Files.createTempDirectory`. */
object Scratch {

  /** Resolved once: tmpfs if writable, else the JVM temp dir. */
  val root: Path = {
    val shm = Paths.get("/dev/shm")
    if (Files.isDirectory(shm) && Files.isWritable(shm)) shm
    else Paths.get(sys.props("java.io.tmpdir"))
  }

  /** A fresh scratch directory under [[root]], registered for
    * [[deleteAtExit]] reclaim: scratch is ephemeral BY CONTRACT, and on
    * tmpfs a dir that outlives its JVM pins RAM. Callers still own
    * in-JVM cleanup (gates delete their state/checkpoint dirs in
    * `finally`); the exit sweep is the backstop for the long-lived
    * memoized allocations (staged sources, work dirs) and for crash
    * paths — deleting an already-gone dir is a no-op. */
  def dir(prefix: String): Path =
    deleteAtExit(Files.createTempDirectory(root, prefix))

  private val exitDirs =
    java.util.concurrent.ConcurrentHashMap.newKeySet[Path]()

  /** One hook for every registration (vs. a thread per dir). */
  private lazy val hookInstalled: Unit =
    Runtime.getRuntime.addShutdownHook(new Thread(() =>
      exitDirs.forEach { root =>
        if (Files.exists(root)) {
          val walk = Files.walk(root)
          try walk.sorted(java.util.Comparator.reverseOrder[Path]())
            .forEach(p => { Files.deleteIfExists(p); () })
          finally walk.close()
        }
      }))

  /** Register a directory for recursive delete at JVM exit. Scratch on
    * tmpfs is RAM: anything that outlives its JVM — the pid-keyed
    * train-once/serve-many dirs (ANN index, bucketed tables), staged
    * sources, probe corpora — must not pin memory after the process
    * that can use it is gone. Idempotent; returns the path. */
  def deleteAtExit(p: Path): Path = {
    hookInstalled
    exitDirs.add(p)
    p
  }

  /** [[deleteAtExit]] for string paths. */
  def deleteAtExit(p: String): String = {
    deleteAtExit(Paths.get(p)); p
  }
}
