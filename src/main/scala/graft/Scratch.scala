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

  /** Minimum free bytes tmpfs must report before we stage onto it.
    * Docker defaults /dev/shm to 64 MiB; staging a full-table dump
    * into that hits ENOSPC mid-write — a failure java.io.tmpdir would
    * not produce. 1 GiB comfortably covers the largest gate staging
    * (sf0.1 text dumps) while rejecting the constrained defaults. */
  private val MinTmpfsFreeBytes = 1L << 30

  /** Resolved once: explicit override, else tmpfs if writable and
    * roomy, else the JVM temp dir. `GRAFT_SCRATCH_DIR` (env) /
    * `graft.scratch.dir` (system property) force a location — the
    * escape hatch for hosts where tmpfs is small or memory-pressured. */
  val root: Path = {
    val overridden = sys.props.get("graft.scratch.dir")
      .orElse(sys.env.get("GRAFT_SCRATCH_DIR")).map(Paths.get(_))
    val shm = Paths.get("/dev/shm")
    // An explicit override FORCES the location: create it if absent,
    // fail loudly if unusable. Silently falling back to tmpfs would
    // reintroduce exactly the memory pressure the operator set the
    // override to avoid.
    overridden.map { p =>
        Files.createDirectories(p)
        require(Files.isWritable(p), s"scratch override $p is not writable")
        p
      }
      .orElse(Some(shm).filter { p =>
        Files.isDirectory(p) && Files.isWritable(p) &&
          (try p.toFile.getUsableSpace >= MinTmpfsFreeBytes
           catch { case _: Exception => false })
      })
      .getOrElse(Paths.get(sys.props("java.io.tmpdir")))
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

  /** One hook for every registration (vs. a thread per dir). Each
    * directory's sweep is exception-isolated: one failed delete (a
    * permission quirk, or a race with Spark's own shutdown hooks
    * removing files under the walk) must not abort the sweep and leak
    * the remaining tmpfs dirs — the RAM-pinning this hook exists to
    * prevent. */
  private lazy val hookInstalled: Unit =
    Runtime.getRuntime.addShutdownHook(new Thread(() =>
      exitDirs.forEach { root =>
        try {
          if (Files.exists(root)) {
            val walk = Files.walk(root)
            try walk.sorted(java.util.Comparator.reverseOrder[Path]())
              .forEach(p => {
                try { Files.deleteIfExists(p); () }
                catch { case _: Exception => () }
              })
            finally walk.close()
          }
        } catch { case _: Exception => () }
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
