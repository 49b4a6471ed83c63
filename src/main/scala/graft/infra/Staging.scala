package graft.infra

import java.nio.file.{Files, Path}

/** Process-lifetime temp staging with guaranteed cleanup.
  *
  * Streaming sinks, checkpoints, and the per-sf fixture stages used to
  * leak one temp directory per invocation (ADVICE r3): repeated
  * bench/verify runs accumulated unbounded /tmp data. Every staging dir
  * now registers here and a single shutdown hook removes the trees when
  * the JVM exits; long-lived dirs (per-sf fixture stages) get the same
  * treatment since they are per-process caches, not cross-run artifacts. */
object Staging {

  private val registered = new java.util.concurrent.ConcurrentLinkedQueue[Path]()

  private lazy val hookInstalled: Unit = {
    Runtime.getRuntime.addShutdownHook(new Thread(() => {
      registered.forEach { root =>
        try {
          if (Files.exists(root))
            Files.walk(root).sorted(java.util.Comparator.reverseOrder())
              .forEach(p => { try Files.deleteIfExists(p) catch { case _: Exception => () } })
        } catch { case _: Exception => () }
      }
    }, "graft-staging-cleanup"))
  }

  /** A temp directory that is removed on JVM shutdown. */
  def tempDir(prefix: String): Path = {
    hookInstalled
    val p = Files.createTempDirectory(prefix)
    registered.add(p)
    p
  }

  /** Deterministic per-corpus stage path OUTSIDE the exit cleanup — the
    * driver's DuckDB oracle compare reads these parquet stages AFTER this
    * JVM exits, so they must survive it (the harness's tmpdir is wiped
    * between rounds; nothing accumulates across rounds).
    *
    * Keyed by the corpus dir's CANONICAL path, not its basename (ADVICE
    * r8: two corpora sharing a basename in one JVM must not share a
    * stage — the second would silently reuse the first's staged
    * thresholds and the oracle compare would mask it, both engines
    * reading the same stale file). */
  def oracleStagePath(kind: String, sfDir: String): String = {
    val f = new java.io.File(sfDir)
    val canon = try f.getCanonicalPath catch { case _: java.io.IOException => f.getAbsolutePath }
    // sanitization is lossy ('/data/a b' and '/data/a_b' both map to
    // data_a_b), so a short hash of the UNSANITIZED canonical path rides
    // along to keep the key injective (ADVICE r9) — same silent
    // cross-corpus reuse class the canonical-path keying fixed in r8
    val key = canon.replaceAll("[^A-Za-z0-9._-]", "_").dropWhile(_ == '_')
    val tag = f"${canon.hashCode & 0x7fffffff}%x"
    java.nio.file.Paths.get(sys.props("java.io.tmpdir"), "graft-oracle-stage",
      kind + "_" + key + "_" + tag).toString
  }
}
