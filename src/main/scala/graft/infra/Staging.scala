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
}
