package graft.infra

import org.apache.spark.TaskContext
import org.apache.spark.sql.{DataFrame, Dataset}

/** Executor-side subprocess kernel — the Spark analog of the reference's
  * SubProcessKernel (etl/subprocess_pipeline/kernel/SubProcessKernel.java,
  * which execs Ab3P per bundle and captures stdout).
  *
  * Spark-first shape: ONE child process per partition (not per batch — the
  * child keeps its model/resource state warm across the whole partition),
  * a daemon writer thread streams framed records into the child's stdin
  * while the task's iterator lazily consumes framed records from stdout.
  * The concurrent writer is what makes the pipe deadlock-free: a
  * write-everything-then-read loop wedges as soon as one side's pipe
  * buffer fills, which is exactly the failure mode a 100 TB partition
  * would hit first. Cleanup is tied to the task lifecycle (completion
  * listener destroys a still-live child on task end/failure).
  *
  * Frame format: one `id \t hex(payload)` line per record — binary-safe,
  * order-preserving, trivially consumed by line-oriented workers. The
  * sandbox has no model binaries, so the default worker is /bin/cat (byte
  * identity); a cluster swaps in the real binary (Ab3P, a codec, a tagger)
  * plus a matching output parser.
  */
object SubProcess {

  private val HexChars = "0123456789abcdef".toCharArray

  def toHex(bytes: Array[Byte]): String = {
    val sb = new java.lang.StringBuilder(bytes.length * 2)
    var i = 0
    while (i < bytes.length) {
      val b = bytes(i) & 0xff
      sb.append(HexChars(b >>> 4)).append(HexChars(b & 0xf))
      i += 1
    }
    sb.toString
  }

  def fromHex(s: String): Array[Byte] = {
    val out = new Array[Byte](s.length / 2)
    var i = 0
    while (i < out.length) {
      out(i) = ((Character.digit(s.charAt(2 * i), 16) << 4) |
        Character.digit(s.charAt(2 * i + 1), 16)).toByte
      i += 1
    }
    out
  }

  /** Pipe (id, payload) records through `cmd`, one child per partition.
    * Returns the child's (id, payload) output frames.
    *
    * `readTimeoutMs` bounds the silence between output frames: a child
    * that stalls (wedged model, dead lock, infinite loop) is killed and
    * the task fails NAMING THE COMMAND instead of hanging the stage —
    * the reference kernel's process-timeout discipline
    * (subprocess_pipeline/kernel/SubProcessKernel.java). The poll watches
    * `ready() || !isAlive`: once the child exits, any buffered frames
    * still drain and the EOF path checks the exit code as usual. */
  def pipeFramed(payloads: Dataset[(Long, Array[Byte])],
                 cmd: Seq[String],
                 readTimeoutMs: Long = 600000L): Dataset[(Long, Array[Byte])] = {
    import payloads.sparkSession.implicits._
    payloads.mapPartitions { it =>
      if (!it.hasNext) Iterator.empty
      else {
        val pb = new ProcessBuilder(cmd: _*)
        // child diagnostics belong in the executor log, not the data pipe
        pb.redirectError(ProcessBuilder.Redirect.INHERIT)
        val proc = pb.start()
        val taskCtx = TaskContext.get()
        Option(taskCtx).foreach(_.addTaskCompletionListener[Unit] { _ =>
          if (proc.isAlive) proc.destroyForcibly()
        })
        val writer = new Thread(() => {
          // the writer consumes the UPSTREAM iterator, whose lazily
          // initialized internals (vectorized readers, shuffle/memory-
          // manager iterators) call TaskContext.get() — propagate the task
          // thread's context exactly as Spark's PipedRDD does
          if (taskCtx != null) org.apache.spark.graftbridge.TaskContextBridge.set(taskCtx)
          val w = new java.io.BufferedWriter(new java.io.OutputStreamWriter(
            proc.getOutputStream, java.nio.charset.StandardCharsets.US_ASCII), 1 << 16)
          try {
            it.foreach { case (id, bytes) =>
              w.write(java.lang.Long.toString(id))
              w.write('\t')
              w.write(toHex(bytes))
              w.write('\n')
            }
          } catch {
            // a child that stops reading early (a filter like `head`, or a
            // crash) breaks the pipe here; that is the CHILD's story to
            // tell — its exit code is checked when stdout drains
            case _: java.io.IOException => ()
          } finally {
            try w.close() // EOF tells the child to finish
            catch { case _: java.io.IOException => () }
          }
        }, "graft-subprocess-writer")
        writer.setDaemon(true)
        writer.start()
        val r = new java.io.BufferedReader(new java.io.InputStreamReader(
          proc.getInputStream, java.nio.charset.StandardCharsets.US_ASCII), 1 << 16)
        // read a line with the inter-byte silence budget enforced INSIDE
        // the read: characters are pulled only when ready() (or the child
        // has exited — a dead child's pipe never blocks: buffered bytes
        // drain, then EOF), and the deadline resets on every byte of
        // progress. Delegating to readLine() after the first ready() byte
        // would reintroduce the unbounded hang for a child that emits a
        // partial line and then wedges (ADVICE r9).
        def readLineBounded(): String = {
          var deadline = System.nanoTime() + readTimeoutMs * 1000000L
          val sb = new java.lang.StringBuilder(64)
          while (true) {
            if (r.ready() || !proc.isAlive) {
              val c = r.read()
              if (c == -1) return if (sb.length == 0) null else sb.toString
              if (c == '\n') return sb.toString
              if (c != '\r') sb.append(c.toChar)
              deadline = System.nanoTime() + readTimeoutMs * 1000000L
            } else {
              if (System.nanoTime() > deadline) {
                proc.destroyForcibly()
                val where = if (sb.length == 0) "no output"
                  else s"a partial line (${sb.length} chars, no terminator)"
                throw new RuntimeException(
                  s"subprocess worker ${cmd.mkString(" ")} produced $where " +
                    s"then went silent for $readTimeoutMs ms (stalled); child killed")
              }
              Thread.sleep(5)
            }
          }
          null // unreachable
        }
        new Iterator[(Long, Array[Byte])] {
          private var line: String = readLineBounded()
          private def onDrained(): Unit = {
            r.close()
            val code = proc.waitFor()
            // fail LOUDLY: a crashed child must kill the task, not quietly
            // truncate the partition's output
            if (code != 0)
              throw new RuntimeException(
                s"subprocess worker ${cmd.mkString(" ")} exited with code $code")
          }
          override def hasNext: Boolean = {
            val has = line != null
            if (!has) onDrainedOnce()
            has
          }
          private var drained = false
          private def onDrainedOnce(): Unit =
            if (!drained) { drained = true; onDrained() }
          override def next(): (Long, Array[Byte]) = {
            val cur = line
            line = readLineBounded()
            if (line == null) onDrainedOnce()
            // a worker that prints diagnostics to stdout corrupts the data
            // pipe — name the command and the offending line instead of
            // dying with a bare substring/parse exception
            val tab = cur.indexOf('\t')
            if (tab <= 0) throw new RuntimeException(
              s"subprocess worker ${cmd.mkString(" ")} emitted a malformed " +
                s"frame (no id\\tpayload tab): '${cur.take(120)}'")
            val id =
              try java.lang.Long.parseLong(cur.substring(0, tab))
              catch { case _: NumberFormatException => throw new RuntimeException(
                s"subprocess worker ${cmd.mkString(" ")} emitted a frame with " +
                  s"a non-numeric id: '${cur.take(120)}'")
              }
            (id, fromHex(cur.substring(tab + 1).toLowerCase(java.util.Locale.ROOT)))
          }
        }
      }
    }
  }
}
