package graft.streaming

import org.apache.spark.sql.streaming.StreamingQuery

/** Per-micro-batch telemetry for the streaming family (VERDICT r13 item 8).
  *
  * The streaming queries' bench cost is dominated by a micro-batch
  * SCHEDULING floor (7 of the r13 suite's slowest 20 are streaming; the
  * per-batch stateful work is small and bounded by design). A future
  * regression in this family can therefore mean two very different things —
  * the PLAN drifted (per-batch work grew) or the BATCH COUNT/floor moved
  * (file-source slicing, scheduler pauses) — and wall-clock alone cannot
  * separate them. This collector records, for every micro-batch of every
  * harness-run stream, the engine's own triggerExecution duration and input
  * row count (StreamingQueryProgress — pulled synchronously from
  * `query.recentProgress` before stop, so no listener-bus race), and
  * StreamBench reports per query: wall seconds, batch count, summed batch
  * work, and floor = wall − work. Disabled (and free) outside the bench. */
object StreamTelemetry {

  final case class Batch(label: String, batchId: Long, triggerMs: Long, inputRows: Long)

  /** Set by StreamBench around each query; streams record under it. */
  @volatile var label: String = ""
  /** Off by default — Verify/Bench/production paths pay nothing. */
  @volatile var enabled: Boolean = false

  private val buf = new java.util.concurrent.ConcurrentLinkedQueue[Batch]()

  /** Pull this query's progress history into the buffer (call before stop). */
  def record(q: StreamingQuery): Unit = if (enabled) {
    q.recentProgress.foreach { p =>
      val ms = Option(p.durationMs.get("triggerExecution")).map(_.longValue).getOrElse(0L)
      buf.add(Batch(label, p.batchId, ms, p.numInputRows))
    }
  }

  /** Remove and return everything recorded since the last drain. */
  def drain(): Seq[Batch] = {
    val out = scala.collection.mutable.ArrayBuffer[Batch]()
    var b = buf.poll()
    while (b != null) { out += b; b = buf.poll() }
    out.toSeq
  }
}
