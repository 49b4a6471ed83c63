package graft

import graft.infra.SubProcess
import org.apache.spark.sql.functions._

/** The subprocess kernel really execs a child per partition and really
  * pushes the bytes through it. */
class SubProcessSpec extends SparkSpec {
  import spark.implicits._

  private def payloads(n: Int, parts: Int) =
    (1 to n).map(i => (i.toLong, s"payload-$i".getBytes("UTF-8")))
      .toDF("doc_id", "payload").repartition(parts)

  test("identity worker (/bin/cat) round-trips every frame") {
    val in = payloads(100, 4)
    val out = SubProcess.pipeFramed(
      in.as[(Long, Array[Byte])], Seq("/bin/cat")).collect()
    assert(out.length == 100)
    assert(out.toMap.map { case (k, v) => k -> new String(v, "UTF-8") } ==
      (1 to 100).map(i => i.toLong -> s"payload-$i").toMap)
  }

  test("one child process is launched per non-empty partition") {
    val pidFile = java.nio.file.Files.createTempFile("graft-subproc-pids", ".txt")
    val cmd = Seq("/bin/sh", "-c", s"echo $$$$ >> $pidFile; exec /bin/cat")
    val n = SubProcess.pipeFramed(
      payloads(64, 4).as[(Long, Array[Byte])], cmd).count()
    assert(n == 64)
    val pids = scala.jdk.CollectionConverters.ListHasAsScala(
      java.nio.file.Files.readAllLines(pidFile)).asScala.filter(_.nonEmpty)
    assert(pids.size == 4, s"expected 4 child launches, saw: $pids")
    assert(pids.distinct.size == 4)
  }

  test("bytes genuinely pass through the child (a transforming worker changes them)") {
    // tr swaps hex digits 'a'<->'b' inside the frame payload: byte 0xAA
    // comes back 0xBB — impossible unless the child saw the bytes
    val in = Seq((7L, Array(0xAA.toByte))).toDF("doc_id", "payload")
    val cmd = Seq("/bin/sh", "-c", "tr 'ab' 'ba'")
    val out = SubProcess.pipeFramed(in.as[(Long, Array[Byte])], cmd).collect()
    assert(out.head._1 == 7L)
    assert(out.head._2.toSeq == Seq(0xBB.toByte))
  }

  test("decodeBatched through the kernel matches the direct byte stats") {
    val docs = graft.sources.Tables.documents(spark, "/root/testdata/sf0.001")
      .limit(100)
      .select(col("doc_id"), col("text").cast("binary").as("payload"))
    val viaChild = graft.operators.TextStats.decodeBatched(docs)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val direct = docs.as[(Long, Array[Byte])].collect().map { case (id, bytes) =>
      (id, bytes.length.toLong, if (bytes.isEmpty) 0L else bytes(0).toLong)
    }.toSet
    assert(viaChild == direct)
    assert(viaChild.nonEmpty)
  }

  test("the python3 decode worker rewrites payload bytes AND frame lengths") {
    // the driver query's stand-in codec: upper + strip vowels. Both content
    // and length change, so the framing can't get away with echoing input
    // lengths anywhere.
    val in = Seq((1L, "hello world".getBytes("ASCII")),
                 (2L, "aeiou".getBytes("ASCII")),
                 (3L, Array.empty[Byte])).toDF("doc_id", "payload")
    val out = SubProcess.pipeFramed(
        in.as[(Long, Array[Byte])], graft.operators.TextStats.DecodeWorkerCmd)
      .collect().map { case (id, b) => id -> new String(b, "ASCII") }.toMap
    assert(out == Map(1L -> "HLL WRLD", 2L -> "", 3L -> ""))
  }

  test("empty partitions launch no child and emit no rows") {
    val in = spark.emptyDataset[(Long, Array[Byte])].repartition(4)
    assert(SubProcess.pipeFramed(in, Seq("/bin/cat")).count() == 0)
  }

  test("a crashed child fails the task loudly instead of truncating output") {
    val in = payloads(10, 1).as[(Long, Array[Byte])]
    val e = intercept[org.apache.spark.SparkException] {
      SubProcess.pipeFramed(in, Seq("/bin/sh", "-c", "exit 3")).count()
    }
    assert(e.getMessage.contains("exited with code 3") ||
      Option(e.getCause).exists(_.getMessage.contains("exited with code 3")), e.getMessage)
  }

  test("a filtering child (head) truncates cleanly with exit code 0") {
    // head stops reading after 5 lines -> broken pipe at the writer; that's
    // the child's prerogative (exit 0), so the task gets the 5 frames
    val in = payloads(64, 1).as[(Long, Array[Byte])]
    val n = SubProcess.pipeFramed(in, Seq("/usr/bin/head", "-n", "5")).count()
    assert(n == 5)
  }

  test("a child that dies MID-PARTITION fails the task after the frames it did emit") {
    // echoes 2 frames then dies nonzero: the reader drains both, hits EOF,
    // and the exit-code check must kill the task (not silently keep the
    // truncated prefix) with the command named
    val in = payloads(50, 1).as[(Long, Array[Byte])]
    val cmd = Seq("/bin/sh", "-c", "head -n 2; exit 7")
    val e = intercept[org.apache.spark.SparkException] {
      SubProcess.pipeFramed(in, cmd).count()
    }
    val msg = e.getMessage + Option(e.getCause).map(_.getMessage).getOrElse("")
    assert(msg.contains("exited with code 7") && msg.contains("head -n 2"), msg)
  }

  test("a STALLED child is killed and the task fails naming the command, not a hang") {
    // reads everything, emits nothing, sleeps far past the read timeout —
    // without the bounded read this spec would wedge the suite. `exec` is
    // load-bearing: it makes the Process handle BE the sleep, so
    // destroyForcibly kills it — a plain `sleep` would be sh's orphan,
    // survive the kill, and hold the forked JVM's inherited stderr pipe
    // open for its whole duration (sbt drains that pipe after the JVM
    // exits — a 600 s post-suite hang that looks like a wedged build)
    val in = payloads(5, 1).as[(Long, Array[Byte])]
    val cmd = Seq("/bin/sh", "-c", "cat > /dev/null; exec sleep 600")
    val t0 = System.nanoTime()
    val e = intercept[org.apache.spark.SparkException] {
      SubProcess.pipeFramed(in, cmd, readTimeoutMs = 2000L).count()
    }
    val elapsedSec = (System.nanoTime() - t0) / 1e9
    val msg = e.getMessage + Option(e.getCause).map(_.getMessage).getOrElse("")
    assert(msg.contains("stalled") && msg.contains("sleep 600"), msg)
    assert(elapsedSec < 60.0, s"stall detection took ${elapsedSec}s")
  }

  test("a child that emits a PARTIAL line then wedges is killed, not hung (ADVICE r9)") {
    // the r9 guard only bounded the wait for the FIRST byte: a child that
    // prints a line fragment without '\n' and then stalls made ready()
    // true once, and the old readLine() delegation blocked forever. The
    // deadline now lives inside the byte loop. `exec` per the stalled-child
    // spec above: the handle must BE the sleep so destroyForcibly kills it.
    val in = payloads(5, 1).as[(Long, Array[Byte])]
    val cmd = Seq("/bin/sh", "-c", "cat > /dev/null; printf '123\\tdead'; exec sleep 600")
    val t0 = System.nanoTime()
    val e = intercept[org.apache.spark.SparkException] {
      SubProcess.pipeFramed(in, cmd, readTimeoutMs = 2000L).count()
    }
    val elapsedSec = (System.nanoTime() - t0) / 1e9
    val msg = e.getMessage + Option(e.getCause).map(_.getMessage).getOrElse("")
    assert(msg.contains("partial line") && msg.contains("sleep 600"), msg)
    assert(elapsedSec < 60.0, s"mid-line stall detection took ${elapsedSec}s")
  }

  test("a child that prints diagnostics to stdout fails with the command and line named") {
    val in = payloads(3, 1).as[(Long, Array[Byte])]
    val e = intercept[org.apache.spark.SparkException] {
      SubProcess.pipeFramed(in,
        Seq("/bin/sh", "-c", "echo 'loading model...'; exec /bin/cat")).count()
    }
    val msg = e.getMessage + Option(e.getCause).map(_.getMessage).getOrElse("")
    assert(msg.contains("malformed") && msg.contains("loading model..."), msg)
  }
}
