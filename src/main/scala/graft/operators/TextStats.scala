package graft.operators

import graft.functions.Num
import graft.functions.ConceptDict
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Text analysis + multimodal-column plumbing for training-data pipelines.
  *
  * Language-ID (stopword-profile heuristic), quality scoring
  * (length/stopword/type-token features), token counting, and the multimodal
  * binary-column path: payloads as opaque binary with typed metadata. The
  * decode step is STUBBED deterministically (no image/audio libs in this
  * environment) — the Spark-side schema, batching and partitioning are real.
  */
object TextStats {

  private def stopCount = ConceptDict.stopwords
    .map(s => size(filter(split(col("text"), " "), t => t === s)))
    .reduce(_ + _)

  /** doc_id, n_tokens, n_stopwords, stop_ratio, predicted_lang.
    * The heuristic scores against an English stopword profile. */
  def langId(docs: DataFrame): DataFrame =
    docs
      .withColumn("n_tokens", size(split(col("text"), " ")).cast("long"))
      .withColumn("n_stopwords", stopCount.cast("long"))
      .withColumn("stop_ratio", Num.r6(col("n_stopwords").cast("double") / col("n_tokens").cast("double")))
      .select(col("doc_id"), col("n_tokens"), col("n_stopwords"), col("stop_ratio"),
        when(col("stop_ratio") >= 0.05, "en").otherwise("und").as("predicted_lang"))

  /** Per-doc quality features + a composite score (all integer-derived →
    * deterministic): n_chars, n_tokens, n_distinct_tokens, approx_bpe_tokens,
    * avg_token_len, stop_ratio, type_token_ratio, quality. */
  def quality(docs: DataFrame): DataFrame =
    docs
      .withColumn("toks", split(col("text"), " "))
      .withColumn("n_tokens", size(col("toks")).cast("long"))
      .withColumn("n_distinct", size(array_distinct(col("toks"))).cast("long"))
      .withColumn("n_stop", stopCount.cast("long"))
      .select(
        col("doc_id"),
        col("n_chars"),
        col("n_tokens"),
        col("n_distinct").as("n_distinct_tokens"),
        ceil(col("n_chars") / lit(4.0)).cast("long").as("approx_bpe_tokens"),
        Num.r6((col("n_chars") - col("n_tokens") + 1).cast("double") / col("n_tokens").cast("double")).as("avg_token_len"),
        Num.r6(col("n_stop").cast("double") / col("n_tokens").cast("double")).as("stop_ratio"),
        Num.r6(col("n_distinct").cast("double") / col("n_tokens").cast("double")).as("type_token_ratio"),
        Num.r6(
          least(lit(1.0), col("n_tokens").cast("double") / 100.0)
            * (lit(1.0) - col("n_stop").cast("double") / col("n_tokens").cast("double"))
            * (col("n_distinct").cast("double") / col("n_tokens").cast("double"))).as("quality"))

  /** Gopher quality rules (Rae et al. 2021, Table A1 — the published
    * heuristic filter suite MassiveText shipped with) as named boolean
    * gates per document: word-count bounds, mean-word-length bounds,
    * symbol-to-word ratio, alphabetic-word fraction, and distinct-stopword
    * presence. The two line-shape rules (bullet starts / ellipsis ends)
    * are omitted — this corpus carries no line structure; they'd be
    * constant-true columns, not semantics.
    *
    * Every threshold is compared in EXACT INTEGERS (3·n ≤ chars ≤ 10·n
    * instead of dividing into a float mean), so rule bits are
    * order-independent and cross-engine identical with no rounding step
    * anywhere. One narrow projection per document — embarrassingly
    * parallel, no shuffle at any scale. */
  def gopherRules(docs: DataFrame): DataFrame = {
    val toks = split(col("text"), " ")
    val stopArr = array(ConceptDict.stopwords.map(lit): _*)
    docs
      .withColumn("n_words", size(toks).cast("long"))
      .withColumn("word_chars", (col("n_chars") - col("n_words") + 1).cast("long"))
      .withColumn("n_alpha_words",
        size(filter(toks, t => t.rlike("[A-Za-z]"))).cast("long"))
      .withColumn("n_symbol_words",
        size(filter(toks, t => t.rlike("[#…]"))).cast("long"))
      .withColumn("n_stop_distinct",
        size(array_intersect(array_distinct(toks), stopArr)).cast("long"))
      .select(
        col("doc_id"), col("n_words"), col("word_chars"),
        col("n_alpha_words"), col("n_symbol_words"), col("n_stop_distinct"),
        (col("n_words") >= 50 && col("n_words") <= 100000).as("rule_word_count"),
        (lit(3L) * col("n_words") <= col("word_chars") &&
          col("word_chars") <= lit(10L) * col("n_words")).as("rule_mean_word_len"),
        (lit(10L) * col("n_symbol_words") <= col("n_words")).as("rule_symbol_ratio"),
        (lit(5L) * col("n_alpha_words") >= lit(4L) * col("n_words")).as("rule_alpha_words"),
        (col("n_stop_distinct") >= 2).as("rule_stopwords"))
      .withColumn("pass_gopher",
        col("rule_word_count") && col("rule_mean_word_len") &&
          col("rule_symbol_ratio") && col("rule_alpha_words") && col("rule_stopwords"))
  }

  /** source, n_docs, n_tokens, n_chars, mean_quality — the per-provenance
    * "data card" rollup a corpus release ships with (how much of what, at
    * what quality, from where). One keyed aggregation over the per-doc
    * quality frame; at 100 TB this is a map-side-combined single shuffle
    * on the (tiny) source key. */
  def corpusStats(docs: DataFrame): DataFrame =
    quality(docs)
      .join(docs.select("doc_id", "source"), "doc_id")
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"),
        sum("n_tokens").as("n_tokens"),
        sum("n_chars").as("n_chars"),
        Num.r6(avg("quality")).as("mean_quality"))

  /** PII/noise redaction (training-data scrubbing): digit runs → <NUM>.
    * Pattern kept dialect-neutral (Java regex ≡ RE2 here). */
  def redact(df: DataFrame, textCol: String): DataFrame =
    df.withColumn(s"${textCol}_redacted", regexp_replace(col(textCol), "[0-9]+", "<NUM>"))

  /** Accent-bearing probe appended by the text_normalize query so the
    * normalization faces real non-ASCII content on the ASCII corpus. */
  val NormProbe = " Caf\u00e9 na\u00efve \u00dcber se\u00f1or MIXED"

  /** doc_id, norm_text — Unicode NFC + lowercase + accent strip through the
    * codegen'd [[graft.functions.NormalizeText]] expression: the
    * normalization multilingual ingest runs before dedup/matching (so
    * Caf\u00e9/caf\u00e9/cafe collide). Oracle twin:
    * strip_accents(lower(nfc_normalize(x))) in DuckDB. */
  def normalizeText(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"),
      graft.functions.NormalizeText.normalizeText(
        concat(col("text"), lit(NormProbe))).as("norm_text"))

  /** doc_id, bucket, tf — hashing-trick term-frequency features (the
    * HashingTF featurization downstream classifiers consume): token →
    * Hash60 mod numFeatures, counted per document. Sparse triplets, not a
    * dense vector column — the representation that survives 100 TB (dense
    * 1024-wide arrays for every doc would 8× the corpus; triplets are
    * proportional to actual token mass and aggregate with one shuffle).
    * No vocabulary is built — the hash IS the feature id, which is the
    * point of the trick at scale. */
  def hashingTf(docs: DataFrame, numFeatures: Int = 1024): DataFrame =
    TextOps.tokens(docs)
      .select(col("doc_id"), pmod(graft.functions.Hash60.id(col("tok")), lit(numFeatures.toLong)).as("bucket"))
      .groupBy("doc_id", "bucket")
      .agg(count(lit(1)).as("tf"))

  /** qualityClassifier feature space / weight constants. The weights are a
    * fixed pseudo-random linear model derived from the bucket id by a
    * Knuth-style multiplicative hash — integer-exact in both engines, so
    * the classifier is a stand-in with the real model's exact plan shape
    * (swap the derived weight for a broadcast weight-table join when a
    * trained model ships). */
  val ClfBuckets = 256L
  val ClfWeightMod = 1000001L
  val ClfWeightScale = 500000L

  /** doc_id, n_feats, score_raw, score, keep — fastText-style linear quality
    * classifier over hashing-trick features (the CCNet/LLaMA wiki-reference
    * filter shape): unigram + bigram features → Hash60 mod [[ClfBuckets]],
    * each bucket carrying a deterministic integer weight in
    * [−[[ClfWeightScale]], [[ClfWeightScale]]]; score is the mean bucket
    * weight (rational arithmetic end to end — no exp/sigmoid, so engine and
    * oracle agree bit-for-bit; the sigmoid is monotone, so thresholding the
    * linear score IS thresholding the probability). Bigrams come from a
    * doc-partitioned `lead` (bounded by document length); scoring is one
    * map-side-combinable groupBy — a scan-shaped plan at 100 TB. */
  def qualityClassifier(docs: DataFrame): DataFrame = {
    // unigram and bigram features both explode row-locally from the split
    // array (TextOps.ngramArr): the old bigram side paid a lead()-window
    // Exchange + Sort of the token stream for order the array already
    // encodes (guide §2.4)
    val toksArr = docs.select(col("doc_id"), split(col("text"), " ").as("toks"))
    val bigrams = toksArr
      .select(col("doc_id"), explode(TextOps.ngramArr(col("toks"), 2)).as("feat"))
    val feats = toksArr.select(col("doc_id"), explode(col("toks")).as("feat"))
      .unionByName(bigrams)
    feats
      .select(col("doc_id"),
        pmod(graft.functions.Hash60.id(col("feat")), lit(ClfBuckets)).as("bucket"))
      .withColumn("wgt", pmod(col("bucket") * lit(2654435761L), lit(ClfWeightMod)) - lit(ClfWeightScale))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_feats"), sum("wgt").as("score_raw"))
      .select(col("doc_id"), col("n_feats"), col("score_raw"),
        Num.r6(col("score_raw").cast("double")
          / (col("n_feats") * lit(ClfWeightScale)).cast("double")).as("score"),
        (col("score_raw") > 0).as("keep"))
  }

  /** Corpus vocabulary statistics: token, n_occurrences, doc_freq. */
  def vocabStats(docs: DataFrame): DataFrame =
    TextOps.tokens(docs)
      .groupBy("tok")
      .agg(count(lit(1)).as("n_occurrences"), countDistinct("doc_id").as("doc_freq"))

  /** Vocabulary cutoffs swept by [[vocabCoverage]]. */
  val VocabCutoffs: Seq[Long] = Seq(10L, 100L, 1000L)

  /** cutoff, vocab_size, covered_tokens, total_tokens, coverage — the
    * vocabulary coverage curve: what fraction of the corpus token mass the
    * top-N most frequent types capture, per candidate vocabulary size (the
    * OOV-rate table a tokenizer/vocab decision is made from). Top-N is
    * ordered (count DESC, token ASC) so the cut is deterministic.
    *
    * Scale shape: the type-count table builds once (map-side-combined
    * groupBy — the only corpus-sized shuffle) and each cutoff's top-N is a
    * `TakeOrderedAndProject` (per-partition bounded heaps merged at the
    * driver-side limit) — never a global sort of the vocabulary; totals
    * fold in as a broadcast 1-row aggregate. */
  def vocabCoverage(docs: DataFrame, cutoffs: Seq[Long] = VocabCutoffs): DataFrame = {
    val counts = graft.infra.Caches.managed(TextOps.tokens(docs)
      .groupBy("tok").agg(count(lit(1)).as("cnt")))
    val total = counts.agg(sum("cnt").as("total_tokens"))
    cutoffs.map { n =>
      counts.orderBy(col("cnt").desc, col("tok")).limit(n.toInt)
        .agg(count(lit(1)).as("vocab_size"), sum("cnt").as("covered_tokens"))
        .crossJoin(broadcast(total))
        .select(lit(n).as("cutoff"), col("vocab_size"), col("covered_tokens"),
          col("total_tokens"),
          Num.r6(col("covered_tokens").cast("double") / col("total_tokens").cast("double"))
            .as("coverage"))
    }.reduce(_.unionByName(_))
  }

  /** source, n_words, n_bpe_tokens, fertility — tokenizer fertility per
    * provenance: BPE tokens emitted per whitespace word (the
    * tokenizer-evaluation number multilingual corpus reports publish —
    * high fertility means the learned merges serve that source badly).
    * One source-keyed aggregation over the per-doc encode counts. */
  def bpeFertility(docs: DataFrame, encoded: DataFrame): DataFrame =
    docs
      .select(col("doc_id"), col("source"),
        size(split(col("text"), " ")).cast("long").as("nw"))
      .join(encoded, "doc_id")
      .groupBy("source")
      .agg(sum("nw").as("n_words"), sum("n_bpe_tokens").as("n_bpe_tokens"))
      .select(col("source"), col("n_words"), col("n_bpe_tokens"),
        Num.r6(col("n_bpe_tokens").cast("double") / col("n_words").cast("double"))
          .as("fertility"))

  /** label, source, n_docs, n_tokens, share_of_source — the cross-modal
    * data card: classifier/cluster labels (the embedding table's label
    * column) crossed with document provenance, with each label's share of
    * its source (the topic-by-provenance composition table a corpus release
    * documents — skewed shares flag a source whose content the labeler
    * sees differently). One modality equi-join on the doc key + one
    * two-key aggregation; source totals re-aggregate from the (tiny)
    * matrix itself, not the corpus. */
  def labelSourceMatrix(docs: DataFrame, embeddings: DataFrame): DataFrame = {
    val m = docs
      .select(col("doc_id"), col("source"),
        size(split(col("text"), " ")).cast("long").as("nt"))
      .join(embeddings.select(col("vec_id").as("doc_id"),
        col("label").cast("long").as("label")), "doc_id")
      .groupBy("label", "source")
      .agg(count(lit(1)).as("n_docs"), sum("nt").as("n_tokens"))
    val st = m.groupBy("source").agg(sum("n_docs").as("tot"))
    m.join(broadcast(st), "source")
      .select(col("label"), col("source"), col("n_docs"), col("n_tokens"),
        Num.r6(col("n_docs").cast("double") / col("tot").cast("double"))
          .as("share_of_source"))
  }

  // per-sf-dir staging of the winsorization thresholds (the sketch-staging
  // discipline of events_quantile_buckets: both engines consume the SAME
  // staged thresholds, so the sketch's internals never enter the compare)
  private val winsorStaged = scala.collection.mutable.Map[String, String]()
  @volatile var lastWinsorStage: String =
    graft.infra.Staging.oracleStagePath("winsor", "/root/testdata/sf0.01")

  /** doc_id, source, quality, q_lo, q_hi, quality_winsorized, is_clipped —
    * robust per-source quality clipping (winsorization at the approximate
    * p05/p95): the outlier treatment a downstream quality-weighted sampler
    * applies so a handful of degenerate scores can't dominate a source's
    * weight mass. Thresholds come from `percentile_approx` — the sketch
    * path that survives 100 TB (exact order statistics need a global
    * selection) — staged once per corpus and broadcast; everything after
    * the stage is a per-row clamp. */
  def qualityWinsorize(docs: DataFrame, sfDir: String): DataFrame = {
    val spark = docs.sparkSession
    val scored = quality(docs).join(docs.select("doc_id", "source"), "doc_id")
    // a NON-self-deleting, canonical-path-keyed stage (Staging.tempDir dies
    // with the JVM; the driver's DuckDB compare runs after we exit)
    val path = graft.infra.Staging.oracleStagePath("winsor", sfDir)
    winsorStaged.synchronized {
      if (!winsorStaged.contains(path)) {
        scored.groupBy("source")
          .agg(percentile_approx(col("quality"), lit(0.05), lit(10000)).as("q_lo"),
            percentile_approx(col("quality"), lit(0.95), lit(10000)).as("q_hi"))
          .coalesce(1).write.mode("overwrite").parquet(path)
        winsorStaged(path) = path
      }
    }
    lastWinsorStage = path
    val th = spark.read.parquet(path)
    scored.join(broadcast(th), "source")
      .select(col("doc_id"), col("source"), col("quality"), col("q_lo"), col("q_hi"),
        greatest(col("q_lo"), least(col("q_hi"), col("quality"))).as("quality_winsorized"),
        (col("quality") < col("q_lo") || col("quality") > col("q_hi")).as("is_clipped"))
  }

  /** Oracle twin of [[qualityWinsorize]], rebuilt per dump (reads the
    * staged thresholds the engine just wrote). */
  def qualityWinsorizeOracleSql(qualityScoreSql: String): String =
    s"""WITH q AS (SELECT doc_id, quality FROM ($qualityScoreSql)),
       |s AS (SELECT d.doc_id, d.source, q.quality FROM documents d JOIN q USING (doc_id)),
       |th AS (SELECT source, q_lo, q_hi FROM read_parquet('$lastWinsorStage/*.parquet'))
       |SELECT s.doc_id, s.source, s.quality, th.q_lo, th.q_hi,
       |  greatest(th.q_lo, least(th.q_hi, s.quality)) AS quality_winsorized,
       |  (s.quality < th.q_lo OR s.quality > th.q_hi) AS is_clipped
       |FROM s JOIN th USING (source)""".stripMargin

  /** Count-Min geometry: depth (independent hash rows) × width (buckets). */
  val CmsDepth = 4
  val CmsWidth = 64L

  /** tok, exact_cnt, est_cnt — Count-Min heavy hitters: the classic
    * streaming frequency sketch (Cormode & Muthukrishnan 2005) beside the
    * repo's HLL and quantile sketches. The sketch is ONE map-side-combined
    * aggregation over a depth-× fanned token stream into depth·width
    * integer cells (256 here — broadcastable at any corpus size);
    * candidate heavy hitters come from the exact count table's bounded
    * TakeOrdered top-k, and each estimate is the min over its depth cells
    * — CMS guarantees est ≥ exact, and the gap IS the collision noise the
    * width knob buys down. Hash rows are salted [[graft.functions.Hash60]]
    * ids, so both engines address identical cells; everything is exact
    * integers. At 100 TB the exact table is the verification twin — the
    * sketch alone is the streaming-budget path. */
  def heavyHittersCms(docs: DataFrame, k: Int = 20): DataFrame = {
    // ONE corpus pass: the per-token exact counts. Each CMS cell's count is
    // the number of token OCCURRENCES hashing to it = Σ exact_cnt over the
    // tokens in the cell (exact integer regrouping), so the depth× sketch
    // fan-out explodes the vocabulary-sized count table, never the raw
    // token stream (guide §2.3 aggregate-before-shuffle) — and the managed
    // cache holds vocabulary rows instead of the full token column.
    val exact = graft.infra.Caches.managed(
      TextOps.tokens(docs).select("tok")
        .groupBy("tok").agg(count(lit(1)).as("exact_cnt")))
    def bucket(row: Int): org.apache.spark.sql.Column =
      pmod(graft.functions.Hash60.id(
        concat(lit(row.toString), lit("|"), col("tok"))), lit(CmsWidth))
    val sketch = exact
      .select(col("exact_cnt"),
        posexplode(array((0 until CmsDepth).map(bucket): _*)).as(Seq("r", "bucket")))
      .groupBy("r", "bucket").agg(sum("exact_cnt").as("c"))
    val cand = exact.orderBy(col("exact_cnt").desc, col("tok")).limit(k)
    cand
      .select(col("tok"), col("exact_cnt"),
        posexplode(array((0 until CmsDepth).map(bucket): _*)).as(Seq("r", "bucket")))
      .join(broadcast(sketch), Seq("r", "bucket"))
      .groupBy("tok", "exact_cnt")
      .agg(min("c").as("est_cnt"))
  }

  /** lm_source, doc_source, n_tokens, avg_logprob — the domain-similarity
    * matrix: each source's add-one-smoothed unigram LM scores every
    * source's token stream (DoReMi/DSIR-style mixture design reads exactly
    * this table — a source scored well by another's LM is in-domain for
    * it; the diagonal is each source's self-fit). Discount terms are
    * floored to integer micro-units BEFORE summation (log-prob sums over
    * corpus-scale groups must be order-independent — the repo's integer-sum
    * discipline), so per-cell sums are exact and the mean is one rounded
    * division. Cost shape: the per-source LM tables are vocabulary-sized;
    * because the micro-unit term depends only on (tok, lm_source), the
    * cross-scoring aggregates the token stream to per-(source, token)
    * COUNTS first and fans out that vocabulary-sized table by #sources
    * (n_tokens = Σm, sum_u = Σ m·term_u — exact integer regrouping), so
    * the per-LM fan-out join never carries the raw token stream (guide
    * §2.3 aggregate-before-shuffle; the corpus is read once). */
  def sourceLmMatrix(docs: DataFrame): DataFrame = {
    // one tokenize pass → per-(source, token) occurrence counts; read three
    // times below (the LM table, its totals, the scored fan-out)
    val occAgg = graft.infra.Caches.managed(
      TextOps.tokens(docs).select("doc_id", "tok")
        .join(docs.select("doc_id", "source"), "doc_id")
        .groupBy(col("source").as("doc_source"), col("tok"))
        .agg(count(lit(1)).as("m")))
    val c = occAgg.select(col("doc_source").as("lm_source"), col("tok"),
      col("m").as("cnt"))
    val t = c.groupBy("lm_source").agg(sum("cnt").as("tot"))
    val v = occAgg.select("tok").distinct().agg(count(lit(1)).as("vsz"))
    occAgg.crossJoin(broadcast(t))
      .join(c.select(col("lm_source").as("ls2"), col("tok").as("tk2"), col("cnt")),
        col("lm_source") === col("ls2") && col("tok") === col("tk2"), "left")
      .crossJoin(broadcast(v))
      .select(col("doc_source"), col("lm_source"), col("m"),
        floor(log((coalesce(col("cnt"), lit(0L)) + lit(1L)).cast("double") /
          (col("tot") + col("vsz")).cast("double")) * lit(1000000.0)).cast("long")
          .as("term_u"))
      .groupBy("doc_source", "lm_source")
      .agg(sum("m").as("n_tokens"), sum(col("m") * col("term_u")).as("sum_u"))
      .select(col("lm_source"), col("doc_source"), col("n_tokens"),
        Num.r6(col("sum_u").cast("double") / lit(1000000.0) / col("n_tokens").cast("double"))
          .as("avg_logprob"))
  }

  /** The pre-r17 per-occurrence formulation of [[sourceLmMatrix]] (the
    * fan-out join carried the raw token stream × #sources) — kept as the
    * parity reference: Round17OpsSpec pins the aggregated rewrite to these
    * exact rows. */
  private[graft] def sourceLmMatrixPerToken(docs: DataFrame): DataFrame = {
    val occ = TextOps.tokens(docs).select("doc_id", "tok")
      .join(docs.select("doc_id", "source"), "doc_id")
      .select(col("source").as("doc_source"), col("tok"))
    val c = occ.groupBy(col("doc_source").as("lm_source"), col("tok"))
      .agg(count(lit(1)).as("cnt"))
    val t = c.groupBy("lm_source").agg(sum("cnt").as("tot"))
    val v = occ.select("tok").distinct().agg(count(lit(1)).as("vsz"))
    occ.crossJoin(broadcast(t))
      .join(c.select(col("lm_source").as("ls2"), col("tok").as("tk2"), col("cnt")),
        col("lm_source") === col("ls2") && col("tok") === col("tk2"), "left")
      .crossJoin(broadcast(v))
      .select(col("doc_source"), col("lm_source"),
        floor(log((coalesce(col("cnt"), lit(0L)) + lit(1L)).cast("double") /
          (col("tot") + col("vsz")).cast("double")) * lit(1000000.0)).cast("long")
          .as("term_u"))
      .groupBy("doc_source", "lm_source")
      .agg(count(lit(1)).as("n_tokens"), sum("term_u").as("sum_u"))
      .select(col("lm_source"), col("doc_source"), col("n_tokens"),
        Num.r6(col("sum_u").cast("double") / lit(1000000.0) / col("n_tokens").cast("double"))
          .as("avg_logprob"))
  }

  /** doc_id, n_tokens, avg_logprob — corpus-self-trained unigram LM score,
    * the cheap perplexity proxy LLM-data pipelines use for quality ranking
    * (docs made of rare/garbled tokens score low). The LM is one
    * vocabulary-sized aggregate; the grand total folds in as a broadcast
    * 1-row aggregate (no driver action); the score join is equi on the
    * token — vocabulary ≪ corpus, so this shuffles the token stream once. */
  def unigramLogprob(docs: DataFrame): DataFrame = {
    // one tokenize pass: the stream feeds both the LM aggregation and the
    // score join (managed per-query cache, drained by the suite driver)
    val toks = graft.infra.Caches.managed(
      TextOps.tokens(docs).select("doc_id", "tok"))
    val counts = toks.groupBy("tok").agg(count(lit(1)).as("cnt"))
    val total = counts.agg(sum("cnt").as("total"))
    toks.join(counts, "tok")
      .crossJoin(broadcast(total))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_tokens"),
        Num.r6(avg(log(col("cnt").cast("double") / col("total").cast("double")))).as("avg_logprob"))
  }

  /** doc_id, n_bigrams, avg_logprob — interpolated bigram LM score, the
    * next perplexity-proxy rung above [[unigramLogprob]] (garbled text that
    * reuses common tokens in uncommon ORDER scores low here but fine on
    * unigrams). p = λ·P(w2|w1) + (1−λ)·P(w2), corpus-self-trained, so every
    * observed bigram has count ≥ 1 and no zero-prob guard is needed. The
    * conditional denominator re-aggregates the bigram counts (no second
    * corpus pass); both LM tables are vocabulary-sized equi-join sides and
    * the grand total folds in as a broadcast 1-row aggregate. λ enters the
    * plan as 1.0−λ computed IN-PLAN (not a pre-rounded literal), so both
    * engines evaluate the identical double. */
  def bigramLogprob(docs: DataFrame, lambda: Double = 0.7): DataFrame = {
    // ONE managed split-array table feeds both the unigram LM and the
    // bigram stream; bigram pairs derive row-locally from the array
    // (TextOps.bigramPairArr) — the old shape paid a lead()-window
    // Exchange + Sort of the cached token stream (guide §2.4)
    val toksArr = graft.infra.Caches.managed(
      docs.select(col("doc_id"), split(col("text"), " ").as("toks")))
    val toks = toksArr.select(col("doc_id"), explode(col("toks")).as("tok"))
    val bg = graft.infra.Caches.managed(toksArr
      .select(col("doc_id"), explode(TextOps.bigramPairArr(col("toks"))).as("p"))
      .select(col("doc_id"), col("p.w1").as("w1"), col("p.w2").as("w2")))
    val bgCounts = bg.groupBy("w1", "w2").agg(count(lit(1)).as("bcnt"))
    val leftCounts = bgCounts.groupBy("w1").agg(sum("bcnt").as("lcnt"))
    val uniCounts = toks.groupBy("tok").agg(count(lit(1)).as("ucnt"))
    val uniTotal = uniCounts.agg(sum("ucnt").as("utotal"))
    bg.join(bgCounts, Seq("w1", "w2"))
      .join(leftCounts, Seq("w1"))
      .join(uniCounts.select(col("tok").as("w2"), col("ucnt")), Seq("w2"))
      .crossJoin(broadcast(uniTotal))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_bigrams"),
        Num.r6(avg(log(
          lit(lambda) * col("bcnt").cast("double") / col("lcnt").cast("double")
            + (lit(1.0) - lit(lambda)) * col("ucnt").cast("double") / col("utotal").cast("double"))))
          .as("avg_logprob"))
  }

  /** doc_id, n_tokens, avg_llr — DSIR-style importance weights (Xie et al.
    * 2023, arXiv:2302.03169 "Data Selection for Language Models via
    * Importance Resampling"): each document scored by the mean
    * log-likelihood ratio of a target-domain unigram LM over the corpus LM,
    * add-one smoothed against the shared vocabulary. The two LMs are
    * vocabulary-sized aggregates; the grand totals fold in as a broadcast
    * 1-row aggregate, the per-token lookup is one equi-join on the token —
    * the same single-token-stream-shuffle shape as unigramLogprob.
    * `targetSources` defines the target domain (a source allowlist). */
  def dsirWeights(docs: DataFrame, targetSources: Seq[String] = Seq("src0", "src1", "src2", "src3", "src4")): DataFrame = {
    // one pass over the token stream builds both LMs: every token counts in
    // base, target counts come from the target-membership flag
    val isTarget = col("source").isin(targetSources: _*)
    val stream = TextOps.tokens(docs).join(
      docs.select(col("doc_id"), isTarget.as("in_target")), "doc_id")
    val lm = stream.groupBy("tok")
      .agg(count(lit(1)).as("cb"),
        sum(when(col("in_target"), 1L).otherwise(0L)).as("ct"))
    val totals = lm.agg(sum("cb").as("nb"), sum("ct").as("nt"),
      count(lit(1)).as("v"))
    stream
      .join(lm, "tok")
      .crossJoin(broadcast(totals))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_tokens"),
        Num.r6(avg(
          log((col("ct") + 1).cast("double") / (col("nt") + col("v")).cast("double")) -
            log((col("cb") + 1).cast("double") / (col("nb") + col("v")).cast("double")))).as("avg_llr"))
  }

  /** doc_id, quality, threshold — percentile quality cut: keep documents at
    * or above the corpus `pct` quality percentile. The threshold is an
    * exact interpolated percentile computed IN-PLAN as a 1-row aggregate and
    * broadcast into the filter — no driver action, no global sort of the
    * corpus (at 100 TB swap the 1-row aggregate for percentile_approx: same
    * plan, mergeable sketch). */
  def qualityCut(docs: DataFrame, pct: Double = 0.75): DataFrame = {
    val q = quality(docs).select(col("doc_id"), col("quality"))
    val thr = q.agg(Num.r6(expr(s"percentile(quality, $pct)")).as("threshold"))
    q.join(broadcast(thr))
      .where(col("quality") >= col("threshold"))
      .select("doc_id", "quality", "threshold")
  }

  /** Top-k bigram counts (language-model n-gram table shape). */
  def ngramCounts(docs: DataFrame, k: Int = 20): DataFrame =
    // row-local bigrams (TextOps.ngramArr): scan → explode → one partial-
    // aggregated groupBy; no lead()-window Exchange + Sort (guide §2.4)
    docs.select(col("doc_id"), split(col("text"), " ").as("toks"))
      .select(explode(TextOps.ngramArr(col("toks"), 2)).as("bigram"))
      .groupBy("bigram").agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("bigram"))
      .limit(k)

  /** Quality-ranked per-source capping — the domain-balancing step of a
    * corpus mix: no source may contribute more than `cap` documents, and
    * when one is over budget its BEST documents survive (stratifiedSample
    * draws uniformly; this ranks). Partition-local window per source with
    * a rounded-quality / low-doc_id tie-break, so the cut is deterministic
    * cross-engine; at 100 TB a skewed mega-source is exactly the window's
    * partition and never a global sort. Output keeps every doc with its
    * rank and keep flag, so the drop set is auditable. */
  val ShardCount = 32

  /** shard_id, n_docs, n_tokens, n_bytes, avg_quality_u, curriculum_rank —
    * the training-dataloader SHARD MANIFEST: every document lands in a
    * deterministic shard (multiplicative hash of doc_id — stable across
    * runs and engines, never rand()), the manifest aggregates each shard's
    * volume, and curriculum_rank orders shards by mean quality
    * (quality-descending curriculum: clean shards first). Quality averages
    * in integer micro-units with integer division — bit-exact across
    * engines regardless of summation order. The rank comes from a bounded
    * theta-join over the numShards-row manifest (numShards² ≤ ~1k pairs),
    * NOT a global-sort window — the manifest is tiny but the fleet-wide
    * no-global-window invariant (PlanAuditSpec) stays unconditional. */
  def shardManifest(docs: DataFrame, numShards: Int = ShardCount): DataFrame = {
    val q = quality(docs).select(col("doc_id"),
      floor(col("quality") * lit(1000000.0) + lit(0.5)).cast("long").as("quality_u"))
    val m = docs
      .select(col("doc_id"), col("n_chars"),
        size(split(col("text"), " ")).cast("long").as("n_toks"))
      .join(q, "doc_id")
      .withColumn("shard_id", Num.mulMod(col("doc_id"), 2654435761L, numShards.toLong))
      .groupBy("shard_id")
      .agg(count(lit(1)).as("n_docs"), sum("n_toks").as("n_tokens"),
        sum("n_chars").as("n_bytes"), sum("quality_u").as("sum_q_u"))
      .withColumn("avg_quality_u", expr("sum_q_u div n_docs"))
      .drop("sum_q_u")
    val peers = m.select(col("shard_id").as("sid2"), col("avg_quality_u").as("q2"))
    m.join(peers,
        col("q2") > col("avg_quality_u") ||
          (col("q2") === col("avg_quality_u") && col("sid2") < col("shard_id")), "left")
      .groupBy("shard_id", "n_docs", "n_tokens", "n_bytes", "avg_quality_u")
      .agg((count(col("sid2")) + 1).as("curriculum_rank"))
  }

  def sourceCaps(docs: DataFrame, cap: Int = 100): DataFrame = {
    val win = org.apache.spark.sql.expressions.Window.partitionBy("source")
      .orderBy(col("quality").desc, col("doc_id"))
    quality(docs).select(col("doc_id"), col("quality"))
      .join(docs.select("doc_id", "source"), "doc_id")
      .withColumn("source_rank", row_number().over(win).cast("long"))
      .select(col("doc_id"), col("source"), col("quality"), col("source_rank"),
        (col("source_rank") <= cap).as("keep"))
  }

  /** Sequence-length distribution — the data-card histogram of document
    * sizes in approximate BPE tokens, bucketed by power of two. The bucket
    * is the integer bit length minus one (≡ floor(log2) for n ≥ 1) — pure
    * integer string ops, because floor(log2(x)) through floating point
    * returns bucket−1 at exact powers of two in engines that compute it as
    * a log ratio. One map-side-combined aggregation on a ≤64-value key. */
  def lengthHistogram(docs: DataFrame): DataFrame =
    docs
      .select(ceil(col("n_chars") / lit(4.0)).cast("long").as("approx_bpe_tokens"))
      .select((length(bin(col("approx_bpe_tokens"))) - 1).cast("long").as("len_bucket"),
        col("approx_bpe_tokens"))
      .groupBy("len_bucket")
      .agg(count(lit(1)).as("n_docs"),
        sum(col("approx_bpe_tokens")).as("n_tokens"),
        Num.r6(sum(col("approx_bpe_tokens")).cast("double") / count(lit(1)).cast("double")).as("mean_tokens"))

  /** Multi-dimensional data-card rollup in ONE pass: `CUBE(source, lang)`
    * computes the (source, lang), (source), (lang) and grand-total
    * aggregates inside a single grouping-sets aggregation — one shuffle,
    * versus four separate groupBys each rescanning the corpus. `grp`
    * encodes which dimensions are rolled up (grouping(source)*2 +
    * grouping(lang)); rolled-up keys display as 'ALL' (the synthetic
    * corpus has no null source/lang to collide with). */
  def corpusCube(docs: DataFrame): DataFrame =
    docs.cube(col("source"), col("lang"))
      .agg((grouping(col("source")) * 2 + grouping(col("lang"))).cast("long").as("grp"),
        count(lit(1)).as("n_docs"), sum("n_chars").as("n_chars"))
      .select(coalesce(col("source"), lit("ALL")).as("source"),
        coalesce(col("lang"), lit("ALL")).as("lang"),
        col("grp"), col("n_docs"), col("n_chars"))

  /** Generic one-pass table profile — the ANALYZE-style data card a
    * pipeline publishes per table: per column, null count, exact distinct
    * count, and min/max (stringified after the typed compare, so numeric
    * columns keep numeric order). All aggregates fold into a single
    * logical aggregation (Spark plans the multi-distinct via Expand — the
    * standard exact-distinct cost; swap count_distinct for
    * approx_count_distinct at 100 TB when exactness isn't contractual),
    * then `stack` unpivots the 1-row result — driver-free end to end. */
  def tableProfile(df: DataFrame, cols: Seq[String]): DataFrame = {
    val aggs = cols.flatMap { c =>
      Seq(
        sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"${c}__nulls"),
        count_distinct(col(c)).as(s"${c}__distinct"),
        min(col(c)).cast("string").as(s"${c}__min"),
        max(col(c)).cast("string").as(s"${c}__max"))
    }
    val one = df.agg(count(lit(1)).as("n_rows"), aggs: _*)
    val stackArgs = cols.map(c =>
      s"'$c', ${c}__nulls, ${c}__distinct, ${c}__min, ${c}__max").mkString(", ")
    one.select(col("n_rows"),
      expr(s"stack(${cols.length}, $stackArgs) AS (column_name, n_nulls, n_distinct, min_s, max_s)"))
      .select(col("column_name"), col("n_rows"), col("n_nulls"), col("n_distinct"),
        col("min_s"), col("max_s"))
  }

  /** Deterministic reproducible sampling: keep docs whose multiplicative
    * hash falls in the lowest `permille` buckets — stable across runs and
    * engines (pure integer math), the sampling discipline a training-data
    * pipeline needs for audits. */
  def sampleDocs(docs: DataFrame, permille: Int = 100): DataFrame =
    docs.where(Num.mulMod(col("doc_id"), 2654435761L, 1000L) < permille)
      .select(col("doc_id"), col("lang"), col("source"))

  /** Stratified reproducible sampling: exactly `k` documents per stratum
    * (source), chosen by the multiplicative-hash permutation — the
    * per-domain eval-holdout / ablation-subset draw. Partition-local
    * row_number per stratum; no global sort. At 100 TB with huge k the
    * per-stratum window becomes the two-level pattern used by corpusMix. */
  def stratifiedSample(docs: DataFrame, k: Int = 5): DataFrame = {
    val win = org.apache.spark.sql.expressions.Window.partitionBy("source")
      .orderBy(Num.mulMod(col("doc_id"), 2654435761L, 1000000L), col("doc_id"))
    docs.select(col("doc_id"), col("source"))
      .withColumn("draw_rank", row_number().over(win).cast("long"))
      .where(col("draw_rank") <= k)
  }

  /** source, n_docs, n_tokens, p_raw, p_temp, boost — temperature /
    * alpha-sampling mixture weights (the multilingual-corpus recipe of
    * XLM-R / mC4: sample source i with probability ∝ p_i^alpha, which
    * up-weights small sources and flattens the head; training-data
    * extension, no reference counterpart). p_raw is each source's token
    * share; p_temp its renormalized alpha-damped share; boost =
    * p_temp/p_raw is the up/down-sampling multiplier a sampler applies per
    * source. One groupBy on source (key space = source cardinality,
    * dimension-sized) plus two broadcast 1-row totals — no window, no
    * driver action. All compared floats are display-rounded (6dp) BEFORE
    * reuse per the suite's cross-engine convention, so the pow/divide
    * chain is reproducible in DuckDB. */
  def sourceTemperature(docs: DataFrame, alpha: Double = 0.3): DataFrame = {
    val per = docs
      .select(col("source"), size(split(col("text"), " ")).cast("long").as("nt"))
      .groupBy("source").agg(count(lit(1)).as("n_docs"), sum("nt").as("n_tokens"))
    val tot = per.agg(sum("n_tokens").as("tot_tokens"))
    val raw = per.join(broadcast(tot))
      .withColumn("p_raw", Num.r6(col("n_tokens").cast("double") / col("tot_tokens")))
      .withColumn("w", Num.r6(pow(col("p_raw"), lit(alpha))))
    val wtot = raw.agg(sum("w").as("w_tot"))
    raw.join(broadcast(wtot))
      .withColumn("p_temp", Num.r6(col("w") / col("w_tot")))
      .withColumn("boost", Num.r6(col("p_temp") / col("p_raw")))
      .select("source", "n_docs", "n_tokens", "p_raw", "p_temp", "boost")
  }

  /** source, n_tokens, w_u, target_tokens, epochs — the epoch plan a
    * temperature-weighted mixture implies under a fixed token budget: each
    * source's micro-unit mixture weight (the [[sourceTemperature]]
    * p_temp^(α) chain, floored to a BIGINT at 10⁻⁶) sizes its target token
    * draw, and epochs = ⌈target / available⌉ says how many passes over the
    * source that draw costs (the multi-epoch repetition small high-weight
    * sources pay in real mixtures — LLaMA/DoReMi-style recipes publish
    * exactly this table). Division and ceiling run in exact integers; the
    * only floats are the rounded weight chain shared with
    * source_temperature. Source-keyed aggregation: one map-side-combined
    * shuffle on the tiny source dimension, broadcast 1-row totals. */
  def epochPlan(docs: DataFrame, budget: Long = 50000L, alpha: Double = 0.3): DataFrame = {
    val per = docs
      .select(col("source"), size(split(col("text"), " ")).cast("long").as("nt"))
      .groupBy("source").agg(sum("nt").as("n_tokens"))
    val tot = per.agg(sum("n_tokens").as("tot_tokens"))
    val raw = per.join(broadcast(tot))
      .withColumn("p_raw", Num.r6(col("n_tokens").cast("double") / col("tot_tokens")))
      .withColumn("w", Num.r6(pow(col("p_raw"), lit(alpha))))
    val wtot = raw.agg(sum("w").as("w_tot"))
    raw.join(broadcast(wtot))
      .withColumn("w_u", floor(col("w") / col("w_tot") * lit(1000000.0) + lit(0.5)).cast("long"))
      .withColumn("target_tokens", expr(s"(CAST($budget AS BIGINT) * w_u) div 1000000"))
      .withColumn("epochs", expr("(target_tokens + n_tokens - 1) div n_tokens"))
      .select("source", "n_tokens", "w_u", "target_tokens", "epochs")
  }

  /** Token-budget corpus mixing: pick documents per source so the mixed
    * corpus hits a target token budget at prescribed source proportions —
    * the "data mixture" step of a training-data pipeline (e.g. the
    * domain-weighted sampling of The Pile / DoReMi-style recipes, made
    * deterministic). Weight per source is derived in-plan (1 + src-number
    * mod 4, normalized by the corpus-wide weight total via a broadcast
    * 1-row aggregate — no driver action); docs are ordered by the same
    * multiplicative-hash permutation as sampleDocs and taken while the
    * source's running token count stays within its share of `budget`.
    * Output: doc_id, source, n_tokens, cum_tokens.
    *
    * The running sum is computed TWO-LEVEL so no window ever partitions by
    * source alone (a handful of sources would collapse 100 TB onto a few
    * tasks): per-(source, hash-bucket) token subtotals, a tiny
    * sources×buckets offset table (windowed where it's cheap, broadcast
    * back), then within-bucket running sums on (source, bucket) partitions.
    * Because the bucket is a prefix of the permutation key, bucket-major
    * order ≡ the flat permutation order and cum_tokens is bit-identical to
    * the single-window formulation the oracle states. */
  def corpusMix(docs: DataFrame, budget: Long = 20000L, buckets: Int = 100): DataFrame = {
    val perm = Num.mulMod(col("doc_id"), 2654435761L, 1000000L)
    val weighted = docs
      .select(col("doc_id"), col("source"),
        size(split(col("text"), " ")).cast("long").as("n_tokens"),
        (lit(1L) + pmod(regexp_extract(col("source"), "(\\d+)", 1).cast("long"), lit(4L))).as("w"))
      .withColumn("perm", perm)
      .withColumn("bucket", expr(s"perm div ${1000000L / buckets}"))
    val totalW = weighted.groupBy("source").agg(first("w").as("sw"))
      .agg(sum("sw").as("w_total"))
    // level 1: per-bucket subtotals; the offset window runs over ≤
    // sources×buckets rows, so its single-partition-per-source width is moot
    val offsetWin = org.apache.spark.sql.expressions.Window.partitionBy("source").orderBy("bucket")
    val offsets = weighted.groupBy("source", "bucket").agg(sum("n_tokens").as("bt"))
      .withColumn("bucket_offset", sum("bt").over(offsetWin) - col("bt"))
      .select("source", "bucket", "bucket_offset")
    // level 2: running sum within (source, bucket) — the wide, parallel part
    val innerWin = org.apache.spark.sql.expressions.Window.partitionBy("source", "bucket")
      .orderBy(col("perm"), col("doc_id"))
    weighted
      .join(broadcast(offsets), Seq("source", "bucket"))
      .join(broadcast(totalW))
      .withColumn("share", expr(s"($budget * w) div w_total"))
      .withColumn("cum_tokens", col("bucket_offset") + sum("n_tokens").over(innerWin))
      .where(col("cum_tokens") <= col("share"))
      .select("doc_id", "source", "n_tokens", "cum_tokens")
  }

  /** doc_id, source, byte_len, batch_id — size-quantized decode-batch
    * planning over multimodal payloads (the batch layout a GPU decode /
    * feature-extraction stage consumes: batches of ~batchBytes of payload,
    * planned per source/modality group). Payloads are laid out in the
    * seeded permutation order; batch_id = payload's start offset div
    * batchBytes — the same parallel-friendly quantized packing contract as
    * [[tokenPacking]]. The per-source running offset is computed TWO-LEVEL
    * exactly like [[corpusMix]] (per-(source,bucket) subtotals + broadcast
    * offset table + within-bucket windows), never one source-wide window —
    * bit-identical to the flat window the oracle states. */
  def multimodalBatches(docs: DataFrame, batchBytes: Long = 4096L, buckets: Int = 100): DataFrame = {
    val perm = Num.mulMod(col("doc_id"), 2654435761L, 1000000L)
    val sized = docs
      .select(col("doc_id"), col("source"),
        length(col("text").cast("binary")).cast("long").as("byte_len"))
      .withColumn("perm", perm)
      .withColumn("bucket", expr(s"perm div ${1000000L / buckets}"))
    val offsetWin = org.apache.spark.sql.expressions.Window.partitionBy("source").orderBy("bucket")
    val offsets = sized.groupBy("source", "bucket").agg(sum("byte_len").as("bb"))
      .withColumn("bucket_offset", sum("bb").over(offsetWin) - col("bb"))
      .select("source", "bucket", "bucket_offset")
    val innerWin = org.apache.spark.sql.expressions.Window.partitionBy("source", "bucket")
      .orderBy(col("perm"), col("doc_id"))
    sized
      .join(broadcast(offsets), Seq("source", "bucket"))
      .withColumn("cum_bytes", col("bucket_offset") + sum("byte_len").over(innerWin))
      .withColumn("batch_id", expr(s"(cum_bytes - byte_len) div $batchBytes"))
      .select("doc_id", "source", "byte_len", "batch_id")
  }

  /** Sequence packing (token-budget chunking): assign each sentence window
    * to a pack so every pack holds ~`budget` tokens of consecutive text.
    * doc_id, sent_id, n_tokens, pack_id. */
  def tokenPacking(docs: DataFrame, budget: Int = 64): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window.partitionBy("doc_id").orderBy("sent_id")
    TextOps.sentences(docs)
      .select(col("doc_id"), col("sent_id"), col("n_tokens"))
      .withColumn("cum", sum("n_tokens").over(w))
      .withColumn("pack_id", expr(s"(cum - n_tokens) div $budget"))
      .drop("cum")
  }

  /** doc_id, n_packs, n_tokens, fill_rate — packing-efficiency report over
    * [[tokenPacking]]'s bins (the data card a packed-pretraining run
    * publishes: fill rate is the fraction of the context budget carrying
    * real tokens — the rest is padding the loss masks away). One per-doc
    * aggregation over the packing table; fill = tokens / (bins × budget),
    * rounded 6dp with identical op order in both engines. Because the
    * packer is start-offset-quantized (a sentence starting inside the
    * budget stays whole in its pack), a pack may overrun by up to one
    * sentence window − 1 tokens, so fill_rate can slightly exceed 1 —
    * bounded by 1 + (SentWindow−1)/budget; Round9OpsSpec pins the bound. */
  def packEfficiency(docs: DataFrame, budget: Int = 64): DataFrame =
    tokenPacking(docs, budget)
      .groupBy("doc_id")
      .agg(countDistinct("pack_id").as("n_packs"),
        sum("n_tokens").cast("long").as("n_tokens"))
      .select(col("doc_id"), col("n_packs"), col("n_tokens"),
        Num.r6(col("n_tokens").cast("double") /
          (col("n_packs") * budget).cast("double")).as("fill_rate"))

  /** source, n_tokens, kl — per-source KL divergence from the corpus
    * unigram distribution (the domain-shift number a DoReMi/DSIR-style
    * mixture designer reads next to [[sourceLmMatrix]]'s cross-LM
    * scores: KL(source ‖ corpus) says how far a source's token
    * distribution sits from the mix it will be blended into).
    *
    * Scale shape: the corpus collapses to the (source, token) count
    * matrix ONCE (vocabulary × #sources rows — map-side-combinable);
    * corpus marginals re-aggregate from that matrix, never the corpus;
    * the per-term join is vocabulary-sized with both marginal tables
    * broadcast. Each p·ln(p/q) term is floored to integer micro-units
    * BEFORE summation (float sums are order-sensitive; long sums
    * commute), so the per-source sum is exact. */
  def sourceKl(docs: DataFrame): DataFrame = {
    val occ = TextOps.tokens(docs).select("doc_id", "tok")
      .join(docs.select("doc_id", "source"), "doc_id")
    val st = occ.groupBy("source", "tok").agg(count(lit(1)).as("cnt"))
    val sTot = st.groupBy("source").agg(sum("cnt").as("s_tot"))
    val ct = st.groupBy("tok").agg(sum("cnt").as("c_cnt"))
    val cTot = ct.agg(sum("c_cnt").as("c_tot"))
    val p = col("cnt").cast("double") / col("s_tot").cast("double")
    val q = col("c_cnt").cast("double") / col("c_tot").cast("double")
    st.join(broadcast(sTot), "source")
      .join(broadcast(ct), "tok")
      .crossJoin(broadcast(cTot))
      .withColumn("term_micro",
        floor(p * log(p / q) * lit(1000000.0) + lit(0.5)).cast("long"))
      .groupBy("source")
      .agg(max("s_tot").cast("long").as("n_tokens"), sum("term_micro").as("kl_micro"))
      .select(col("source"), col("n_tokens"),
        Num.r6(col("kl_micro").cast("double") / lit(1000000.0)).as("kl"))
  }

  /** Repetition statistics (the Gopher/RefinedWeb-style quality signals):
    * duplicate-token and duplicate-trigram ratios per document. */
  def repetitionStats(docs: DataFrame): DataFrame =
    // fully row-local: every statistic is a function of the doc's own
    // token array (counts and distinct counts via size/array_distinct), so
    // the plan is scan → project — the old form paid a lead()-window
    // Exchange + Sort PLUS a per-doc aggregation exchange for arithmetic
    // each row already holds (guide §2.4). Identical values: count(*) over
    // the exploded stream = size(toks); countDistinct = size(array_distinct);
    // trigram rows with t3 IS NOT NULL = the ngramArr(3) elements.
    // The <3-token guard is expressed on the SOURCE column (split size),
    // never on the derived trigram array: filter pushdown substitutes a
    // derived column's defining expression into the predicate (guide §4.4's
    // duplication mechanism — it applies to any expensive expression, not
    // just UDFs), re-running the whole ngram transform once per reference —
    // measured 6× on this query. Each expensive array is likewise aliased
    // in its own projection and referenced once per derived value.
    docs.where(size(split(col("text"), " ")) >= 3) // pushdown-safe source-column guard
      .select(col("doc_id"), split(col("text"), " ").as("toks"))
      .select(col("doc_id"), col("toks"), TextOps.ngramArr(col("toks"), 3).as("tris"))
      .select(col("doc_id"),
        size(col("toks")).cast("long").as("n_tokens"),
        size(array_distinct(col("toks"))).cast("long").as("ndt"),
        size(col("tris")).cast("long").as("n_trigrams"),
        size(array_distinct(col("tris"))).cast("long").as("ndtr"))
      .select(col("doc_id"), col("n_tokens"), col("n_trigrams"),
        Num.r6(lit(1.0) - col("ndt").cast("double") / col("n_tokens").cast("double"))
          .as("dup_token_ratio"),
        Num.r6(lit(1.0) - col("ndtr").cast("double") / col("n_trigrams").cast("double"))
          .as("dup_trigram_ratio"))

  /** Rule-based quality filter (Gopher-rule shape): keep/drop decision plus
    * the firing reasons, so filtering is auditable. */
  /** doc_id, compression_ratio, is_repetitive, is_noise — the deflate
    * compression-ratio quality signal (Gopher/RefinedWeb lineage): text that
    * compresses too WELL is templated/repetitive, text that barely
    * compresses is noise; both tails are dropped from training corpora.
    * The ratio comes from a codegen'd expression over zlib level 6
    * (deterministic output size); no DuckDB twin exists, so the driver
    * check is rows-only and numeric behavior is spec-pinned. */
  val CompressionRepetitiveBelow = 0.25
  val CompressionNoiseAbove = 0.95

  def compressionQuality(docs: DataFrame,
                         repetitiveBelow: Double = CompressionRepetitiveBelow,
                         noiseAbove: Double = CompressionNoiseAbove): DataFrame =
    docs.select(col("doc_id"),
        graft.functions.CompressionRatio.compressionRatio(col("text")).as("compression_ratio"))
      .withColumn("is_repetitive", col("compression_ratio") < repetitiveBelow)
      .withColumn("is_noise", col("compression_ratio") > noiseAbove)

  // DuckDB has no deflate, so the ratio NUMBER can never be oracle-checked;
  // the GATE DERIVATION can. The engine-computed ratios are staged once per
  // (process, sf dir) to a fixed overwrite-per-run path, and both the Spark
  // query and the DuckDB oracle derive the both-tails flags from that same
  // staged parquet — the oracle then genuinely verifies the flag logic while
  // the zlib number itself stays spec-pinned (CompressionRatioSpec).
  // Deliberately NOT a Staging.tempDir: the driver's DuckDB compare runs
  // after this JVM exits, and the fixed path keeps /tmp growth bounded.
  private val compressionStaged = scala.collection.concurrent.TrieMap[String, Unit]()
  @volatile private var lastCompressionStage: String =
    compressionStagePath("/root/testdata/sf0.01")

  def compressionStagePath(sfDir: String): String =
    graft.infra.Staging.oracleStagePath("compression_ratio", sfDir)

  def compressionQualityStaged(docs: DataFrame, sfDir: String): DataFrame = {
    val path = compressionStagePath(sfDir)
    compressionStaged.synchronized {
      if (!compressionStaged.contains(path)) {
        docs.select(col("doc_id"),
            graft.functions.CompressionRatio.compressionRatio(col("text")).as("compression_ratio"))
          .coalesce(1).write.mode("overwrite").parquet(path)
        compressionStaged.put(path, ())
      }
    }
    lastCompressionStage = path
    docs.sparkSession.read.parquet(path)
      .withColumn("is_repetitive", col("compression_ratio") < CompressionRepetitiveBelow)
      .withColumn("is_noise", col("compression_ratio") > CompressionNoiseAbove)
  }

  /** Oracle twin of [[compressionQualityStaged]] over the same staged
    * ratios (rebuilt per dump — Verify runs queries before dumping SQL, so
    * the path always points at the sf dir the driver verified). */
  def compressionOracleSql: String =
    s"""SELECT doc_id, compression_ratio,
       |  compression_ratio < $CompressionRepetitiveBelow AS is_repetitive,
       |  compression_ratio > $CompressionNoiseAbove AS is_noise
       |FROM read_parquet('$lastCompressionStage/*.parquet')""".stripMargin

  def qualityFilter(docs: DataFrame,
                    minTokens: Long = 20, maxDupTrigram: Double = 0.55,
                    maxStopRatio: Double = 0.12): DataFrame = {
    qualityFilterFrom(repetitionStats(docs), quality(docs).select("doc_id", "stop_ratio"),
      minTokens, maxDupTrigram, maxStopRatio)
  }

  /** [[qualityFilter]] over a prebuilt repetition-stats table — callers that
    * FILTER on `keep` (training_pipeline's gate join) pass a managed cache
    * of [[repetitionStats]] here, because the filter pushdown would
    * otherwise substitute keep → too_repetitive → dup_trigram_ratio → the
    * whole row-local trigram transform into the pushed predicate and re-run
    * it once per reference (guide §4.4's duplication mechanism; the pre-r17
    * Window form was an accidental pushdown barrier — measured 6× on
    * training_pipeline). */
  def qualityFilterFrom(rep: DataFrame, q: DataFrame,
                        minTokens: Long = 20, maxDupTrigram: Double = 0.55,
                        maxStopRatio: Double = 0.12): DataFrame =
    rep.join(q, "doc_id")
      .withColumn("too_short", col("n_tokens") < minTokens)
      .withColumn("too_repetitive", col("dup_trigram_ratio") > maxDupTrigram)
      .withColumn("too_stoppy", col("stop_ratio") > maxStopRatio)
      .select(col("doc_id"), col("too_short"), col("too_repetitive"), col("too_stoppy"),
        (!col("too_short") && !col("too_repetitive") && !col("too_stoppy")).as("keep"))

  /** Training-data decontamination: flag documents whose bigrams overlap an
    * eval set's bigrams (the standard n-gram–overlap contamination check).
    * The eval side is tiny → broadcast; the corpus is scanned once. */
  def decontaminate(docs: DataFrame, evalTexts: DataFrame,
                    evalIdCol: String, evalTextCol: String): DataFrame = {
    val (docBg, evalBg) = bigramSides(docs, evalTexts, evalIdCol, evalTextCol)
    decontaminateFromBigrams(docBg, evalBg)
  }

  /** [[decontaminate]] from pre-derived bigram sides — the shape a caller
    * holding a STAGED eval-bigram artifact uses (the eval suite is a
    * versioned file; only the corpus side is scanned per run). */
  def decontaminateFromBigrams(docBg: DataFrame, evalBg: DataFrame): DataFrame =
    docBg.join(broadcast(evalBg), "bigram")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_overlapping_bigrams"))

  /** Same result as decontaminate, with the corpus side prefiltered through
    * an in-plan Bloom filter of the eval bigrams (`bloom_filter_agg` →
    * `might_contain`). At 100 TB the Bloom bits are what actually gets
    * broadcast to every task, and only might-contain candidates reach the
    * exact confirm join — which removes the false positives, so the output
    * is byte-identical to the exact path (same oracle).
    *
    * `expectedEvalNgrams` sizes the Bloom bits. Pass it when the eval-set
    * cardinality is known (the usual production case — eval suites are
    * versioned artifacts); when 0 it is DERIVED from a count of the distinct
    * eval bigrams — one extra tiny job over the side that gets broadcast
    * anyway, with 1.25× headroom so late growth degrades the false-positive
    * rate, never correctness (the confirm join removes all FPs).
    *
    * Crossover: the prefilter costs one Bloom build/broadcast and pays by
    * keeping corpus bigrams that can't match away from the probe side of
    * the confirm join. At sf0.1 (~1M corpus bigrams, ~2k eval bigrams) it
    * is roughly break-even with the exact path; the win grows linearly
    * with corpus size, which is why the 100 TB path wants it. */
  def decontaminateBloom(docs: DataFrame, evalTexts: DataFrame,
                         evalIdCol: String, evalTextCol: String,
                         expectedEvalNgrams: Long = 0L,
                         ndvMemoKey: String = null): DataFrame = {
    val (docBg, evalBg) = bigramSides(docs, evalTexts, evalIdCol, evalTextCol)
    decontaminateBloomFromBigrams(docBg, evalBg, expectedEvalNgrams, ndvMemoKey)
  }

  /** [[decontaminateBloom]] from pre-derived bigram sides (staged eval
    * artifact). The NDV count over a staged evalBg is a parquet metadata
    * read, so the memo mostly matters for the un-staged delegate above. */
  def decontaminateBloomFromBigrams(docBg: DataFrame, evalBg: DataFrame,
                                    expectedEvalNgrams: Long = 0L,
                                    ndvMemoKey: String = null): DataFrame = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    // the derived-NDV count is one tiny job over the broadcast-bound side,
    // but it re-derives the whole eval sentence chain on EVERY invocation
    // (r9 bench flag: decontaminate_bloom 1.10 -> 2.20 s was exactly this
    // extra job). NDV only sizes the Bloom bits — FP rate, never
    // correctness — so a caller with a stable eval set passes ndvMemoKey
    // (e.g. the corpus dir) and the count runs once per process.
    def derivedNdv(): Long = math.max(64L, (evalBg.count() * 1.25).toLong)
    val ndv = if (expectedEvalNgrams > 0) expectedEvalNgrams
      else if (ndvMemoKey != null)
        evalNdvCache.synchronized(evalNdvCache.getOrElseUpdate(ndvMemoKey, derivedNdv()))
      else derivedNdv()
    // the Bloom bits enter the corpus scan as a scalar subquery — the same
    // shape Spark's runtime row-level filtering injects (BloomFilterMightContain
    // accepts only constants or scalar subqueries), so the build stays in-plan
    val bloomDf = evalBg.agg(ColumnBridge.column(
      new org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate(
        ColumnBridge.expression(xxhash64(col("bigram"))), ndv)
        .toAggregateExpression()).as("bf"))
    val mightContain = ColumnBridge.column(
      org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain(
        org.apache.spark.sql.catalyst.expressions.ScalarSubquery(bloomDf.queryExecution.analyzed),
        ColumnBridge.expression(xxhash64(col("bigram")))))
    docBg.where(mightContain)
      .join(broadcast(evalBg), "bigram")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_overlapping_bigrams"))
  }

  // per-process memo of the derived eval-bigram NDV (see decontaminateBloom)
  private val evalNdvCache = scala.collection.mutable.Map[String, Long]()

  /** (corpus distinct bigrams keyed by doc, eval distinct bigrams). */
  /** doc_id, n_bigrams, n_overlapping_bigrams, overlap_fraction — the
    * thresholdable report behind [[decontaminate]]'s any-hit count:
    * production pipelines drop documents above an overlap FRACTION
    * (n-gram-contamination share), so the gate needs the denominator and
    * the clean documents too (left join, fraction 0). Same broadcast
    * eval side and single corpus scan as the boolean path. */
  def contaminationReport(docs: DataFrame, evalTexts: DataFrame,
                          evalIdCol: String, evalTextCol: String): DataFrame = {
    val (docBg, evalBg) = bigramSides(docs, evalTexts, evalIdCol, evalTextCol)
    contaminationReportFromBigrams(docBg, evalBg)
  }

  /** [[contaminationReport]] from pre-derived bigram sides. */
  def contaminationReportFromBigrams(docBg: DataFrame, evalBg: DataFrame): DataFrame = {
    val counts = docBg.groupBy("doc_id").agg(count(lit(1)).as("n_bigrams"))
    val overlap = docBg.join(broadcast(evalBg), "bigram")
      .groupBy("doc_id").agg(count(lit(1)).as("n_hits"))
    counts.join(overlap, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_bigrams"),
        coalesce(col("n_hits"), lit(0L)).as("n_overlapping_bigrams"),
        Num.r6(coalesce(col("n_hits"), lit(0L)).cast("double")
          / col("n_bigrams").cast("double")).as("overlap_fraction"))
  }

  private def bigramSides(docs: DataFrame, evalTexts: DataFrame,
                          evalIdCol: String, evalTextCol: String): (DataFrame, DataFrame) =
    (docBigrams(docs), evalBigrams(evalTexts, evalIdCol, evalTextCol))

  /** The corpus side of the contamination check: distinct (doc_id, bigram).
    * Scanned fresh per decontamination run — at 100 TB this IS the pass
    * over the training corpus; it is never a reusable artifact. */
  def docBigrams(docs: DataFrame): DataFrame =
    // row-local bigrams (TextOps.ngramArr): the corpus pass is now
    // scan → explode → distinct, with no lead()-window Exchange + Sort of
    // the token stream in front of it (guide §2.4)
    docs.select(col("doc_id"), split(col("text"), " ").as("toks"))
      .select(col("doc_id"), explode(TextOps.ngramArr(col("toks"), 2)).as("bigram"))
      .distinct()

  /** The eval side: the distinct bigram set of the held-out suite. In any
    * real deployment the eval suite is a VERSIONED ARTIFACT (it changes
    * when the benchmark changes, not per corpus scan), so callers holding
    * one should stage it once and pass it to the `*FromBigrams` variants —
    * re-deriving it per query was the r14 driver-flag mechanism on the
    * decontaminate family (VERDICT r14 item 3). */
  def evalBigrams(evalTexts: DataFrame, evalIdCol: String, evalTextCol: String): DataFrame =
    // same row-local derivation as [[docBigrams]] (TextOps.ngramArr)
    evalTexts
      .select(split(col(evalTextCol), " ").as("toks"))
      .select(explode(TextOps.ngramArr(col("toks"), 2)).as("bigram"))
      .distinct()

  /** Multimodal metadata: payload as binary + typed metadata + stubbed decode.
    * doc_id, byte_len, head_hex, fake_width, fake_height, fake_n_frames. */
  def multimodalMeta(docs: DataFrame): DataFrame =
    docs
      .withColumn("payload", col("text").cast("binary"))
      .withColumn("byte_len", length(col("payload")).cast("long"))
      .select(
        col("doc_id"),
        col("byte_len"),
        hex(expr("substring(payload, 1, 8)")).as("head_hex"),
        (pmod(col("byte_len"), lit(64L)) + 1).as("fake_width"),
        (pmod(floor(col("byte_len") / 64).cast("long"), lit(64L)) + 1).as("fake_height"),
        (pmod(col("byte_len"), lit(7L)) + 1).as("fake_n_frames"))

  /** doc_id, n_frames, frame_idx, ts_ms — deterministic uniform
    * frame-sampling plan over the multimodal metadata (the video path's
    * precompute: which timestamps a decode job will extract, scheduled
    * BEFORE any byte is decoded — the sample plan is metadata-sized, so
    * it ships to the decode fleet without touching payloads). The fake
    * duration is the payload byte length in ms; each of the n frames
    * samples the CENTER of its 1/n interval: ts = ((2i+1)·dur) div (2n) —
    * exact integer arithmetic, one in-row sequence+explode fan-out
    * bounded by n, never a join. */
  def frameSample(docs: DataFrame): DataFrame =
    multimodalMeta(docs)
      .select(col("doc_id"), col("byte_len").as("duration_ms"),
        col("fake_n_frames").as("n_frames"))
      .select(col("doc_id"), col("n_frames"),
        explode(sequence(lit(0L), col("n_frames") - 1)).as("frame_idx"),
        col("duration_ms"))
      .select(col("doc_id"), col("n_frames"), col("frame_idx"),
        expr("((2 * frame_idx + 1) * duration_ms) div (2 * n_frames)").as("ts_ms"))

  /** A REAL (non-identity) decode worker: a python3 child that rewrites
    * every payload — uppercases the bytes and strips the vowels — so both
    * the bytes AND the frame lengths coming back differ from what went in.
    * Deterministic and oracle-expressible (DuckDB:
    * regexp_replace(upper(text), '[AEIOU]', '', 'g')), it proves the kernel
    * framing survives a child that actually transforms data, not just
    * /bin/cat echo. Pure byte arithmetic (no encoding assumption beyond
    * the corpus's ASCII payloads, which TablesSpec's schema contract and
    * the oracle share). */
  val DecodeWorkerCmd: Seq[String] = Seq("python3", "-c",
    """import sys
      |for line in sys.stdin:
      |    i, h = line.split('\t')
      |    raw = bytes.fromhex(h.strip())
      |    out = bytes(c for c in raw.upper() if c not in b'AEIOU')
      |    sys.stdout.write(i + '\t' + out.hex() + '\n')
      |""".stripMargin)

  /** The per-partition decode shape used for real multimodal decode at
    * scale: binary payloads streamed through a REAL external worker process
    * (graft.infra.SubProcess — one child per partition, framed stdin/stdout,
    * deadlock-free concurrent writer, task-lifecycle cleanup). The sandbox
    * ships no codec binaries, so the stand-in worker is [[DecodeWorkerCmd]]
    * — a python3 child that genuinely rewrites payload bytes and lengths —
    * and the "decode" of the returned payload is the deterministic
    * byte-stat stub; a cluster swaps `cmd` for the codec and parses its real
    * output here instead. */
  def decodeBatched(payloads: DataFrame,
                    cmd: Seq[String] = Seq("/bin/cat")): DataFrame = {
    import payloads.sparkSession.implicits._
    val in = payloads.select(col("doc_id").cast("long"), col("payload").cast("binary"))
      .as[(Long, Array[Byte])]
    graft.infra.SubProcess.pipeFramed(in, cmd)
      .map { case (id, bytes) =>
        (id, bytes.length.toLong, if (bytes.isEmpty) 0L else bytes(0).toLong)
      }
      .toDF("doc_id", "byte_len", "first_byte")
  }
}
