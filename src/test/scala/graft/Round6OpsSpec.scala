package graft

import graft.operators.{Cooccurrence, Eval, Relational, TextStats}
import org.apache.spark.sql.functions._

/** Round-6 operators: the remaining TPC-H shapes (Q2/Q4/Q9/Q11/Q12/Q13/
  * Q15/Q17/Q20/Q21/Q22 adapted to the synthetic schema — completing all 22
  * plan shapes), Okapi BM25 weights, token-level Cohen's kappa, and the
  * data-card rollups (CUBE, table profile).
  */
class Round6OpsSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s + " 00:00:00")

  test("q4 counts an order once no matter how many late lineitems it has") {
    val orders = Seq(
      (1L, ts("1996-02-01"), "1-URGENT"),
      (2L, ts("1996-02-01"), "1-URGENT"), // no late shipment → excluded
      (3L, ts("1995-06-01"), "5-LOW") // outside the quarter
    ).toDF("o_orderkey", "o_orderdate", "o_orderpriority")
    val li = Seq(
      (1L, ts("1996-03-01")), (1L, ts("1996-03-05")), // two late shipments, one order
      (2L, ts("1996-01-15")), // shipped before the order date
      (3L, ts("1995-07-01"))
    ).toDF("l_orderkey", "l_shipdate")
    val r = Relational.q4OrderPriority(orders, li).collect()
    assert(r.length == 1)
    assert(r.head.getAs[String]("o_orderpriority") == "1-URGENT")
    assert(r.head.getAs[Long]("order_count") == 1L)
  }

  test("q13 keeps the zero-order customer bucket via the outer join") {
    val customer = Seq(1L, 2L, 3L).toDF("c_custkey")
    val orders = Seq(
      (1L, 10L, "O"), (1L, 11L, "O"), (2L, 12L, "F") // cust 2's only order filtered
    ).toDF("o_custkey", "o_orderkey", "o_orderstatus")
    val r = Relational.q13OrderDistribution(customer, orders)
      .orderBy("c_count").collect()
      .map(x => (x.getAs[Long]("c_count"), x.getAs[Long]("custdist")))
    assert(r.toSeq == Seq((0L, 2L), (2L, 1L))) // custs 2 and 3 land in the 0 bucket
  }

  test("q15 returns every supplier tied at the maximum cents revenue") {
    val supplier = Seq((1L, "s1"), (2L, "s2"), (3L, "s3")).toDF("s_suppkey", "s_name")
    val li = Seq(
      (1L, 100.0, 0.0, ts("1996-02-01")),
      (2L, 50.0, 0.0, ts("1996-02-01")), (2L, 50.0, 0.0, ts("1996-02-02")), // ties supplier 1
      (3L, 10.0, 0.0, ts("1996-02-01"))
    ).toDF("l_suppkey", "l_extendedprice", "l_discount", "l_shipdate")
    val r = Relational.q15TopSupplier(supplier, li).orderBy("s_suppkey").collect()
    assert(r.map(_.getAs[Long]("s_suppkey")).toSeq == Seq(1L, 2L))
    assert(r.forall(_.getAs[Double]("total_revenue") == 100.0))
  }

  test("q22 cuts on the above-average balance and drops recently active customers") {
    val customer = Seq(
      (1L, 1000.0, "A"), // above avg, inactive → kept
      (2L, 1000.0, "A"), // above avg but ordered recently → dropped
      (3L, 10.0, "B") // below avg
    ).toDF("c_custkey", "c_acctbal", "c_mktsegment")
    val orders = Seq((2L, ts("1999-06-01")), (1L, ts("1998-06-01")))
      .toDF("o_custkey", "o_orderdate")
    val r = Relational.q22Inactive(customer, orders).collect()
    assert(r.length == 1)
    assert(r.head.getAs[String]("c_mktsegment") == "A")
    assert(r.head.getAs[Long]("numcust") == 1L)
    assert(r.head.getAs[Double]("totacctbal") == 1000.0)
  }

  test("bm25 matches the Okapi formula on a two-doc corpus") {
    // doc 1: A A B (dl 3) · doc 2: B (dl 1) → avgdl 2, N 2
    val annots = Seq(
      (1L, "A"), (1L, "A"), (1L, "B"), (2L, "B")
    ).toDF("doc_id", "concept_id")
    val r = Cooccurrence.bm25(annots).collect()
      .map(x => ((x.getAs[Long]("doc_id"), x.getAs[String]("concept_id")),
        (x.getAs[Long]("tf"), x.getAs[Long]("df"), x.getAs[Double]("bm25")))).toMap
    def okapi(tf: Long, df: Long, dl: Long): Double = {
      val idf = math.log((2.0 - df + 0.5) / (df + 0.5) + 1.0)
      val w = idf * (tf * 2.2) / (tf + 1.2 * (0.25 + 0.75 * dl / 2.0))
      math.floor(w * 1e6 + 0.5) / 1e6
    }
    assert(r((1L, "A")) == ((2L, 1L, okapi(2, 1, 3))))
    assert(r((1L, "B")) == ((1L, 2L, okapi(1, 2, 3))))
    assert(r((2L, "B")) == ((1L, 2L, okapi(1, 2, 1))))
    // rarer term outweighs the more frequent one at equal tf and dl
    assert(r((1L, "A"))._3 > r((1L, "B"))._3)
  }

  test("bm25 top-k ranks by rounded score with doc_id tie-break and honors k") {
    // concept C appears once in each of 3 equal-length docs → identical
    // scores, tie broken by doc_id; k=2 cuts the third
    val annots = Seq(
      (1L, "C"), (1L, "Z1"), (2L, "C"), (2L, "Z2"), (3L, "C"), (3L, "Z3")
    ).toDF("doc_id", "concept_id")
    val r = Cooccurrence.bm25TopK(annots, k = 2)
      .where(col("concept_id") === "C").orderBy("rk").collect()
    assert(r.map(x => (x.getAs[Long]("rk"), x.getAs[Long]("doc_id"))).toSeq ==
      Seq((1L, 1L), (2L, 2L)))
  }

  test("token kappa: perfect agreement → 1, complementary halves → negative") {
    def tok(doc: Long, n: Int) = (0 until n).map(i =>
      (doc, (i + 1).toLong, i * 10L, i * 10L + 5L))
    val tokens = (tok(1L, 4) ++ tok(2L, 4)).toDF("doc_id", "ord", "char_start", "char_end")
    // doc 1: both sets cover tokens 1-2 → perfect agreement
    // doc 2: system covers 1-2, gold covers 3-4 → agreement never, kappa < 0
    val sys = Seq((1L, 0L, 15L), (2L, 0L, 15L)).toDF("doc_id", "char_start", "char_end")
    val gold = Seq((1L, 0L, 15L), (2L, 20L, 35L)).toDF("doc_id", "char_start", "char_end")
    val r = Eval.tokenKappa(tokens, sys, gold).orderBy("doc_id").collect()
    assert(r(0).getAs[Double]("po") == 1.0 && r(0).getAs[Double]("kappa") == 1.0)
    assert(r(1).getAs[Double]("po") == 0.0 && r(1).getAs[Double]("kappa") == -1.0)
  }

  test("token kappa: a doc with no annotations on either side is all-negative agreement") {
    val tokens = (0 until 3).map(i => (9L, (i + 1).toLong, i * 10L, i * 10L + 5L))
      .toDF("doc_id", "ord", "char_start", "char_end")
    val empty = Seq.empty[(Long, Long, Long)].toDF("doc_id", "char_start", "char_end")
    val r = Eval.tokenKappa(tokens, empty, empty).collect()
    assert(r.length == 1)
    assert(r.head.getAs[Long]("n_agree") == 3L)
    assert(r.head.getAs[Double]("po") == 1.0)
    assert(r.head.getAs[Double]("pe") == 1.0)
    assert(r.head.getAs[Double]("kappa") == 0.0) // pe = 1 convention
  }

  test("q19 admits a lineitem only through its own brand's quantity band") {
    val part = Seq((1L, "Brand#12"), (2L, "Brand#23"), (3L, "Brand#99"))
      .toDF("p_partkey", "p_brand")
    val li = Seq(
      (1L, 5.0, 100.0, 0.0), // Brand#12 in band [1,11] → kept
      (1L, 15.0, 100.0, 0.0), // Brand#12 outside its band → dropped
      (2L, 15.0, 200.0, 0.5), // Brand#23 in band [10,20] → kept at half price
      (3L, 5.0, 999.0, 0.0) // brand not in any disjunct → dropped
    ).toDF("l_partkey", "l_quantity", "l_extendedprice", "l_discount")
    val r = Relational.q19Discounted(part, li).collect()
    assert(r.length == 1)
    assert(r.head.getAs[Double]("revenue") == 200.0)
    assert(r.head.getAs[Long]("n_items") == 2L)
  }

  test("source caps keep each source's best docs and flag the overflow") {
    // source A: three docs of descending quality (more distinct tokens =
    // higher type-token ratio); source B: one doc — under any cap
    val rich = (1 to 30).map(i => s"w$i").mkString(" ")
    val mid = (1 to 15).map(i => s"w$i").mkString(" ") + " " + (1 to 15).map(_ => "x").mkString(" ")
    val poor = (1 to 30).map(_ => "x").mkString(" ")
    val docs = Seq(
      (1L, rich, "en", "A", rich.length.toLong),
      (2L, mid, "en", "A", mid.length.toLong),
      (3L, poor, "en", "A", poor.length.toLong),
      (4L, rich, "en", "B", rich.length.toLong)
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
    val r = TextStats.sourceCaps(docs, cap = 2).orderBy("doc_id").collect()
    assert(r.map(x => (x.getAs[Long]("doc_id"), x.getAs[Long]("source_rank"), x.getAs[Boolean]("keep"))).toSeq ==
      Seq((1L, 1L, true), (2L, 2L, true), (3L, 3L, false), (4L, 1L, true)))
  }

  test("temperature sampling up-weights the small source and down-weights the big one") {
    // source A: 9x the tokens of source B → alpha=0.3 damping must pull
    // p_temp toward the middle: boost(A) < 1 < boost(B), masses still sum to 1
    val big = (1 to 90).map(i => s"a$i").mkString(" ")
    val small = (1 to 10).map(i => s"b$i").mkString(" ")
    val docs = Seq(
      (1L, big, "en", "A", big.length.toLong),
      (2L, small, "en", "B", small.length.toLong)
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
    val r = TextStats.sourceTemperature(docs).collect()
      .map(x => x.getAs[String]("source") ->
        ((x.getAs[Double]("p_raw"), x.getAs[Double]("p_temp"), x.getAs[Double]("boost")))).toMap
    assert(r("A")._1 == 0.9 && r("B")._1 == 0.1)
    assert(r("A")._3 < 1.0 && r("B")._3 > 1.0, r.toString)
    assert(math.abs(r("A")._2 + r("B")._2 - 1.0) < 1e-5, r.toString)
    // alpha damping is monotone: the big source still has the larger share
    assert(r("A")._2 > r("B")._2)
  }

  test("length histogram buckets exact powers of two into their own bucket") {
    // n_chars 4 → 1 token → bucket 0; 8 → 2 tokens → bucket 1;
    // 16 → 4 tokens → bucket 2 (the floor(log2) fp trap case); 20 → 5 → bucket 2
    val docs = Seq(4L, 8L, 16L, 20L).zipWithIndex.map { case (n, i) =>
      (i.toLong, "x", "en", "s", n)
    }.toDF("doc_id", "text", "lang", "source", "n_chars")
    val r = TextStats.lengthHistogram(docs).orderBy("len_bucket").collect()
      .map(x => (x.getAs[Long]("len_bucket"), x.getAs[Long]("n_docs"), x.getAs[Double]("mean_tokens")))
    assert(r.toSeq == Seq((0L, 1L, 1.0), (1L, 1L, 2.0), (2L, 2L, 4.5)))
  }

  test("corpus cube emits all four grouping sets with correct grp codes") {
    val docs = Seq(
      (1L, "x", "en", "A", 10L), (2L, "x", "de", "A", 20L), (3L, "x", "en", "B", 30L)
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
    val r = TextStats.corpusCube(docs).collect()
      .map(x => ((x.getAs[String]("source"), x.getAs[String]("lang")),
        (x.getAs[Long]("grp"), x.getAs[Long]("n_docs"), x.getAs[Long]("n_chars")))).toMap
    assert(r(("ALL", "ALL")) == ((3L, 3L, 60L)))
    assert(r(("A", "ALL")) == ((1L, 2L, 30L)))
    assert(r(("ALL", "en")) == ((2L, 2L, 40L)))
    assert(r(("A", "en")) == ((0L, 1L, 10L)))
    assert(r.size == 8) // 1 total + 2 sources + 2 langs + 3 observed combos
  }

  test("table profile reports nulls, distincts, and typed min/max per column") {
    val docs = Seq(
      (1L, "x", "en", "A", 100L), (2L, "x", null, "B", 99L), (3L, "x", "en", "A", 5L)
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
    val r = TextStats.tableProfile(docs, Seq("lang", "n_chars")).collect()
      .map(x => x.getAs[String]("column_name") ->
        ((x.getAs[Long]("n_rows"), x.getAs[Long]("n_nulls"), x.getAs[Long]("n_distinct"),
          x.getAs[String]("min_s"), x.getAs[String]("max_s")))).toMap
    assert(r("lang") == ((3L, 1L, 1L, "en", "en")))
    // typed compare: numeric min is 5, not lexicographic "100"
    assert(r("n_chars") == ((3L, 0L, 3L, "5", "100")))
  }

  test("q12/q17 slice correctly on a tiny fixture") {
    val orders = Seq((1L, "1-URGENT"), (2L, "5-LOW")).toDF("o_orderkey", "o_orderpriority")
    val li = Seq(
      (1L, "N", ts("1996-05-01")), (2L, "N", ts("1996-06-01")),
      (1L, "N", ts("1995-01-01")) // outside the ship year
    ).toDF("l_orderkey", "l_returnflag", "l_shipdate")
    val r12 = Relational.q12PriorityClass(orders, li).collect()
    assert(r12.length == 1)
    assert(r12.head.getAs[Long]("high_line_count") == 1L)
    assert(r12.head.getAs[Long]("low_line_count") == 1L)

    val part = Seq((1L, "Brand#23"), (2L, "Brand#9")).toDF("p_partkey", "p_brand")
    val li17 = (Seq.fill(9)((1L, 10.0, 700.0)) ++ Seq((1L, 1.0, 700.0), (2L, 1.0, 999.0)))
      .toDF("l_partkey", "l_quantity", "l_extendedprice")
    // avg qty for part 1 = 9.1 → threshold 1.82 → only the qty-1 row counts;
    // part 2 is the wrong brand
    val r17 = Relational.q17SmallQty(part, li17).collect()
    assert(r17.length == 1)
    assert(r17.head.getAs[Double]("avg_yearly") == 100.0)
  }

  test("q2 picks the cheapest supplier per part from its best offer") {
    val part = Seq((1L, "red widget", "STANDARD"), (2L, "blue bolt", "PROMO"))
      .toDF("p_partkey", "p_name", "p_type")
    val supplier = Seq((10L, "S10", 123.456, 0L), (20L, "S20", 50.0, 1L))
      .toDF("s_suppkey", "s_name", "s_acctbal", "s_nationkey")
    val nation = Seq((0L, "N0"), (1L, "N1")).toDF("n_nationkey", "n_name")
    val li = Seq(
      (1L, 10L, 100.0, 10.0), (1L, 10L, 90.0, 10.0), // supp10 best offer: 9.0
      (1L, 20L, 95.0, 10.0), // supp20: 9.5
      (2L, 20L, 1.0, 1.0) // wrong p_type
    ).toDF("l_partkey", "l_suppkey", "l_extendedprice", "l_quantity")
    val r = Relational.q2MinCostSupplier(part, supplier, nation, li).collect()
    assert(r.length == 1)
    assert(r.head.getAs[Long]("s_suppkey") == 10L)
    assert(r.head.getAs[Double]("unit_price") == 9.0)
    assert(r.head.getAs[Double]("s_acctbal") == 123.46)
    assert(r.head.getAs[String]("supp_nation") == "N0")
  }

  test("q9 computes nation x year profit net of the modeled supply cost") {
    val part = Seq((1L, "red widget", 50.0), (2L, "blue bolt", 10.0))
      .toDF("p_partkey", "p_name", "p_retailprice")
    val supplier = Seq((10L, 0L)).toDF("s_suppkey", "s_nationkey")
    val nation = Seq((0L, "N0")).toDF("n_nationkey", "n_name")
    val orders = Seq((100L, ts("1996-05-01"))).toDF("o_orderkey", "o_orderdate")
    val li = Seq(
      (100L, 1L, 10L, 2.0, 200.0, 0.0), // revenue 20000c - cost 50*2*10=1000c
      (100L, 2L, 10L, 1.0, 99.0, 0.0) // name misses %red%
    ).toDF("l_orderkey", "l_partkey", "l_suppkey", "l_quantity", "l_extendedprice", "l_discount")
    val r = Relational.q9ProfitByNation(part, supplier, li, orders, nation).collect()
    assert(r.length == 1)
    assert(r.head.getAs[String]("supp_nation") == "N0")
    assert(r.head.getAs[Long]("o_year") == 1996L)
    assert(r.head.getAs[Double]("sum_profit") == 190.0)
  }

  test("q11 keeps only parts above the broadcast total-value threshold") {
    val nation = Seq((0L, "NATION_7"), (1L, "OTHER")).toDF("n_nationkey", "n_name")
    val supplier = Seq((10L, 0L), (20L, 1L)).toDF("s_suppkey", "s_nationkey")
    val li = Seq(
      (1L, 10L, 99.0), // 9900 cents, above 0.001 * 9905
      (2L, 10L, 0.05), // 5 cents, below threshold
      (3L, 20L, 999.0) // wrong nation
    ).toDF("l_partkey", "l_suppkey", "l_extendedprice")
    val r = Relational.q11ImportantParts(supplier, nation, li).collect()
    assert(r.length == 1)
    assert(r.head.getAs[Long]("l_partkey") == 1L)
    assert(r.head.getAs[Double]("part_value") == 99.0)
  }

  test("q20 qualifies only suppliers dominating a part's yearly flow") {
    val part = Seq((1L, "red widget"), (2L, "blue bolt")).toDF("p_partkey", "p_name")
    val supplier = Seq((10L, "S10", 0L), (20L, "S20", 0L))
      .toDF("s_suppkey", "s_name", "s_nationkey")
    val nation = Seq((0L, "N0")).toDF("n_nationkey", "n_name")
    val li = Seq(
      (1L, 10L, 8.0, ts("1997-03-01")), // 80% of part 1's 1997 flow
      (1L, 20L, 2.0, ts("1997-04-01")), // 20% — below threshold
      (1L, 20L, 100.0, ts("1996-03-01")), // wrong year
      (2L, 20L, 50.0, ts("1997-05-01")) // wrong name prefix
    ).toDF("l_partkey", "l_suppkey", "l_quantity", "l_shipdate")
    val r = Relational.q20ExcessSuppliers(part, supplier, nation, li).collect()
    assert(r.length == 1)
    assert(r.head.getAs[Long]("s_suppkey") == 10L)
    assert(r.head.getAs[String]("supp_nation") == "N0")
  }

  test("bigram logprob matches the hand-computed interpolated probability") {
    // corpus "a b" / "a c": bigrams (a,b) and (a,c) each once, left count
    // c(a·)=2; unigrams a:2 b:1 c:1, total 4.
    // p(b|a) = 0.7*(1/2) + 0.3*(1/4) = 0.425 → each doc's single-bigram
    // score is ln(0.425) (identical for (a,c))
    val docs = Seq((1L, "a b"), (2L, "a c")).toDF("doc_id", "text")
    val r = TextStats.bigramLogprob(docs).collect()
      .map(x => x.getAs[Long]("doc_id") ->
        ((x.getAs[Long]("n_bigrams"), x.getAs[Double]("avg_logprob")))).toMap
    val want = math.floor(math.log(0.7 * 0.5 + (1.0 - 0.7) * 0.25) * 1e6 + 0.5) / 1e6
    assert(r(1L) == ((1L, want)))
    assert(r(2L) == ((1L, want)))
  }

  test("source overlap matrix canonicalizes unordered source pairs") {
    // three identical docs → three confirmed pairs; (1,2) and (2,3) straddle
    // sources A/B (landing in ONE cell despite opposite doc-id order), (1,3)
    // stays within A
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog", "A"),
      (2L, "the quick brown fox jumps over the lazy dog", "B"),
      (3L, "the quick brown fox jumps over the lazy dog", "A")
    ).toDF("doc_id", "text", "source")
    val r = graft.operators.Dedup.sourceOverlapMatrix(docs).collect()
      .map(x => (x.getAs[String]("source_lo"), x.getAs[String]("source_hi")) ->
        ((x.getAs[Long]("n_pairs"), x.getAs[Double]("mean_jaccard")))).toMap
    assert(r.size == 2)
    assert(r(("A", "B")) == ((2L, 1.0)))
    assert(r(("A", "A")) == ((1L, 1.0)))
  }

  test("q21 isolates the sole faulting supplier on multi-supplier orders") {
    val supplier = Seq((10L, "S10", 0L), (20L, "S20", 0L), (30L, "S30", 0L))
      .toDF("s_suppkey", "s_name", "s_nationkey")
    val nation = Seq((0L, "N0")).toDF("n_nationkey", "n_name")
    val orders = Seq((1L, "F"), (2L, "F"), (3L, "O"), (4L, "F"))
      .toDF("o_orderkey", "o_orderstatus")
    val li = Seq(
      (1L, 10L, "R"), (1L, 20L, "N"), // order 1: only supp10 faulted → counts
      (2L, 10L, "R"), (2L, 20L, "R"), // order 2: both faulted → NOT EXISTS fails
      (3L, 10L, "R"), (3L, 20L, "N"), // order 3: status O → filtered
      (4L, 30L, "R") // order 4: single-supplier → EXISTS fails
    ).toDF("l_orderkey", "l_suppkey", "l_returnflag")
    val r = Relational.q21WaitingSuppliers(supplier, nation, li, orders).collect()
    assert(r.length == 1)
    assert(r.head.getAs[String]("s_name") == "S10")
    assert(r.head.getAs[Long]("numwait") == 1L)
  }
}
