package graft.operators

import graft.functions.Num
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Relational analytics + event-time analytics (bench headliners).
  *
  * The reference's downstream analytic layer is BigQuery SQL over exported
  * tables (reference: doc/bigquery, scripts/sql); these are the same
  * shapes run natively: grouped aggregation with map-side partial aggregation,
  * broadcast star joins, tumbling-window event aggregation and gap-based
  * sessionization (lag + running sum — the classic Spark formulation).
  *
  * Event timestamps are nanosecond longs end-to-end (see Tables.events), so
  * all window/session math is exact integer arithmetic.
  */
object Relational {

  private val UsPerHour = 3600L * 1000 * 1000
  private val SessionGapUs = 30L * 60 * 1000 * 1000

  /** TPC-H Q1-shaped pricing summary; predicate pushed to the scan. */
  def q1Pricing(lineitem: DataFrame): DataFrame =
    lineitem
      .where(col("l_shipdate") <= lit("1999-12-31").cast("timestamp"))
      .groupBy("l_returnflag", "l_linestatus")
      .agg(
        sum(col("l_quantity")).as("sum_qty"),
        Num.r2(sum(col("l_extendedprice"))).as("sum_base_price"),
        Num.r2(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount")))).as("sum_disc_price"),
        Num.r6(avg(col("l_quantity"))).as("avg_qty"),
        count(lit(1)).as("count_order"))

  /** TPC-H Q3-shaped: top orders by revenue for one segment; dims broadcast. */
  def q3TopOrders(customer: DataFrame, orders: DataFrame, lineitem: DataFrame): DataFrame =
    lineitem
      .join(orders.select("o_orderkey", "o_custkey", "o_orderdate"), col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(customer.where(col("c_mktsegment") === "BUILDING").select("c_custkey")),
        col("o_custkey") === col("c_custkey"))
      .groupBy("o_orderkey")
      .agg(Num.r2(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount")))).as("revenue"))
      .orderBy(col("revenue").desc, col("o_orderkey"))
      .limit(10)

  /** TPC-H Q5-shaped: revenue by customer nation; all dims broadcast, one
    * shuffle on the fact. */
  def q5RegionRevenue(customer: DataFrame, orders: DataFrame, lineitem: DataFrame,
                      nation: DataFrame, region: DataFrame): DataFrame =
    lineitem
      .join(orders.select("o_orderkey", "o_custkey"), col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(customer.select("c_custkey", "c_nationkey")), col("o_custkey") === col("c_custkey"))
      .join(broadcast(nation.select("n_nationkey", "n_name", "n_regionkey")), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(region.select("r_regionkey", "r_name")), col("n_regionkey") === col("r_regionkey"))
      .groupBy("r_name", "n_name")
      .agg(Num.r2(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount")))).as("revenue"),
        count(lit(1)).as("n_items"))

  /** TPC-H Q10-shaped: returned-item revenue per customer for one quarter,
    * top 20. Fact filtered at the scan (returnflag + order-date pushdown
    * through the join), dims broadcast, one shuffle on the fact, then a
    * top-k cut (TakeOrderedAndProject — never a global sort). */
  def q10Returns(customer: DataFrame, orders: DataFrame, lineitem: DataFrame,
                 nation: DataFrame): DataFrame =
    lineitem.where(col("l_returnflag") === "R")
      .join(orders.select("o_orderkey", "o_custkey", "o_orderdate")
        .where(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
          col("o_orderdate") < lit("1996-04-01").cast("timestamp")),
        col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(customer.select("c_custkey", "c_name", "c_acctbal", "c_nationkey")),
        col("o_custkey") === col("c_custkey"))
      .join(broadcast(nation.select("n_nationkey", "n_name")),
        col("c_nationkey") === col("n_nationkey"))
      .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
      .agg(Num.r2(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount")))).as("revenue"))
      .orderBy(col("revenue").desc, col("c_custkey"))
      .limit(20)

  /** TPC-H Q14-shaped: promo revenue share for one month — broadcast part
    * join + one conditional aggregate; the whole query is one partial-agg
    * shuffle of a single row per partition. */
  def q14Promo(lineitem: DataFrame, part: DataFrame): DataFrame = {
    val disc = col("l_extendedprice") * (lit(1.0) - col("l_discount"))
    lineitem
      .where(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1996-02-01").cast("timestamp"))
      .join(broadcast(part.select("p_partkey", "p_type")),
        col("l_partkey") === col("p_partkey"))
      .agg(Num.r6(
        sum(when(col("p_type").startsWith("PROMO"), disc).otherwise(lit(0.0))) * lit(100.0)
          / sum(disc)).as("promo_revenue"))
  }

  /** Ordered-funnel analysis (view → click → purchase): how far each user
    * progresses through a strictly time-ordered step sequence, aggregated
    * to users-per-step — the product-analytics companion to
    * sessionization (F5) and retention (F9). ONE shuffle: events group to
    * their user, the per-user event array sorts row-locally, and a
    * higher-order fold walks it advancing a (step, time) accumulator —
    * never a per-step join chain (k steps would mean k event-table
    * shuffles) and never a corpus-wide sort. Steps advance on STRICTLY
    * later µs timestamps, so same-instant events cannot satisfy two
    * steps; the fold only compares times, so the (tus, event_id) sort
    * tie-break cannot change the outcome. */
  /** @param cutoffUs funnel window end (exclusive) in canonical epoch-µs
    * (the Tables.events `ts` column); events at or past it are ignored. The
    * caller owns this — a bounded window is what makes a funnel discriminate
    * (unbounded, every active user eventually completes every step). */
  def eventsFunnel(events: DataFrame, cutoffUs: Long): DataFrame =
    events.where(col("ts") < lit(cutoffUs))
      .select(col("user_id"),
        struct(col("ts").as("tus"), col("event_id"),
          col("event_type").as("et")).as("ev"))
      .groupBy("user_id").agg(array_sort(collect_list(col("ev"))).as("evs"))
      .withColumn("step", expr(
        "aggregate(evs, struct(0 AS s, CAST(-1 AS BIGINT) AS t), (acc, e) -> " +
          "CASE WHEN acc.s = 0 AND e.et = 'view' THEN struct(1 AS s, e.tus AS t) " +
          "WHEN acc.s = 1 AND e.et = 'click' AND e.tus > acc.t THEN struct(2 AS s, e.tus AS t) " +
          "WHEN acc.s = 2 AND e.et = 'purchase' AND e.tus > acc.t THEN struct(3 AS s, e.tus AS t) " +
          "ELSE acc END, acc -> acc.s)").cast("long"))
      .groupBy("step").agg(count(lit(1)).as("n_users"))

  /** Tumbling 1h windows per event type: hour_bucket (µs-epoch / 3600e6). */
  def eventsHourly(events: DataFrame): DataFrame =
    events
      .groupBy(expr(s"ts div $UsPerHour").as("hour_bucket"), col("event_type"))
      .agg(count(lit(1)).as("n_events"), Num.r2(sum(col("value"))).as("sum_value"))

  /** day, week, dau, wau, stickiness — the DAU/WAU engagement table (the
    * product-analytics companion of [[eventsRetention]]; stickiness =
    * daily actives over that 7-day bucket's weekly actives). Days and
    * weeks are exact integer epoch buckets; two keyed distinct-count
    * aggregations plus a broadcast join on the (tiny) week table. */
  def eventsStickiness(events: DataFrame): DataFrame = {
    val usPerDay = UsPerHour * 24
    val d = events.select(expr(s"ts div $usPerDay").as("day"),
      expr(s"(ts div $usPerDay) div 7").as("week"), col("user_id"))
    val dau = d.groupBy("day", "week").agg(countDistinct("user_id").as("dau"))
    val wau = d.groupBy("week").agg(countDistinct("user_id").as("wau"))
    dau.join(broadcast(wau), "week")
      .select(col("day"), col("week"), col("dau"), col("wau"),
        Num.r6(col("dau").cast("double") / col("wau").cast("double")).as("stickiness"))
  }

  /** Cohort retention: users cohorted by their first-active day; one row
    * per (cohort_day, day_offset) with the distinct active count, cohort
    * size, and retention share. Three keyed aggregations and one equi-join
    * on the (tiny) cohort-day table — nothing corpus-global, the standard
    * product-analytics companion to sessionization. */
  def eventsRetention(events: DataFrame): DataFrame = {
    val usPerDay = UsPerHour * 24
    val active = events.select(col("user_id"),
      expr(s"ts div $usPerDay").as("day")).distinct()
    val cohorts = active.groupBy("user_id").agg(min("day").as("cohort_day"))
    val sizes = cohorts.groupBy("cohort_day").agg(countDistinct("user_id").as("cohort_size"))
    active.join(cohorts, "user_id")
      .groupBy(col("cohort_day"), (col("day") - col("cohort_day")).as("day_offset"))
      .agg(countDistinct("user_id").as("n_active"))
      .join(broadcast(sizes), "cohort_day")
      .withColumn("retention",
        Num.r6(col("n_active").cast("double") / col("cohort_size").cast("double")))
  }

  /** TPC-H Q6-shaped revenue forecast: pure filter+agg — every predicate
    * reaches the parquet scan (PushedFilters), no join, one partial-agg
    * shuffle of a single row per partition. */
  def q6Forecast(lineitem: DataFrame): DataFrame =
    lineitem
      .where(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1997-01-01").cast("timestamp") &&
        col("l_discount") >= 0.02 && col("l_discount") <= 0.04 &&
        col("l_quantity") < 24)
      .agg(Num.r2(sum(col("l_extendedprice") * col("l_discount"))).as("revenue"),
        count(lit(1)).as("n_items"))

  /** Exact interpolated quantiles of event value per type (p50/p90/p99).
    * Exact (sort-based) rather than sketch-based so the DuckDB oracle agrees
    * bit-for-bit; the sketch path (approx_percentile) is the 100 TB option
    * when exactness isn't contractual. */
  def eventsQuantiles(events: DataFrame): DataFrame =
    events.groupBy("event_type")
      .agg(
        Num.r6(expr("percentile(value, 0.5)")).as("p50"),
        Num.r6(expr("percentile(value, 0.9)")).as("p90"),
        Num.r6(expr("percentile(value, 0.99)")).as("p99"),
        count(lit(1)).as("n"))

  /** Sketch-based quantiles — the 100 TB path for eventsQuantiles: a
    * fixed-size mergeable summary per partition instead of a per-group sort,
    * so memory is O(accuracy) regardless of group size. Spec-verified
    * against the exact path (sketches aren't cross-engine reproducible,
    * so no DuckDB oracle by design). */
  def eventsQuantilesApprox(events: DataFrame, accuracy: Int = 10000): DataFrame =
    events.groupBy("event_type")
      .agg(percentile_approx(col("value"), array(lit(0.5), lit(0.9), lit(0.99)), lit(accuracy)).as("ps"),
        count(lit(1)).as("n"))
      .select(col("event_type"), col("ps").getItem(0).as("p50"),
        col("ps").getItem(1).as("p90"), col("ps").getItem(2).as("p99"), col("n"))

  /** HyperLogLog++ distinct users per event type — the 100 TB path for
    * exact countDistinct (no per-group hash set, constant-size sketch).
    * Spec-verified within the configured relative error. */
  def distinctUsersApprox(events: DataFrame, rsd: Double = 0.02): DataFrame =
    events.groupBy("event_type")
      .agg(approx_count_distinct(col("user_id"), rsd).as("n_users_approx"))

  // per-process staging of sketch outputs (deterministic paths outside the
  // exit-cleaned temp staging: the driver's DuckDB compare reads them after
  // this JVM exits — same discipline as the compression-ratio stage)
  private val sketchStaged = scala.collection.mutable.Set[String]()
  private def sketchStagePath(kind: String, sfDir: String): String =
    graft.infra.Staging.oracleStagePath(kind, sfDir)
  @volatile var lastQuantileSketchStage: String = ""
  @volatile var lastHllStage: String = ""
  private def stageOnce(path: String)(write: => Unit): Unit =
    sketchStaged.synchronized {
      if (!sketchStaged.contains(path)) { write; sketchStaged.add(path) }
    }

  /** The sketch-quantile path under the FULL oracle: the
    * [[eventsQuantilesApprox]] summary is staged to parquet (sketch
    * internals aren't cross-engine reproducible, but the staged thresholds
    * are plain data both engines share), then every event is bucketed
    * against its type's staged p50/p90/p99 and counted per bucket. The
    * bucketing decisions — what a 100 TB pipeline actually consumes
    * sketch quantiles FOR — are deterministic and hash-compared row by
    * row. Threshold table is dimension-sized → broadcast; one shuffle for
    * the final (type, bucket) count. */
  def eventsQuantileBuckets(events: DataFrame, sfDir: String): DataFrame = {
    val path = sketchStagePath("quantile_sketch", sfDir)
    stageOnce(path) {
      eventsQuantilesApprox(events).coalesce(1).write.mode("overwrite").parquet(path)
    }
    lastQuantileSketchStage = path
    val th = events.sparkSession.read.parquet(path)
      .select("event_type", "p50", "p90", "p99")
    events.join(broadcast(th), "event_type")
      .withColumn("bucket",
        when(col("value") <= col("p50"), "low")
          .when(col("value") <= col("p90"), "mid")
          .when(col("value") <= col("p99"), "high")
          .otherwise("top"))
      .groupBy("event_type", "bucket")
      .agg(count(lit(1)).as("n_events"))
  }

  /** Oracle twin of [[eventsQuantileBuckets]], rebuilt per dump. */
  def quantileBucketsOracleSql: String =
    s"""WITH th AS (SELECT event_type, p50, p90, p99
       |  FROM read_parquet('$lastQuantileSketchStage/*.parquet'))
       |SELECT e.event_type,
       |  CASE WHEN e.value <= th.p50 THEN 'low'
       |       WHEN e.value <= th.p90 THEN 'mid'
       |       WHEN e.value <= th.p99 THEN 'high'
       |       ELSE 'top' END AS bucket,
       |  CAST(count(*) AS BIGINT) AS n_events
       |FROM events e JOIN th USING (event_type)
       |GROUP BY 1, 2""".stripMargin

  /** The HLL path under the FULL oracle, same staging trick: the
    * [[distinctUsersApprox]] estimates are staged, then compared against
    * the exact per-type distinct count with an INTEGER error-bound
    * decision (10·|err| ≤ exact + 10, i.e. within 10% + 1 — integer math
    * so both engines decide identically). The estimate, the exact count,
    * and the bound verdict all land in the correctness hash. */
  def hllUsersBound(events: DataFrame, sfDir: String): DataFrame = {
    val path = sketchStagePath("hll_users", sfDir)
    stageOnce(path) {
      distinctUsersApprox(events).coalesce(1).write.mode("overwrite").parquet(path)
    }
    lastHllStage = path
    val est = events.sparkSession.read.parquet(path)
    events.groupBy("event_type")
      .agg(countDistinct(col("user_id")).as("n_users_exact"))
      .join(broadcast(est), "event_type")
      .select(col("event_type"), col("n_users_exact"), col("n_users_approx"),
        (abs(col("n_users_approx") - col("n_users_exact")) * 10 <=
          col("n_users_exact") + 10).as("within_bound"))
  }

  /** Oracle twin of [[hllUsersBound]], rebuilt per dump. */
  def hllUsersOracleSql: String =
    s"""WITH est AS (SELECT event_type, n_users_approx
       |  FROM read_parquet('$lastHllStage/*.parquet')),
       |ex AS (SELECT event_type, CAST(count(DISTINCT user_id) AS BIGINT) AS n_users_exact
       |  FROM events GROUP BY 1)
       |SELECT ex.event_type, ex.n_users_exact, est.n_users_approx,
       |  abs(est.n_users_approx - ex.n_users_exact) * 10 <= ex.n_users_exact + 10 AS within_bound
       |FROM ex JOIN est USING (event_type)""".stripMargin

  /** Top-3 parts per brand by retail price, carrying the part NAME — the
    * top-N-per-group-with-payload shape. Re-planned (r9) from the rank
    * window onto the payload-carrying bounded-heap aggregate: the window
    * materializes and sorts every part of every brand before discarding
    * all but k (one hot brand = one straggler partition at 100×), while
    * TopKAgg ships ≤ k (price, key, name) entries per brand through
    * partial aggregation. Ordering (score DESC, id ASC) matches the
    * window/oracle formulation row-for-row; the name rides the heap as
    * inert cargo. The window formulation itself stays covered by
    * ExtensionsSpec, where WindowTopKToBoundedHeap rewrites it to exactly
    * this plan. */
  def topPartsPerBrand(part: DataFrame, k: Int = 3): DataFrame =
    part
      // explicit non-null contract (ADVICE r9): TopKAgg.update skips null
      // score/id rows, where the window formulation would rank them NULLS
      // LAST — the TPC-H columns are never null, but if a source schema
      // marks them nullable the divergence must be this visible pre-filter,
      // not a silent heap-side drop (the optimizer rule refuses nullable
      // score/id for the same reason).
      .where(col("p_retailprice").isNotNull && col("p_partkey").isNotNull)
      .groupBy("p_brand")
      .agg(graft.functions.TopKAgg.topKWith(
        col("p_retailprice"), col("p_partkey"), k, col("p_name")).as("tk"))
      .select(col("p_brand"), posexplode(col("tk")).as(Seq("pos", "e")))
      .select(col("p_brand"), (col("pos") + 1).cast("long").as("rk"),
        col("e.id").as("p_partkey"), col("e.payload.p0").as("p_name"),
        col("e.score").as("p_retailprice"))

  /** TPC-H Q7-shaped: shipping volume between customer and supplier nations
    * by ship year. Every dimension (customer, supplier, both nation copies)
    * broadcasts; the fact shuffles once, for the final aggregation. */
  def q7Volume(customer: DataFrame, orders: DataFrame, lineitem: DataFrame,
               supplier: DataFrame, nation: DataFrame): DataFrame = {
    val n1 = nation.select(col("n_nationkey").as("c_nk"), col("n_name").as("cust_nation"))
    val n2 = nation.select(col("n_nationkey").as("s_nk"), col("n_name").as("supp_nation"))
    lineitem
      .join(orders.select("o_orderkey", "o_custkey"), col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(customer.select("c_custkey", "c_nationkey")), col("o_custkey") === col("c_custkey"))
      .join(broadcast(supplier.select("s_suppkey", "s_nationkey")), col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(n1), col("c_nationkey") === col("c_nk"))
      .join(broadcast(n2), col("s_nationkey") === col("s_nk"))
      .where(col("cust_nation") =!= col("supp_nation"))
      .groupBy(col("cust_nation"), col("supp_nation"), year(col("l_shipdate")).cast("long").as("l_year"))
      // integer-cents accounting: round each item to cents, sum exactly as
      // longs (order-independent — a float sum's last-ulp depends on
      // accumulation order, which no distributed engine can pin down), then
      // divide once. With 4k+ fine-grained groups the float-sum-then-round
      // formulation measurably flips 2dp boundaries between engines.
      .agg(sum(floor(col("l_extendedprice") * (lit(1.0) - col("l_discount")) * lit(100.0) + lit(0.5))
        .cast("long")).as("cents"),
        count(lit(1)).as("n_items"))
      .select(col("cust_nation"), col("supp_nation"), col("l_year"),
        (col("cents") / lit(100.0)).as("volume"), col("n_items"))
  }

  /** TPC-H Q16-shaped: distinct supplier count per part attribute, excluding
    * a supplier denylist via broadcast anti-join. count_distinct plans as
    * two-phase (partial distinct map-side) — no single-point aggregation. */
  def q16PartSuppliers(part: DataFrame, lineitem: DataFrame, supplier: DataFrame): DataFrame =
    lineitem.select("l_partkey", "l_suppkey")
      .join(broadcast(supplier.where(col("s_acctbal") < 0).select(col("s_suppkey"))),
        col("l_suppkey") === col("s_suppkey"), "left_anti")
      .join(part.select("p_partkey", "p_brand", "p_type", "p_size"),
        col("l_partkey") === col("p_partkey"))
      .groupBy("p_brand", "p_type", "p_size")
      .agg(count_distinct(col("l_suppkey")).as("supplier_cnt"))

  /** TPC-H Q18-shaped: customers with large orders — aggregate the fact per
    * order, filter on the grouped sum (having), then join order/customer
    * detail back. The having-filter runs before the detail join, so only
    * qualifying orders reach it. */
  def q18LargeOrders(customer: DataFrame, orders: DataFrame, lineitem: DataFrame,
                     minQty: Double = 150.0): DataFrame = {
    val big = lineitem.groupBy("l_orderkey")
      .agg(sum(col("l_quantity")).as("total_qty"))
      .where(col("total_qty") > minQty)
    big.join(orders.select("o_orderkey", "o_custkey", "o_orderdate", "o_totalprice"),
        col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(customer.select("c_custkey", "c_name")), col("o_custkey") === col("c_custkey"))
      .select(col("c_custkey"), col("c_name"), col("o_orderkey"), col("o_orderdate"),
        Num.r2(col("o_totalprice")).as("o_totalprice"), col("total_qty"))
  }

  /** TPC-H Q4-shaped: order-priority checking — count orders in a quarter
    * with at least one lineitem shipped after the order date. The EXISTS
    * plans as a LEFT SEMI join: the fact shuffles once on its join key and
    * each order emits at most once regardless of how many lineitems match
    * (a plain inner join + distinct would materialize every match first). */
  def q4OrderPriority(orders: DataFrame, lineitem: DataFrame): DataFrame =
    orders
      .where(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
        col("o_orderdate") < lit("1996-04-01").cast("timestamp"))
      .join(lineitem.select("l_orderkey", "l_shipdate"),
        col("o_orderkey") === col("l_orderkey") && col("l_shipdate") > col("o_orderdate"),
        "left_semi")
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("order_count"))

  /** TPC-H Q12-shaped: two-way conditional aggregation — per returnflag,
    * how many line items belong to high- vs low-priority orders in a ship
    * year. One fact shuffle; the CASE counters fold into the same partial
    * aggregate, so adding priority classes costs columns, not passes. */
  def q12PriorityClass(orders: DataFrame, lineitem: DataFrame): DataFrame = {
    val high = col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    lineitem
      .where(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1997-01-01").cast("timestamp"))
      .select("l_orderkey", "l_returnflag")
      .join(orders.select("o_orderkey", "o_orderpriority"),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy("l_returnflag")
      .agg(sum(when(high, 1L).otherwise(0L)).as("high_line_count"),
        sum(when(high, 0L).otherwise(1L)).as("low_line_count"))
  }

  /** TPC-H Q13-shaped: customer order-count distribution INCLUDING the
    * zero-order bucket — which forces a LEFT OUTER join (an inner join
    * silently drops inactive customers; `count(col)` then counts only
    * matched rows). Two grouped aggregations: per-customer, then histogram. */
  def q13OrderDistribution(customer: DataFrame, orders: DataFrame): DataFrame =
    customer.select("c_custkey")
      .join(orders.where(col("o_orderstatus") =!= "F").select("o_custkey", "o_orderkey"),
        col("c_custkey") === col("o_custkey"), "left_outer")
      .groupBy("c_custkey")
      .agg(count(col("o_orderkey")).as("c_count"))
      .groupBy("c_count")
      .agg(count(lit(1)).as("custdist"))

  /** TPC-H Q15-shaped: supplier(s) with the maximum quarterly revenue. The
    * global max is a 1-row broadcast aggregate folded into the plan — never
    * a driver-side collect or a global sort — and revenue accumulates in
    * integer cents so "equals the max" is an exact comparison, not a float
    * one (ties surface as multiple rows, identically in both engines). */
  def q15TopSupplier(supplier: DataFrame, lineitem: DataFrame): DataFrame = {
    val rev = lineitem
      .where(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1996-04-01").cast("timestamp"))
      .groupBy("l_suppkey")
      .agg(sum(floor(col("l_extendedprice") * (lit(1.0) - col("l_discount")) * lit(100.0) + lit(0.5))
        .cast("long")).as("revenue_cents"))
    rev
      .crossJoin(broadcast(rev.agg(max(col("revenue_cents")).as("max_cents"))))
      .where(col("revenue_cents") === col("max_cents"))
      .join(broadcast(supplier.select("s_suppkey", "s_name")),
        col("l_suppkey") === col("s_suppkey"))
      .select(col("s_suppkey"), col("s_name"),
        (col("revenue_cents") / lit(100.0)).as("total_revenue"))
  }

  /** TPC-H Q8-shaped: a supplier nation's market share, per order year,
    * among one region's customers for one part type. The deepest star here
    * (two nation copies + region + part + customer + supplier all
    * broadcast, the fact shuffles once for the final per-year aggregate);
    * numerator and denominator both accumulate in integer cents, so the
    * share is a single deterministic double division per group. */
  def q8MarketShare(part: DataFrame, lineitem: DataFrame, orders: DataFrame,
                    customer: DataFrame, supplier: DataFrame, nation: DataFrame,
                    region: DataFrame, partType: String = "STANDARD",
                    custRegion: String = "AMERICA", suppNation: String = "NATION_5"): DataFrame = {
    val cents = floor(col("l_extendedprice") * (lit(1.0) - col("l_discount")) * lit(100.0) + lit(0.5))
      .cast("long")
    val n1 = nation.select(col("n_nationkey").as("c_nk"), col("n_regionkey"))
    val n2 = nation.select(col("n_nationkey").as("s_nk"), col("n_name").as("supp_nation"))
    lineitem
      .join(broadcast(part.where(col("p_type") === partType).select("p_partkey")),
        col("l_partkey") === col("p_partkey"))
      .join(orders.select("o_orderkey", "o_custkey", "o_orderdate")
        .where(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
          col("o_orderdate") < lit("1998-01-01").cast("timestamp")),
        col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(customer.select("c_custkey", "c_nationkey")), col("o_custkey") === col("c_custkey"))
      .join(broadcast(n1), col("c_nationkey") === col("c_nk"))
      .join(broadcast(region.where(col("r_name") === custRegion).select("r_regionkey")),
        col("n_regionkey") === col("r_regionkey"))
      .join(broadcast(supplier.select("s_suppkey", "s_nationkey")), col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(n2), col("s_nationkey") === col("s_nk"))
      .groupBy(year(col("o_orderdate")).cast("long").as("o_year"))
      .agg(sum(when(col("supp_nation") === suppNation, cents).otherwise(0L)).as("nation_cents"),
        sum(cents).as("total_cents"))
      .select(col("o_year"),
        Num.r6(col("nation_cents").cast("double") / col("total_cents").cast("double")).as("mkt_share"))
  }

  /** TPC-H Q19-shaped: disjunctive join predicates — each brand admits its
    * own quantity band. The OR rides the broadcast hash join as a residual
    * filter on the equi key (never a nested-loop join); revenue accumulates
    * in integer cents. */
  def q19Discounted(part: DataFrame, lineitem: DataFrame): DataFrame =
    lineitem
      .join(broadcast(part.select("p_partkey", "p_brand")),
        col("l_partkey") === col("p_partkey") && (
          (col("p_brand") === "Brand#12" && col("l_quantity") >= 1 && col("l_quantity") <= 11) ||
          (col("p_brand") === "Brand#23" && col("l_quantity") >= 10 && col("l_quantity") <= 20) ||
          (col("p_brand") === "Brand#34" && col("l_quantity") >= 20 && col("l_quantity") <= 30)))
      .agg(sum(floor(col("l_extendedprice") * (lit(1.0) - col("l_discount")) * lit(100.0) + lit(0.5))
        .cast("long")).as("cents"),
        count(lit(1)).as("n_items"))
      .select((col("cents") / lit(100.0)).as("revenue"), col("n_items"))

  /** TPC-H Q17-shaped: revenue lost to small-quantity orders of one brand —
    * the correlated `avg(l_quantity) per part` subquery becomes a grouped
    * aggregate over the SAME brand-filtered fact slice, joined back by
    * broadcast (one brand ≈ 1/|brands| of parts, always dimension-sized).
    * The per-part average is display-rounded (6dp) before the threshold
    * compare so the cut is accumulation-order independent; the final sum
    * accumulates in integer cents for the same reason. */
  def q17SmallQty(part: DataFrame, lineitem: DataFrame, brand: String = "Brand#23"): DataFrame = {
    val li = lineitem
      .join(broadcast(part.where(col("p_brand") === brand).select("p_partkey")),
        col("l_partkey") === col("p_partkey"))
      .select("p_partkey", "l_quantity", "l_extendedprice")
    val avgQty = li.groupBy("p_partkey").agg(Num.r6(avg(col("l_quantity"))).as("avg_qty"))
    li.join(broadcast(avgQty), "p_partkey")
      .where(col("l_quantity") < lit(0.2) * col("avg_qty"))
      .agg((sum(floor(col("l_extendedprice") * lit(100.0) + lit(0.5)).cast("long"))
        .cast("double") / lit(100.0) / lit(7.0)).as("avg_yearly_cents"))
      .select(Num.r2(col("avg_yearly_cents")).as("avg_yearly"))
  }

  /** TPC-H Q22-shaped: well-funded customers gone quiet — above-average
    * balance AND no order since the cutoff. Two classic shapes in one
    * query: a scalar threshold as a 1-row broadcast (never a driver
    * collect) and a LEFT ANTI join against the recent-order keys. Balances
    * compare and total in integer cents, so both the threshold cut and the
    * group totals are exact regardless of accumulation order. */
  def q22Inactive(customer: DataFrame, orders: DataFrame,
                  sinceDate: String = "1999-01-01"): DataFrame = {
    val cents = floor(col("c_acctbal") * lit(100.0) + lit(0.5)).cast("long")
    val withCents = customer.select(col("c_custkey"), col("c_mktsegment"), cents.as("bal_cents"))
    val avgBal = withCents.where(col("bal_cents") > 0L)
      .agg((sum(col("bal_cents")).cast("double") / count(lit(1)).cast("double")).as("avg_cents"))
    withCents
      .crossJoin(broadcast(avgBal))
      .where(col("bal_cents").cast("double") > col("avg_cents"))
      .join(orders.where(col("o_orderdate") >= lit(sinceDate).cast("timestamp"))
        .select("o_custkey"),
        col("c_custkey") === col("o_custkey"), "left_anti")
      .groupBy("c_mktsegment")
      .agg(count(lit(1)).as("numcust"),
        (sum(col("bal_cents")) / lit(100.0)).as("totacctbal"))
  }

  /** TPC-H Q2-shaped: cheapest supplier per part — the correlated
    * `min(cost) per part` subquery decorrelated into a grouped aggregate
    * joined back by broadcast (part-dimension-sized, never a driver
    * collect). The schema has no partsupp, so each supplier's offer is its
    * best observed unit price (min over its lineitems); unit prices are
    * display-rounded (6dp) per line BEFORE the min, so "equals the part
    * minimum" is an exact compare in both engines, and ties surface as
    * multiple rows identically. */
  def q2MinCostSupplier(part: DataFrame, supplier: DataFrame, nation: DataFrame,
                        lineitem: DataFrame, partType: String = "STANDARD"): DataFrame = {
    val offers = lineitem
      .join(broadcast(part.where(col("p_type") === partType).select("p_partkey", "p_name")),
        col("l_partkey") === col("p_partkey"))
      .groupBy(col("p_partkey"), col("p_name"), col("l_suppkey"))
      .agg(min(Num.r6(col("l_extendedprice") / col("l_quantity"))).as("unit_price"))
    val minPrice = offers.groupBy(col("p_partkey").as("mp_partkey"))
      .agg(min(col("unit_price")).as("min_price"))
    offers
      .join(broadcast(minPrice),
        col("p_partkey") === col("mp_partkey") && col("unit_price") === col("min_price"))
      .join(broadcast(supplier.select("s_suppkey", "s_name", "s_acctbal", "s_nationkey")),
        col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(nation.select(col("n_nationkey"), col("n_name").as("supp_nation"))),
        col("s_nationkey") === col("n_nationkey"))
      .select(col("p_partkey"), col("p_name"), col("s_suppkey"), col("s_name"),
        Num.r2(col("s_acctbal")).as("s_acctbal"), col("supp_nation"), col("unit_price"))
  }

  /** TPC-H Q9-shaped: product-line profit by supplier nation and order
    * year. The schema has no partsupp supply cost, so cost is modeled as
    * 10% of the part's retail price per unit — the plan shape (name-LIKE
    * part slice, every dimension broadcast, one fact-fact shuffle with
    * orders, nation×year aggregate) is the point. Revenue and cost each
    * round to integer cents per line before the subtraction, so per-group
    * sums are exact longs regardless of accumulation order. */
  def q9ProfitByNation(part: DataFrame, supplier: DataFrame, lineitem: DataFrame,
                       orders: DataFrame, nation: DataFrame,
                       namePattern: String = "%red%"): DataFrame = {
    val profitCents =
      (floor(col("l_extendedprice") * (lit(1.0) - col("l_discount")) * lit(100.0) + lit(0.5)).cast("long")
        - floor(col("p_retailprice") * col("l_quantity") * lit(10.0) + lit(0.5)).cast("long"))
    lineitem
      .join(broadcast(part.where(col("p_name").like(namePattern))
        .select("p_partkey", "p_retailprice")), col("l_partkey") === col("p_partkey"))
      .join(broadcast(supplier.select("s_suppkey", "s_nationkey")),
        col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(nation.select(col("n_nationkey"), col("n_name").as("supp_nation"))),
        col("s_nationkey") === col("n_nationkey"))
      .join(orders.select("o_orderkey", "o_orderdate"), col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("supp_nation"), year(col("o_orderdate")).cast("long").as("o_year"))
      .agg(sum(profitCents).as("profit_cents"))
      .select(col("supp_nation"), col("o_year"),
        (col("profit_cents") / lit(100.0)).as("sum_profit"))
  }

  /** TPC-H Q11-shaped: important parts in one nation's supply flow — the
    * same aggregate computed twice, once per group and once as the global
    * total, with the total folded back as a 1-row broadcast threshold
    * (never a driver collect). Value accumulates in integer cents; only
    * the final fraction compare is floating. */
  def q11ImportantParts(supplier: DataFrame, nation: DataFrame, lineitem: DataFrame,
                        nationName: String = "NATION_7", fraction: Double = 0.001): DataFrame = {
    val nationSupps = supplier
      .join(broadcast(nation.where(col("n_name") === nationName).select("n_nationkey")),
        col("s_nationkey") === col("n_nationkey"))
      .select("s_suppkey")
    val values = lineitem
      .join(broadcast(nationSupps), col("l_suppkey") === col("s_suppkey"))
      .groupBy("l_partkey")
      .agg(sum(floor(col("l_extendedprice") * lit(100.0) + lit(0.5)).cast("long")).as("value_cents"))
    values
      .crossJoin(broadcast(values.agg(sum(col("value_cents")).as("total_cents"))))
      .where(col("value_cents").cast("double") > lit(fraction) * col("total_cents").cast("double"))
      .select(col("l_partkey"), (col("value_cents") / lit(100.0)).as("part_value"))
  }

  /** TPC-H Q20-shaped: suppliers who dominate a part's flow — a nested
    * semi-join chain: (part-name slice) → per-(part,supplier) quantity →
    * per-part total joined back by broadcast → qualifying supplier keys
    * semi-join the supplier dimension. No availqty in this schema, so
    * "excess" is shipping more than `threshold` of the part's total for
    * the year. Quantities are small integers stored as double — their sums
    * are exact (≪ 2^53), so the threshold compare is deterministic. */
  def q20ExcessSuppliers(part: DataFrame, supplier: DataFrame, nation: DataFrame,
                         lineitem: DataFrame, namePrefix: String = "red %",
                         shipYear: Int = 1997, threshold: Double = 0.3): DataFrame = {
    val li = lineitem
      .where(year(col("l_shipdate")) === shipYear)
      .join(broadcast(part.where(col("p_name").like(namePrefix)).select("p_partkey")),
        col("l_partkey") === col("p_partkey"))
      .select("l_partkey", "l_suppkey", "l_quantity")
    val perSupp = li.groupBy("l_partkey", "l_suppkey").agg(sum(col("l_quantity")).as("supp_qty"))
    val perPart = perSupp.groupBy(col("l_partkey").as("pp_partkey"))
      .agg(sum(col("supp_qty")).as("part_qty"))
    val qualifying = perSupp
      .join(broadcast(perPart), col("l_partkey") === col("pp_partkey"))
      .where(col("supp_qty") > lit(threshold) * col("part_qty"))
      .select("l_suppkey")
    supplier
      // qualifying is bounded by (name-slice parts × suppliers-per-part) —
      // dimension-sized however large the fact is, so broadcast explicitly
      // (derived from aggregates, its size is opaque to the planner, which
      // otherwise sort-merges the whole supplier dim against it)
      .join(broadcast(qualifying), col("s_suppkey") === col("l_suppkey"), "left_semi")
      .join(broadcast(nation.select(col("n_nationkey"), col("n_name").as("supp_nation"))),
        col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"), col("s_name"), col("supp_nation"))
  }

  /** TPC-H Q21-shaped: the double-correlated EXISTS / NOT EXISTS — per
    * supplier, returned lineitems on finished multi-supplier orders where
    * no OTHER supplier's line was returned. The schema has no
    * commit/receipt dates, so returnflag 'R' is the fault marker; the
    * correlation decorrelates to one LEFT SEMI and one LEFT ANTI join on
    * the order key with a supplier-inequality residual — the fact shuffles
    * on l_orderkey for all three legs, dimensions broadcast. */
  def q21WaitingSuppliers(supplier: DataFrame, nation: DataFrame, lineitem: DataFrame,
                          orders: DataFrame): DataFrame = {
    val others = lineitem.select(col("l_orderkey").as("o2_orderkey"),
      col("l_suppkey").as("o2_suppkey"), col("l_returnflag").as("o2_flag"))
    lineitem
      .where(col("l_returnflag") === "R")
      .select("l_orderkey", "l_suppkey")
      .join(orders.where(col("o_orderstatus") === "F").select("o_orderkey"),
        col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(supplier.select("s_suppkey", "s_name", "s_nationkey")),
        col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(nation.select(col("n_nationkey"), col("n_name").as("supp_nation"))),
        col("s_nationkey") === col("n_nationkey"))
      .join(others,
        col("l_orderkey") === col("o2_orderkey") && col("o2_suppkey") =!= col("l_suppkey"),
        "left_semi")
      .join(others.where(col("o2_flag") === "R"),
        col("l_orderkey") === col("o2_orderkey") && col("o2_suppkey") =!= col("l_suppkey"),
        "left_anti")
      .groupBy("supp_nation", "s_name")
      .agg(count(lit(1)).as("numwait"))
  }

  /** As-of join: each `leftType` event picks the most recent `refType` event
    * of the same user strictly before it in (time, event_id) order — e.g.
    * the click a purchase gets attributed to. Spark has no ASOF JOIN
    * operator; the scale-correct composition is NOT a per-row range join
    * (quadratic in events-per-user) but a single per-user ordered scan:
    * union both types, window `last(_, ignoreNulls)` over the preceding
    * frame, keep the left rows. One shuffle on user_id, linear work.
    * Timestamps at µs (cross-engine precision floor); ties broken by
    * event_id so the result is total-order deterministic. */
  def eventsAsof(events: DataFrame, leftType: String = "purchase",
                 refType: String = "click"): DataFrame = {
    val ev = events
      .where(col("event_type").isin(leftType, refType))
      .select(col("user_id"), col("event_id"), col("event_type"), col("ts").as("tus"))
    val tagged = ev
      .withColumn("ref_tus", when(col("event_type") === refType, col("tus")))
      .withColumn("ref_id", when(col("event_type") === refType, col("event_id")))
    val w = Window.partitionBy("user_id").orderBy(col("tus"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    tagged
      .withColumn("asof_tus", last(col("ref_tus"), ignoreNulls = true).over(w))
      .withColumn("asof_id", last(col("ref_id"), ignoreNulls = true).over(w))
      .where(col("event_type") === leftType)
      .select(col("user_id"), col("event_id").as("purchase_id"), col("tus").as("purchase_us"),
        col("asof_id").as("click_id"), col("asof_tus").as("click_us"),
        (col("tus") - col("asof_tus")).as("lag_us"))
  }

  /** Interval join with NO equi key: every non-error event within ±maxLag of
    * each error event, across all users. The naive plan for a pure range
    * predicate is a BroadcastNestedLoopJoin — quadratic, the classic 100 TB
    * killer. The scale shape bins the time axis at the lag width: each error
    * probes its own and both adjacent bins (3-element explode), the join is
    * equi on the bin, and the exact range predicate refines the candidates.
    * Work is O(pairs-within-lag), not O(n²). */
  def rangeJoinBinned(events: DataFrame, maxLagUs: Long = 60000000L): DataFrame = {
    val ev = events.select(col("event_id"), col("ts").as("tus"), col("event_type"))
    val nbrs = ev.where(col("event_type") =!= "error")
      .withColumn("bin", expr(s"tus div ${maxLagUs}L"))
    val errs = ev.where(col("event_type") === "error")
      .select(col("event_id").as("err_id"), col("tus").as("err_tus"))
      .withColumn("bin", explode(array(
        expr(s"err_tus div ${maxLagUs}L") - 1L,
        expr(s"err_tus div ${maxLagUs}L"),
        expr(s"err_tus div ${maxLagUs}L") + 1L)))
    errs.join(nbrs, "bin")
      .where(abs(col("tus") - col("err_tus")) <= maxLagUs)
      .select(col("err_id"), col("event_id").as("nbr_id"),
        (col("tus") - col("err_tus")).as("delta_us"))
  }

  /** Gap-based sessionization (30 min): lag + running sum of session starts,
    * then per-session aggregation. One shuffle on user_id. Timestamps are
    * reduced to microseconds (the finest precision every engine preserves). */
  def eventsSessions(events: DataFrame): DataFrame = {
    val byUser = Window.partitionBy("user_id").orderBy(col("tus"), col("event_id"))
    events
      .withColumn("tus", col("ts"))
      .withColumn("prev_ts", lag(col("tus"), 1).over(byUser))
      .withColumn("new_session",
        when(col("prev_ts").isNull || (col("tus") - col("prev_ts")) > SessionGapUs, 1L).otherwise(0L))
      .withColumn("session_id", sum(col("new_session")).over(byUser))
      .groupBy("user_id", "session_id")
      .agg(count(lit(1)).as("n_events"),
        min(col("tus")).as("start_us"),
        max(col("tus")).as("end_us"),
        Num.r2(sum(col("value"))).as("sum_value"))
  }

  /** duration_min, n_sessions, mean_events — the session-duration
    * distribution over [[eventsSessions]] (the report a product team reads
    * off the session table): duration floored to minutes, session count
    * and mean size per bucket. One extra keyed aggregation over the
    * session frame — the bucket key is tiny, the heavy lifting is the
    * sessionization it composes. */
  def sessionMetrics(events: DataFrame): DataFrame =
    eventsSessions(events)
      .withColumn("duration_min", expr("(end_us - start_us) div 60000000"))
      .groupBy("duration_min")
      .agg(count(lit(1)).as("n_sessions"),
        Num.r6(avg(col("n_events"))).as("mean_events"))

  /** event_id, event_type, value, z — per-type z-score outliers (|z| > 3):
    * the standard streaming-adjacent anomaly check. Per-type mean/stddev are
    * a tiny broadcast aggregate; the flag is one scan. stddev is the sample
    * stddev both engines compute; the 6dp rounding absorbs accumulation-
    * order noise. Types with zero variance emit nothing (z undefined). */
  def eventsOutliers(events: DataFrame): DataFrame = {
    val stats = events.groupBy("event_type")
      .agg(avg(col("value")).as("mu"), stddev_samp(col("value")).as("sigma"))
      .where(col("sigma") > 0)
    events.join(broadcast(stats), "event_type")
      .withColumn("z", Num.r6((col("value") - col("mu")) / col("sigma")))
      .where(abs(col("z")) > 3.0)
      .select(col("event_id"), col("event_type"), Num.r6(col("value")).as("value"), col("z"))
  }

  /** key, n — the hottest join keys (worth salting): deterministic ordering
    * (count desc, key asc) so the report is cross-engine stable. */
  def skewReport(df: DataFrame, key: String, topK: Int = 20): DataFrame =
    df.groupBy(key).agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col(key))
      .limit(topK)

  /** Sessionization through Spark's NATIVE session_window aggregation — the
    * operator the lag+running-sum formulation above hand-rolls (and, in
    * streaming, the stateful session operator; no per-user sort window in
    * the plan, just a hash aggregation over merging session windows).
    * Boundary semantics differ at the exact gap: session_window's window
    * end (last event + gap) is EXCLUSIVE, so an event landing exactly at
    * the gap starts a new session, where the lag formulation (`> gap`)
    * merges it — the oracle encodes `>=`. */
  def eventsSessionsNative(events: DataFrame): DataFrame =
    events
      .withColumn("tus", col("ts"))
      .groupBy(col("user_id"),
        session_window(timestamp_micros(col("tus")), "30 minutes").as("w"))
      .agg(count(lit(1)).as("n_events"),
        min(col("tus")).as("start_us"),
        max(col("tus")).as("end_us"),
        Num.r2(sum(col("value"))).as("sum_value"))
      .select("user_id", "n_events", "start_us", "end_us", "sum_value")
}
