package graft.ops

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** [EXT] relational core over the driver's TPC-H-ish tables
  * (SURVEY.md §2.3 J2–J6, §2.4 A8–A10, §2.5 W7–W8, §2.6 O5, §2.7
  * U2–U3, §2.8 F18–F19). The reference has no relational joins
  * (SURVEY.md §2.3) — these are mandated by the driver's north star.
  *
  * Scale posture (100 TB): fact tables (lineitem/orders/events) are
  * only ever shuffled on their join/group keys; dimensions are
  * broadcast explicitly; range/as-of joins use pre-aggregation or a
  * single window pass instead of theta-join row explosion; all
  * aggregates are partial-agg friendly (sum/count/min/max) so
  * map-side combine halves shuffle volume automatically.
  */
object Relational {
  private def t(s: SparkSession, d: String, n: String) = Tables.load(s, d, n)

  /** J2+ CO-LOCATED BUCKETED JOIN — the pre-partitioning strategy for
    * repeated fact-fact joins at 100 TB: both tables are written
    * bucketed+sorted on the join key, so the orderkey join AND the
    * per-order aggregate run with ZERO shuffle of either fact table
    * (the bucket layout carries outputPartitioning through the
    * catalog). Only the final tiny histogram re-groups — the plan is
    * require'd to hold at most that one hash exchange, so a layout
    * regression fails the gate loudly rather than silently shuffling
    * terabytes. Tables live under the /tmp warehouse keyed by scale
    * factor (rebuilt per run; DROP + rm so a previous JVM's files
    * can't leak in through the in-memory catalog). */
  /** The two bucketed fact tables, built ONCE per (warehouse, data
    * dir) and shared across runs of the session — the round-7
    * shared-materialization contract (Bench/Verify build them in the
    * UNTIMED prestage pass; COLD mode clears the memo so attribution
    * still sees the full build). The 100 TB analogue: a bucketed
    * layout is ingest-side investment that readers amortize (guide
    * §2.4 — bucketed tables persist a partitioning across jobs); the
    * timed query is the zero-shuffle join the layout buys, and its
    * ≤1-exchange plan gate still runs on every execution. */
  private val bucketedShared =
    new java.util.concurrent.ConcurrentHashMap[String, (String, String)]()

  private[graft] def sharedBucketedTables(
      s: SparkSession, d: String): (String, String) =
    bucketedShared.computeIfAbsent(d, _ => {
      val safe = d.replaceAll("[^a-zA-Z0-9]", "_")
      val (to, tl) = (s"b_orders_$safe", s"b_lineitem_$safe")
      val wh = s.conf.get("spark.sql.warehouse.dir").stripPrefix("file:")
      Seq(to, tl).foreach { tab =>
        s.sql(s"DROP TABLE IF EXISTS $tab")
        graft.Util.rmRecursive(s"$wh/$tab")
      }
      t(s, d, "orders").select("o_orderkey", "o_custkey")
        .write.bucketBy(8, "o_orderkey").sortBy("o_orderkey").saveAsTable(to)
      t(s, d, "lineitem").select("l_orderkey", "l_extendedprice")
        .write.bucketBy(8, "l_orderkey").sortBy("l_orderkey").saveAsTable(tl)
      (to, tl)
    })

  private[graft] def prestageShared(s: SparkSession, d: String): Unit = {
    sharedBucketedTables(s, d); ()
  }

  private[graft] def clearSharedCaches(): Unit = bucketedShared.clear()

  def bucketedJoinColocated(s: SparkSession, d: String): DataFrame = {
    val (to, tl) = sharedBucketedTables(s, d)
    val perOrder = s.table(to)
      .join(s.table(tl), col("o_orderkey") === col("l_orderkey"))
      .groupBy("o_orderkey")
      .agg(count(lit(1)).cast("int").as("n_items"),
        round(sum("l_extendedprice"), 6).as("rev"))
    val hist = perOrder
      .groupBy("n_items")
      // DECIMAL accumulation (the incrementalAgg rule): the outer sum
      // reaches ~1e9 at 6 dp = 15 significant digits, where a double
      // fold's shuffle-arrival order can flip round(,6) run to run —
      // decimal is exact, so both engines agree by arithmetic
      .agg(count(lit(1)).as("n_orders"),
        round(sum(col("rev").cast("decimal(24,6)")).cast("double"), 6)
          .as("sum_rev"))
      .orderBy("n_items")
    val exchanges =
      "Exchange hashpartitioning".r
        .findAllIn(hist.queryExecution.executedPlan.toString).length
    require(exchanges <= 1,
      s"bucketed join/agg must not shuffle the fact tables (got $exchanges hash exchanges)")
    hist
  }

  /** TPC-H Q12 shape (priority shipping): fact⋈fact join + conditional
    * counting aggregate — one orderkey shuffle, the CASE sums are
    * partial-agg friendly. (The driver tables carry no shipmode or
    * commit/receipt dates, so the essence — urgent-vs-other line
    * counts per period — runs on order priority and ship year.) */
  def q12PriorityShipping(s: SparkSession, d: String): DataFrame =
    t(s, d, "lineitem").select("l_orderkey", "l_shipdate")
      .join(t(s, d, "orders").select("o_orderkey", "o_orderpriority"),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy(year(col("l_shipdate")).cast("int").as("ship_year"))
      .agg(
        sum(when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1L)
          .otherwise(0L)).as("high_line_count"),
        sum(when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 0L)
          .otherwise(1L)).as("low_line_count"))
      .orderBy("ship_year")

  /** TPC-H Q13 shape (customer order-count distribution): LEFT join so
    * zero-order customers survive with c_count = 0, then the
    * distribution re-aggregation. Two shuffles total (custkey, then
    * the tiny count key). */
  def q13OrderDistribution(s: SparkSession, d: String): DataFrame =
    t(s, d, "customer").select("c_custkey")
      .join(t(s, d, "orders").select("o_custkey", "o_orderkey"),
        col("c_custkey") === col("o_custkey"), "left")
      .groupBy("c_custkey")
      .agg(count(col("o_orderkey")).as("c_count")) // count(col) skips the null miss
      .groupBy("c_count")
      .agg(count(lit(1)).as("custdist"))
      .orderBy(col("custdist").desc, col("c_count").desc)

  /** TPC-H Q19 shape (disjunctive predicate join): three OR'd
    * brand×size×quantity branches — the classic case where the
    * predicate must stay ON the join (not decompose into separate
    * scans); part is broadcast so the disjunction evaluates map-side
    * in one pass over lineitem. */
  def q19DisjunctiveRevenue(s: SparkSession, d: String): DataFrame =
    t(s, d, "lineitem")
      .join(broadcast(t(s, d, "part").select("p_partkey", "p_brand", "p_size")),
        col("l_partkey") === col("p_partkey"))
      .filter(
        (col("p_brand") === "Brand#12" && col("p_size").between(1, 5) &&
          col("l_quantity").between(1, 11)) ||
        (col("p_brand") === "Brand#23" && col("p_size").between(1, 10) &&
          col("l_quantity").between(10, 20)) ||
        (col("p_brand") === "Brand#34" && col("p_size").between(1, 15) &&
          col("l_quantity").between(20, 30)))
      .agg(
        round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 6)
          .as("revenue"),
        count(lit(1)).as("n_lines"))

  /** TPC-H Q22 shape (global sales opportunity): positive-balance
    * average as a broadcast scalar threshold, anti-join against orders
    * for DORMANT customers, grouped by nation. (The driver corpus
    * gives every customer at least one order, so the textbook
    * "never ordered" filter is structurally empty — the anti-join runs
    * against the final stretch of the order history instead: high-
    * balance customers with no order since 2000.) The threshold is
    * ROUNDED before comparison so both engines cut at the identical
    * double. */
  def q22SalesOpportunity(s: SparkSession, d: String): DataFrame = {
    val cust = t(s, d, "customer")
    val avgBal = cust.filter(col("c_acctbal") > 0.0)
      .agg(round(avg("c_acctbal"), 6).as("ab"))
    cust.crossJoin(broadcast(avgBal))
      .filter(col("c_acctbal") > col("ab"))
      .join(
        t(s, d, "orders")
          .filter(col("o_orderdate") >= to_timestamp(lit("2000-01-01")))
          .select(col("o_custkey").as("c_custkey")),
        Seq("c_custkey"), "left_anti")
      .groupBy("c_nationkey")
      .agg(count(lit(1)).as("numcust"), round(sum("c_acctbal"), 6).as("totacctbal"))
      .orderBy("c_nationkey")
  }

  /** A8: TPC-H Q1-shaped pricing summary — hash aggregate with
    * map-side partials; one shuffle on the 6-value group key. */
  def q1PricingSummary(s: SparkSession, d: String): DataFrame =
    t(s, d, "lineitem")
      .filter(col("l_shipdate") <= to_timestamp(lit("2000-12-01")))
      .groupBy("l_returnflag", "l_linestatus")
      .agg(
        round(sum("l_quantity"), 2).as("sum_qty"),
        round(sum("l_extendedprice"), 2).as("sum_base_price"),
        round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2).as("sum_disc_price"),
        round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount")) * (lit(1.0) + col("l_tax"))), 2).as("sum_charge"),
        round(avg("l_quantity"), 6).as("avg_qty"),
        round(avg("l_extendedprice"), 6).as("avg_price"),
        round(avg("l_discount"), 6).as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy("l_returnflag", "l_linestatus")

  /** TPC-H Q3 shape (shipping priority): three-way join with date
    * predicates on both fact tables, revenue aggregation, top-10. */
  def q3ShippingPriority(s: SparkSession, d: String): DataFrame = {
    val cutoff = to_timestamp(lit("1998-01-01"))
    t(s, d, "customer").filter(col("c_mktsegment") === "BUILDING")
      .join(t(s, d, "orders").filter(col("o_orderdate") < cutoff),
        col("c_custkey") === col("o_custkey"))
      .join(t(s, d, "lineitem").filter(col("l_shipdate") >= cutoff),
        col("o_orderkey") === col("l_orderkey"))
      .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
      .agg(round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2).as("revenue"))
      .select(col("l_orderkey"),
        date_format(col("o_orderdate"), "yyyy-MM-dd").as("o_orderdate"),
        col("o_orderpriority"), col("revenue"))
      .orderBy(col("revenue").desc, col("l_orderkey"))
      .limit(10)
  }

  /** TPC-H Q18 shape (large-volume customers): HAVING over a grouped
    * fact + semi-join back through an IN subquery. */
  def q18LargeOrders(s: SparkSession, d: String): DataFrame = {
    val bigOrders = t(s, d, "lineitem")
      .groupBy("l_orderkey")
      .agg(sum("l_quantity").as("total_qty"))
      .filter(col("total_qty") > 150)
    t(s, d, "orders")
      .join(bigOrders, col("o_orderkey") === col("l_orderkey"))
      .join(t(s, d, "customer"), col("o_custkey") === col("c_custkey"))
      .select(col("c_custkey"), col("c_name"), col("o_orderkey"),
        col("o_totalprice"), round(col("total_qty"), 2).as("total_qty"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      .limit(20)
  }

  /** TPC-H Q5 shape (local supplier volume): the deepest join tree in
    * the suite — lineitem⋈orders is the one big shuffle (orderkey),
    * customer the second (custkey); supplier and the ASIA
    * nation⋈region slice are broadcast, and the Q5 locality
    * constraint c_nationkey = s_nationkey rides the customer join as
    * a predicate instead of a post-filter, so no row survives longer
    * than it must. */
  def q5LocalSupplier(s: SparkSession, d: String): DataFrame = {
    val asia = t(s, d, "nation")
      .join(broadcast(t(s, d, "region").filter(col("r_name") === "ASIA")),
        col("n_regionkey") === col("r_regionkey"))
      .select("n_nationkey", "n_name")
    val sup = t(s, d, "supplier")
      .join(broadcast(asia), col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"), col("s_nationkey"), col("n_name"))
    t(s, d, "lineitem")
      .join(t(s, d, "orders")
          .filter(col("o_orderdate") >= to_timestamp(lit("1996-01-01")) &&
            col("o_orderdate") < to_timestamp(lit("1997-01-01"))),
        col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(sup), col("l_suppkey") === col("s_suppkey"))
      .join(t(s, d, "customer"),
        col("o_custkey") === col("c_custkey") &&
          col("c_nationkey") === col("s_nationkey"))
      .groupBy("n_name")
      .agg(
        // round(6), not round(2): partial-agg accumulation order
        // differs ~1 ulp across engines and can flip a cent boundary
        // (the q7/q10 trap; round-2 ADVICE)
        round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 6).as("revenue"),
        count(lit(1)).as("n_items"))
      .orderBy("n_name")
  }

  /** TPC-H Q7 shape (volume shipping): bidirectional nation-pair
    * predicate — the OR-of-conjunctions join condition that defeats
    * naive pushdown. Both nation legs broadcast; the OR pair applies
    * after the equi-joins, exactly where Catalyst can still evaluate
    * it row-at-a-time without turning any join into a theta join. */
  def q7VolumeShipping(s: SparkSession, d: String): DataFrame = {
    val n1 = broadcast(t(s, d, "nation")
      .select(col("n_nationkey").as("supp_nk"), col("n_name").as("supp_nation")))
    val n2 = broadcast(t(s, d, "nation")
      .select(col("n_nationkey").as("cust_nk"), col("n_name").as("cust_nation")))
    val (na, nb) = ("NATION_3", "NATION_7")
    t(s, d, "lineitem")
      .join(t(s, d, "orders"), col("l_orderkey") === col("o_orderkey"))
      .join(t(s, d, "customer"), col("o_custkey") === col("c_custkey"))
      .join(broadcast(t(s, d, "supplier")), col("l_suppkey") === col("s_suppkey"))
      .join(n1, col("s_nationkey") === col("supp_nk"))
      .join(n2, col("c_nationkey") === col("cust_nk"))
      .filter(
        (col("supp_nation") === na && col("cust_nation") === nb) ||
          (col("supp_nation") === nb && col("cust_nation") === na))
      .groupBy(
        col("supp_nation"), col("cust_nation"),
        year(col("l_shipdate")).cast("int").as("l_year"))
      // round(6): cross-engine partial-agg sum order differs by ~1 ulp
      // and a cent boundary can flip under round(2) (see q10 note)
      .agg(round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 6).as("revenue"))
      .orderBy("supp_nation", "cust_nation", "l_year")
  }

  /** TPC-H Q10 shape (returned-item reporting): customers ranked by
    * revenue lost to returned lineitems in a quarter — a 4-table join
    * where the fact side is filtered EARLY (returnflag + date reach
    * the scans as pushed predicates) and only the aggregated top 20
    * survive to the final order. */
  def q10ReturnedItems(s: SparkSession, d: String): DataFrame =
    t(s, d, "lineitem").filter(col("l_returnflag") === "R")
      .join(
        t(s, d, "orders")
          .filter(col("o_orderdate") >= to_timestamp(lit("1996-01-01")) &&
            col("o_orderdate") < to_timestamp(lit("1996-04-01"))),
        col("l_orderkey") === col("o_orderkey"))
      .join(t(s, d, "customer"), col("o_custkey") === col("c_custkey"))
      .join(broadcast(t(s, d, "nation")), col("c_nationkey") === col("n_nationkey"))
      .groupBy("c_custkey", "c_name", "n_name")
      // round(6), not 2: partial-agg sum order differs across engines
      // by ~1 ulp, and a cent boundary (x.xx5) can flip under round(2)
      .agg(round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 6).as("revenue"))
      .orderBy(col("revenue").desc, col("c_custkey"))
      .limit(20)

  /** Exact percentile family (A-family widening): quartiles of
    * l_quantity per return flag. Spark `percentile` and DuckDB
    * `quantile_cont` share the percentile_cont interpolation
    * (1-f)*lo + f*h; results are rounded for cross-engine float
    * stability. Scale: per-group exact percentile sorts within the
    * aggregation — fine for bounded group counts; unbounded cardinality
    * would switch to approx_percentile (t-digest/GK, merge-friendly). */
  def quantileQuantity(s: SparkSession, d: String): DataFrame =
    t(s, d, "lineitem")
      .groupBy("l_returnflag")
      .agg(
        round(expr("percentile(l_quantity, 0.25)"), 6).as("q25"),
        round(expr("percentile(l_quantity, 0.5)"), 6).as("q50"),
        round(expr("percentile(l_quantity, 0.75)"), 6).as("q75"),
        count(lit(1)).as("n"))
      .orderBy("l_returnflag")

  /** J2+J3: revenue rollup through the full dimension chain.
    * lineitem⋈orders is the only big shuffle; customer⋈nation⋈region
    * are broadcast (Tables.broadcastDims rationale). */
  def revenueByNation(s: SparkSession, d: String): DataFrame = {
    val cust = t(s, d, "customer")
      .join(broadcast(t(s, d, "nation")), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(t(s, d, "region")), col("n_regionkey") === col("r_regionkey"))
      .select("c_custkey", "n_name", "r_name")
    t(s, d, "lineitem")
      .join(t(s, d, "orders"), col("l_orderkey") === col("o_orderkey"))
      .join(cust, col("o_custkey") === col("c_custkey"))
      .groupBy("r_name", "n_name")
      .agg(round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2).as("revenue"),
        count(lit(1)).as("n_items"))
      .orderBy("r_name", "n_name")
  }

  /** W7: ranking — top 3 orders per customer by total price. */
  def topOrdersPerCustomer(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy("o_custkey").orderBy(col("o_totalprice").desc, col("o_orderkey"))
    t(s, d, "orders")
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3)
      .select("o_custkey", "rn", "o_orderkey", "o_totalprice")
      .orderBy("o_custkey", "rn")
  }

  /** W8: 7-day moving revenue. Pre-aggregates to one row per day
    * BEFORE the window (the window then slides over ~2400 rows
    * regardless of fact-table size — the 100 TB-safe shape). */
  def movingRevenue7d(s: SparkSession, d: String): DataFrame = {
    val daily = t(s, d, "orders")
      .groupBy(to_date(col("o_orderdate")).as("day"))
      .agg(sum("o_totalprice").as("rev"))
      .withColumn("daynum", datediff(col("day"), to_date(lit("1995-01-01"))))
    val w = Window.orderBy("daynum").rangeBetween(-6, 0)
    daily
      .select(
        // day as yyyy-MM-dd string: pandas renders Spark DATE and
        // DuckDB DATE with different dtypes; strings compare cleanly.
        date_format(col("day"), "yyyy-MM-dd").as("day"),
        round(col("rev"), 2).as("revenue"),
        round(sum("rev").over(w), 2).as("revenue_7d"))
      .orderBy("day")
  }

  /** J4 (anti): customers with no finished ('F') order. (Plain
    * "never ordered" is vacuously empty in the driver data — every
    * customer has orders — so the filtered form keeps the check
    * meaningful.) */
  def customersWithoutOrders(s: SparkSession, d: String): DataFrame =
    t(s, d, "customer")
      .join(
        t(s, d, "orders").filter(col("o_orderstatus") === "F"),
        col("c_custkey") === col("o_custkey"), "left_anti")
      .select("c_custkey", "c_name", "c_acctbal")
      .orderBy("c_custkey")

  /** J4 (semi): per-segment stats over customers having at least one
    * open ('O') order. */
  def segmentOrderStats(s: SparkSession, d: String): DataFrame =
    t(s, d, "customer")
      .join(
        t(s, d, "orders").filter(col("o_orderstatus") === "O"),
        col("c_custkey") === col("o_custkey"), "left_semi")
      .groupBy("c_mktsegment")
      .agg(count(lit(1)).as("n_customers"), round(sum("c_acctbal"), 2).as("sum_acctbal"))
      .orderBy("c_mktsegment")

  /** J5: range join lineitem×part on l_quantity ∈ [p_size, p_size+4].
    * Instead of a theta BNLJ (O(|L|·|P|) at 100 TB), exploit that
    * l_quantity is integral: pre-aggregate lineitem per integer
    * quantity bucket (≤50 rows), explode each part into its 5 buckets,
    * and equi-join — the fact table is touched exactly once. */
  def rangeJoinQuantity(s: SparkSession, d: String): DataFrame = {
    // floor() pinned EXPLICITLY on both engines: Spark cast('int')
    // truncates while DuckDB CAST rounds-to-nearest, so a bare cast
    // diverges on fractional quantities. No cap on the bucket list —
    // sequence(p_size, p_size+4) is always ascending and the join
    // discards buckets with no lineitem rows, so correctness is
    // data-independent (round-1 ADVICE: least(...,50) silently assumed
    // max quantity 50).
    val perBucket = t(s, d, "lineitem")
      .groupBy(floor(col("l_quantity")).cast("int").as("bucket"))
      .agg(count(lit(1)).as("cnt"), sum("l_quantity").as("qty"))
    val partBuckets = t(s, d, "part")
      .select(col("p_partkey"), explode(sequence(col("p_size"), col("p_size") + 4)).as("bucket"))
    partBuckets
      .join(broadcast(perBucket), "bucket")
      .groupBy("p_partkey")
      .agg(sum("cnt").as("n_items"), round(sum("qty"), 2).as("sum_qty"))
      .orderBy("p_partkey")
  }

  /** J6: as-of join — for each purchase event, the most recent error
    * event (ts ≤ purchase ts) by the same user. One window pass over a
    * single shuffle on user_id; no join explosion (SURVEY.md §2.3 J6).
    * Timestamps are carried at µs granularity (Tables.tsMicros) — the
    * finest unit both Spark and the DuckDB oracle agree on. */
  def asofLatestError(s: SparkSession, d: String): DataFrame = {
    val ev = t(s, d, "events").withColumn("ts_us", Tables.tsMicros("ts"))
    val w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
      .rowsBetween(Window.unboundedPreceding, 0)
    ev.withColumn(
        "prior_error_ts",
        last(when(col("event_type") === "error", col("ts_us")), ignoreNulls = true).over(w))
      .filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ts_us").as("ts"), col("prior_error_ts"))
      .orderBy("event_id")
  }

  /** J6 via the NATIVE as-of join operator (graft.plans.AsOfJoin):
    * same semantics and oracle as [[asofLatestError]], but executed by
    * the custom AsOfJoinExec merge pass instead of a window over the
    * unioned stream — the plan shape that needs no window state and
    * only scans each side once. The event_id TIEBREAK makes the
    * operator's admission rule exactly the window's (time, event_id)
    * total order: a same-microsecond error counts only if its id
    * orders before the purchase (ns→µs truncation can tie timestamps
    * the id still orders — round-8 review catch; without the
    * tiebreak the two forms diverge on such ties). */
  def asofNativeLatestError(s: SparkSession, d: String): DataFrame = {
    val ev = t(s, d, "events").withColumn("ts_us", Tables.tsMicros("ts"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select("event_id", "user_id", "ts_us")
    val errors = ev.filter(col("event_type") === "error")
      .select(col("user_id").as("r_user_id"), col("ts_us").as("r_ts"),
        col("event_id").as("r_event_id"))
    graft.plans.AsOf.asofJoin(purchases, errors, "user_id", "r_user_id",
        "ts_us", "r_ts", Some("event_id"), Some("r_event_id"))
      .drop("r_event_id")
      .select(
        col("event_id"), col("user_id"), col("ts_us").as("ts"),
        col("r_ts").as("prior_error_ts"))
      .orderBy("event_id")
  }

  /** A10: rollup over (region, nation) of customer balances. Joins are
    * declared with the DataFrame API (broadcast hints included); the
    * rollup itself goes through spark.sql — the Dataset-API `rollup`
    * trips the ambiguous-self-join analyzer check on grouping columns
    * that arrived through a join chain, and this also exercises the
    * engine's SQL surface (SURVEY.md §2.4 A10). */
  def rollupAcctbal(s: SparkSession, d: String): DataFrame = {
    t(s, d, "customer")
      .join(broadcast(t(s, d, "nation")), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(t(s, d, "region")), col("n_regionkey") === col("r_regionkey"))
      .select("r_name", "n_name", "c_acctbal")
      .createOrReplaceTempView("graft_rollup_src")
    s.sql("""
      SELECT r_name, n_name, count(*) AS n_customers,
             round(sum(c_acctbal), 2) AS sum_acctbal
      FROM graft_rollup_src
      GROUP BY ROLLUP (r_name, n_name)
      ORDER BY r_name ASC NULLS FIRST, n_name ASC NULLS FIRST""")
  }

  /** A9: exact distinct counts per event type. */
  def distinctCounts(s: SparkSession, d: String): DataFrame =
    t(s, d, "events")
      .groupBy("event_type")
      .agg(countDistinct("user_id").as("n_users"), count(lit(1)).as("n_events"))
      .orderBy("event_type")

  /** A9 (approx): HLL++ distinct — the 100 TB answer to countDistinct
    * (no exact-distinct shuffle). The sketch ESTIMATE is
    * engine-specific, so the declared query is the ORACLE-GATED form
    * (round-10 verdict ask #3): the exact distinct count recomputed
    * in-query (which DuckDB reproduces bit-for-bit) plus
    * `within_bound` — |estimate − exact| ≤ 3·rsd·exact with the
    * default rsd 0.05, a bound the oracle asserts as literal `true`.
    * A sketch regression flips the boolean and the hash loudly; the
    * raw estimate stays available via [[approxDistinctUsersRaw]]. */
  def approxDistinctUsers(s: SparkSession, d: String): DataFrame =
    t(s, d, "events")
      .groupBy("event_type")
      .agg(
        countDistinct("user_id").as("n_exact"),
        approx_count_distinct("user_id", 0.05).as("approx"))
      .select(col("event_type"), col("n_exact"),
        (abs(col("approx") - col("n_exact")).cast("double") <=
          lit(0.15) * col("n_exact")).as("within_bound"))
      .orderBy("event_type")

  /** The production form of [[approxDistinctUsers]] — sketch only, no
    * exact recompute (the gate query pays countDistinct purely to
    * verify; at 100 TB you run THIS one). */
  def approxDistinctUsersRaw(s: SparkSession, d: String): DataFrame =
    t(s, d, "events")
      .groupBy("event_type")
      .agg(approx_count_distinct("user_id", 0.05).as("approx_users"))
      .orderBy("event_type")

  /** F18: JSON field extraction from the events props column. */
  def jsonExtractEvents(s: SparkSession, d: String): DataFrame =
    t(s, d, "events")
      .withColumn("k", get_json_object(col("props"), "$.k").cast("int"))
      .groupBy("event_type")
      .agg(sum("k").as("sum_k"), round(avg("k"), 6).as("avg_k"), count(lit(1)).as("n"))
      .orderBy("event_type")

  /** F21 ([EXT]): semi-structured VARIANT analytics, Spark-4 native —
    * each event folded into ONE nested JSON document (object + nested
    * object + array + the stored `props` payload), parsed ONCE to
    * `VariantType` with `parse_json`, and consumed through typed
    * `variant_get` paths: a top-level field, a nested field, an array
    * index, a path INTO the embedded payload, and `try_variant_get`
    * on an absent path (NULL, never an error). The oracle recomputes
    * the aggregate from the flat columns, so the
    * construct→parse→extract round trip is hash-verified end to end.
    * VARIANT is the 100 TB posture for heterogeneous payloads: one
    * binary-encoded column parsed at ingest (not per query), typed
    * paths ready for parquet shredding — vs `get_json_object`
    * re-parsing the string per extraction ([[jsonExtractEvents]] is
    * the legacy form). */
  def variantExtractEvents(s: SparkSession, d: String): DataFrame =
    t(s, d, "events")
      .withColumn("var", parse_json(to_json(struct(
        col("event_type").as("t"),
        struct(col("user_id").as("u"), col("value").as("v")).as("m"),
        array(col("event_id"), col("user_id")).as("ids"),
        from_json(col("props"),
          org.apache.spark.sql.types.StructType.fromDDL("k INT")).as("payload")))))
      .select(
        variant_get(col("var"), "$.t", "string").as("t"),
        variant_get(col("var"), "$.m.v", "double").as("v"),
        variant_get(col("var"), "$.ids[1]", "bigint").as("uid"),
        variant_get(col("var"), "$.payload.k", "int").as("k"),
        try_variant_get(col("var"), "$.not.there", "int").as("absent"))
      .groupBy("t")
      .agg(
        count(lit(1)).as("n"),
        round(sum("v"), 6).as("sum_v"),
        countDistinct(col("uid")).as("n_users"),
        sum(col("k")).as("sum_k"),
        sum(when(col("absent").isNull, 1L).otherwise(0L)).as("n_absent"))
      .orderBy("t")

  /** F19: calendar aggregation of order revenue. */
  def monthlyRevenue(s: SparkSession, d: String): DataFrame =
    t(s, d, "orders")
      .groupBy(year(col("o_orderdate")).as("yr"), month(col("o_orderdate")).as("mo"))
      .agg(round(sum("o_totalprice"), 2).as("revenue"), count(lit(1)).as("n_orders"))
      .orderBy("yr", "mo")

  /** O5: global top-k (TakeOrderedAndProject — no full sort at scale). */
  def topkParts(s: SparkSession, d: String): DataFrame =
    t(s, d, "part")
      .orderBy(col("p_retailprice").desc, col("p_partkey"))
      .limit(10)
      .select("p_partkey", "p_name", "p_retailprice")

  /** U3 (intersect): nations present in both customer and supplier. */
  def nationCoverage(s: SparkSession, d: String): DataFrame = {
    val n = t(s, d, "nation")
    val withCust = n.join(t(s, d, "customer"), col("n_nationkey") === col("c_nationkey"), "left_semi").select("n_name")
    val withSupp = n.join(t(s, d, "supplier"), col("n_nationkey") === col("s_nationkey"), "left_semi").select("n_name")
    withCust.intersect(withSupp).orderBy("n_name")
  }

  /** U3 (except): nations with customers but no well-capitalized
    * supplier (s_acctbal > 5000; unfiltered suppliers cover every
    * nation, which would make the check vacuous). */
  def nationsWithoutSuppliers(s: SparkSession, d: String): DataFrame = {
    val n = t(s, d, "nation")
    val withCust = n.join(t(s, d, "customer"), col("n_nationkey") === col("c_nationkey"), "left_semi").select("n_name")
    val withSupp = n.join(
      t(s, d, "supplier").filter(col("s_acctbal") > 5000),
      col("n_nationkey") === col("s_nationkey"), "left_semi").select("n_name")
    withCust.except(withSupp).orderBy("n_name")
  }

  /** A10 (cube): all grouping combinations of status × priority. */
  def cubeStatusPriority(s: SparkSession, d: String): DataFrame =
    t(s, d, "orders")
      .select("o_orderstatus", "o_orderpriority", "o_totalprice")
      .cube("o_orderstatus", "o_orderpriority")
      .agg(count(lit(1)).as("n_orders"), round(sum("o_totalprice"), 2).as("revenue"))
      .orderBy(col("o_orderstatus").asc_nulls_first, col("o_orderpriority").asc_nulls_first)

  /** A10 (grouping sets): two independent groupings in one pass —
    * by-status and by-priority totals side by side. */
  def groupingSetsOrders(s: SparkSession, d: String): DataFrame = {
    t(s, d, "orders").createOrReplaceTempView("graft_gs_orders")
    s.sql("""
      SELECT o_orderstatus, o_orderpriority, count(*) AS n_orders,
             round(sum(o_totalprice), 2) AS revenue
      FROM graft_gs_orders
      GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority))
      ORDER BY o_orderstatus ASC NULLS FIRST, o_orderpriority ASC NULLS FIRST""")
  }

  /** Skew-resilient two-stage aggregation: salt the group key, partial-
    * aggregate per (key, salt), then final-aggregate per key. Results
    * are identical to the direct groupBy (the oracle is the plain
    * form); the shape is what survives a hot key at 100 TB — each hot
    * key's rows spread across 16 reducers before the tiny final agg. */
  def saltedTypeStats(s: SparkSession, d: String): DataFrame =
    t(s, d, "events")
      .withColumn("salt", pmod(col("event_id"), lit(16L)))
      .groupBy("event_type", "salt")
      .agg(count(lit(1)).as("pn"), sum("value").as("ps"))
      .groupBy("event_type")
      .agg(sum("pn").as("n"), round(sum("ps"), 6).as("sum_value"))
      .orderBy("event_type")

  /** W7 full ranking family: rank, dense_rank, ntile alongside
    * row_number over per-segment order values. */
  def rankFamily(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy("c_mktsegment").orderBy(col("c_acctbal").desc, col("c_custkey"))
    t(s, d, "customer")
      .select(
        col("c_mktsegment"), col("c_custkey"), col("c_acctbal"),
        row_number().over(w).as("rn"),
        rank().over(w).as("rnk"),
        dense_rank().over(w).as("drnk"),
        ntile(4).over(w).as("quartile"))
      .filter(col("rn") <= 5)
      .orderBy("c_mktsegment", "rn")
  }

  /** U2: tagged UNION ALL of heterogeneous entity names, then a
    * group-count over the union — the unionByName surface. */
  def unionEntities(s: SparkSession, d: String): DataFrame = {
    val c = t(s, d, "customer").select(col("c_name").as("name"), lit("customer").as("kind"))
    val su = t(s, d, "supplier").select(col("s_name").as("name"), lit("supplier").as("kind"))
    c.unionByName(su)
      .groupBy("kind")
      .agg(count(lit(1)).as("n"), min("name").as("first_name"))
      .orderBy("kind")
  }

  /** A8 (statistics family): exact interpolated median + correlation /
    * covariance / stddev per return flag. */
  def statsSummary(s: SparkSession, d: String): DataFrame =
    t(s, d, "lineitem")
      .groupBy("l_returnflag")
      .agg(
        round(expr("percentile(l_quantity, 0.5)"), 6).as("median_qty"),
        round(corr("l_quantity", "l_extendedprice"), 6).as("corr_qty_price"),
        round(covar_samp("l_quantity", "l_discount"), 6).as("covar_qty_disc"),
        round(stddev_samp("l_quantity"), 6).as("stddev_qty"))
      .orderBy("l_returnflag")

  /** A8 (pivot): order revenue by year, one column per status. */
  def pivotStatusRevenue(s: SparkSession, d: String): DataFrame =
    t(s, d, "orders")
      .groupBy(year(col("o_orderdate")).cast("int").as("yr"))
      .pivot("o_orderstatus", Seq("F", "O", "P"))
      .agg(round(sum("o_totalprice"), 2))
      .orderBy("yr")

  /** W7 widening: the VALUE window-function family — first/last/nth
    * over an explicit full frame, lead/lag with defaults, and the
    * continuous ranks (percent_rank, cume_dist) — one window pass per
    * customer, ordered by the unique order key for cross-engine
    * determinism. */
  def windowValueFuncs(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy("o_custkey").orderBy("o_orderkey")
    val full = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    t(s, d, "orders")
      .select(
        col("o_custkey"), col("o_orderkey"),
        first("o_totalprice").over(full).as("first_price"),
        last("o_totalprice").over(full).as("last_price"),
        nth_value(col("o_totalprice"), 2).over(full).as("second_price"),
        lag("o_totalprice", 1, 0.0).over(w).as("prev_price"),
        lead("o_totalprice", 1, 0.0).over(w).as("next_price"),
        round(percent_rank().over(w), 6).as("pr"),
        round(cume_dist().over(w), 6).as("cd"))
      .orderBy("o_orderkey")
  }

  /** Correlated scalar subquery (decorrelated by Catalyst into a
    * join): customers with balance above their nation's average. */
  def aboveAvgCustomers(s: SparkSession, d: String): DataFrame = {
    t(s, d, "customer").createOrReplaceTempView("graft_sq_customer")
    s.sql("""
      SELECT c_custkey, c_nationkey, c_acctbal
      FROM graft_sq_customer c
      WHERE c_acctbal > (SELECT avg(c2.c_acctbal) FROM graft_sq_customer c2
                         WHERE c2.c_nationkey = c.c_nationkey)
      ORDER BY c_custkey""")
  }

  /** Skyline / Pareto frontier (PAPERS.md: "Integration of Skyline
    * Queries into Spark SQL", EDBT 2023): parts where no other part is
    * both cheaper-or-equal AND smaller-or-equal (strict in one).
    *
    * Scale-safe shape (round-1 verdict replaced a global no-partition
    * window — a single-reducer at 100× part cardinality):
    *  1. hash-agg to min size per price (only that point of a price
    *     group can be on the frontier);
    *  2. range-partition by price (explicit numPartitions so AQE can't
    *     re-coalesce the two consumer legs differently); per-range
    *     running min via a window PARTITIONED by the range id;
    *  3. cross-range fixup: per-range minima (≤ one row per range) get
    *     a prefix min over range ids — the only unpartitioned window,
    *     bounded by the partition COUNT, not the data — broadcast back.
    * A point is on the frontier iff every strictly-cheaper price has a
    * strictly larger size: min over (earlier ranges ∪ earlier rows in
    * this range) > own size. Two fully-parallel passes, O(n log n). */
  def skylinePriceSize(s: SparkSession, d: String): DataFrame = {
    val nPart = s.conf.get("spark.sql.shuffle.partitions", "32").toInt
    val best = t(s, d, "part")
      .groupBy("p_retailprice").agg(min("p_size").as("p_size"))
    // Range id from the DATA (value-range bucketing over broadcast
    // min/max), NOT spark_partition_id over repartitionByRange: the
    // two consumer legs below must observe IDENTICAL bucket ids, and a
    // partition-id column would silently depend on exchange reuse
    // (RangePartitioner boundaries are sampled per execution). A
    // per-row deterministic formula has no such coupling. Value-range
    // buckets can skew on clustered prices — production would compute
    // sampled boundaries once into a broadcast table; the correctness
    // argument is identical.
    val stats = best.agg(
      min("p_retailprice").as("lo"), max("p_retailprice").as("hi"))
    val bucketed = best.crossJoin(broadcast(stats))
      .withColumn("pid",
        when(col("hi") === col("lo"), lit(0)).otherwise(
          least(lit(nPart - 1),
            floor((col("p_retailprice") - col("lo")) /
              ((col("hi") - col("lo")) / nPart)).cast("int"))))
      .drop("lo", "hi")
    val localW = Window.partitionBy("pid").orderBy("p_retailprice")
      .rowsBetween(Window.unboundedPreceding, -1)
    val local = bucketed.withColumn("local_min_prev", min("p_size").over(localW))
    val prefixW = Window.orderBy("pid").rowsBetween(Window.unboundedPreceding, -1)
    val prefix = bucketed
      .groupBy("pid").agg(min("p_size").as("bucket_min")) // ≤ nPart rows
      .withColumn("prev_buckets_min", min("bucket_min").over(prefixW))
      .select("pid", "prev_buckets_min")
    local.join(broadcast(prefix), "pid")
      // least() ignores nulls; null only when BOTH legs are empty
      // (globally first row) — kept, as the frontier's cheapest point
      .withColumn("min_prev_size", least(col("local_min_prev"), col("prev_buckets_min")))
      .filter(col("min_prev_size").isNull || col("min_prev_size") > col("p_size"))
      .select(col("p_retailprice"), col("p_size"))
      .orderBy("p_retailprice", "p_size")
  }

  /** F20: MAP-with-defaults semantics — a literal MapType column
    * looked up per row with a coalesce default (the reference's
    * config-map access pattern, `dict.get(k, default)`), driving a
    * weighted aggregate. The oracle mirrors the lookup as a CASE
    * ladder — same semantics, engine-native form. */
  def mapDefaultsWeights(s: SparkSession, d: String): DataFrame = {
    // all three keys exist in the driver data, so every branch is
    // exercised: two non-trivial weights, a ZERO weight (distinguishes
    // a map hit of 0.0 from the null→coalesce default), and the
    // default path for click/signup
    val weights = map(
      lit("purchase"), lit(1.5), lit("error"), lit(0.5), lit("view"), lit(0.0))
    t(s, d, "events")
      .select(
        col("event_type"), col("value"),
        coalesce(element_at(weights, col("event_type")), lit(1.0)).as("w"))
      .groupBy("event_type")
      .agg(
        count(lit(1)).as("n"),
        round(sum(col("value") * col("w")), 6).as("weighted_value"))
      .orderBy("event_type")
  }

  /** F1–F7: string-function projection over part. */
  def stringFuncsPart(s: SparkSession, d: String): DataFrame =
    t(s, d, "part")
      .select(
        col("p_partkey"),
        lower(col("p_name")).as("name_lc"),
        substring(col("p_type"), 1, 5).as("type5"),
        regexp_replace(col("p_brand"), "#", "_").as("brand_u"),
        length(col("p_name")).as("name_len"))
      .orderBy("p_partkey")

  /** TPC-H Q4 shape (adapted to this corpus's columns): order counts
    * per priority for orders with at least one LATE shipment
    * (l_shipdate more than 60 days after o_orderdate) — the EXISTS
    * decorrelates to a left-semi join on orderkey; the date window
    * prunes orders before the join. */
  def q4LateOrders(s: SparkSession, d: String): DataFrame = {
    val orders = t(s, d, "orders")
      .filter(col("o_orderdate") >= to_timestamp(lit("1996-01-01")) &&
        col("o_orderdate") < to_timestamp(lit("1997-01-01")))
    val late = t(s, d, "lineitem")
      .select(col("l_orderkey").as("o_orderkey"), col("l_shipdate"))
    orders
      .join(late,
        late("o_orderkey") === orders("o_orderkey") &&
          col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 60 DAYS"),
        "left_semi")
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("order_count"))
      .orderBy("o_orderpriority")
  }

  /** TPC-H Q14 shape: promo revenue share in one ship-year — CASE
    * aggregation over the lineitem⋈part equi-join (part broadcasts). */
  def q14PromoRevenue(s: SparkSession, d: String): DataFrame = {
    val li = t(s, d, "lineitem")
      .filter(col("l_shipdate") >= to_timestamp(lit("1997-01-01")) &&
        col("l_shipdate") < to_timestamp(lit("1998-01-01")))
    val rev = col("l_extendedprice") * (lit(1.0) - col("l_discount"))
    li.join(broadcast(t(s, d, "part").select("p_partkey", "p_type")),
        col("l_partkey") === col("p_partkey"))
      .agg(
        // 100.0 * s1 / s2, matching the oracle's association exactly
        // — (s1/s2)*100.0 can differ by an ulp at the rounding edge
        round(lit(100.0) * sum(when(col("p_type") === "PROMO", rev).otherwise(lit(0.0))) /
          sum(rev), 6).as("promo_revenue_pct"),
        count(lit(1)).as("n_items"))
  }

  /** DATA-QUALITY EXPECTATIONS — the dbt-test / Deequ shape: each
    * rule is an aggregate over the table producing a violation count,
    * evaluated in ONE pass per table (the rules share the scan; a
    * per-rule job at 100 TB would rescan the fact table once per
    * expectation). Rules here: primary-key uniqueness, not-null,
    * accepted value domain, referential integrity (orders.custkey ⊆
    * customer, checked as an anti-join count), and a range check. */
  def dqChecks(s: SparkSession, d: String): DataFrame = {
    val orders = t(s, d, "orders")
    // NULL semantics follow dbt's: null keys/values are the NOT-NULL
    // rule's job, so accepted-values, range, and referential rules
    // count only NON-NULL violators — matching the oracle's SQL
    // NOT IN / comparison semantics on dirty data, not just on the
    // clean corpus (round-4 review finding)
    val single = orders.agg(
      (count(lit(1)) - countDistinct(col("o_orderkey"))).as("pk_unique_o_orderkey"),
      sum(when(col("o_custkey").isNull, 1L).otherwise(0L)).as("not_null_o_custkey"),
      sum(when(col("o_orderstatus").isNotNull &&
          !col("o_orderstatus").isin("O", "F", "P"), 1L).otherwise(0L))
        .as("accepted_values_o_orderstatus"),
      sum(when(col("o_totalprice") <= 0, 1L).otherwise(0L))
        .as("positive_o_totalprice"))
    val referential = orders
      .filter(col("o_custkey").isNotNull)
      .join(t(s, d, "customer").select(col("c_custkey").as("o_custkey")),
        Seq("o_custkey"), "left_anti")
      .agg(count(lit(1)).as("n_violations"))
      .select(lit("ref_orders_customer").as("rule"), col("n_violations"))
    single
      .select(expr(
        "stack(4, 'accepted_values_o_orderstatus', accepted_values_o_orderstatus, " +
          "'not_null_o_custkey', not_null_o_custkey, " +
          "'pk_unique_o_orderkey', pk_unique_o_orderkey, " +
          "'positive_o_totalprice', positive_o_totalprice) AS (rule, n_violations)"))
      .unionByName(referential)
      .orderBy("rule")
  }

  /** A11b: SALTED SKEW JOIN — the join-side counterpart of the salted
    * aggregation: a hot key (here manufactured — half of all fact
    * rows collapse onto key 0) would put 50% of the join's shuffle
    * into ONE reducer; salting spreads the hot key across `Salt`
    * partitions by joining on (key, salt) against a dimension
    * replicated `Salt`× — bounded replication of the SMALL side buys
    * even distribution of the BIG side, the standard pre-AQE skew
    * mitigation (and still the right shape when AQE's skew-join
    * split cannot see the skew, e.g. under a downstream window). The
    * shuffle_merge hint forces the shuffle path a big-dim join would
    * take at 100 TB — broadcast would hide what the salt fixes. */
  def saltedSkewJoin(s: SparkSession, d: String): DataFrame = {
    val Salt = 8
    val ev = t(s, d, "events")
    val fact = ev.select(
      when(pmod(col("event_id"), lit(2L)) === 0, 0L)
        .otherwise(col("user_id")).as("k"),
      col("event_id"), col("event_type"), col("value"))
    val dim = ev.groupBy(col("user_id").as("k"))
      .agg(round(avg("value"), 6).as("w"))
    val saltedFact = fact
      .withColumn("salt", pmod(col("event_id"), lit(Salt.toLong)).cast("int"))
    val saltedDim = dim
      .withColumn("salt", explode(sequence(lit(0), lit(Salt - 1))))
    saltedFact
      .hint("shuffle_merge")
      .join(saltedDim, Seq("k", "salt"))
      .groupBy("event_type")
      .agg(
        count(lit(1)).as("n"),
        round(sum(col("value") * col("w")), 6).as("weighted_value"))
      .orderBy("event_type")
  }

  /** W-family: NTILE distribution tiles — equal-depth quartiles over
    * a TOTAL order (balance, custkey): the tie-break makes tile
    * assignment deterministic cross-engine, so per-tile stats are
    * hash-comparable. One window pass + one 4-key aggregation. */
  def ntileQuartiles(s: SparkSession, d: String): DataFrame =
    t(s, d, "customer")
      .select(col("c_custkey"), col("c_acctbal"),
        ntile(4).over(Window.orderBy(col("c_acctbal"), col("c_custkey"))).as("tile"))
      .groupBy("tile")
      .agg(
        count(lit(1)).as("n"),
        min("c_acctbal").as("min_bal"),
        max("c_acctbal").as("max_bal"))
      .orderBy("tile")

  /** U/F-family: UNPIVOT — a wide per-segment aggregate melted to
    * (segment, metric, value) rows via `stack` (the codegen'd
    * wide→long reshape; the inverse of the pivot query). Values are
    * cast to one double column, avg rounded before the melt. */
  def unpivotSegmentMetrics(s: SparkSession, d: String): DataFrame =
    t(s, d, "customer")
      .groupBy("c_mktsegment")
      .agg(
        count(lit(1)).cast("double").as("n"),
        round(avg("c_acctbal"), 6).as("avg_bal"),
        max("c_acctbal").cast("double").as("max_bal"))
      .select(col("c_mktsegment"), expr(
        "stack(3, 'n', n, 'avg_bal', avg_bal, 'max_bal', max_bal) AS (metric, value)"))
      .orderBy("c_mktsegment", "metric")

  /** BLOOM-FILTER SEMI-JOIN REDUCTION — the explicit form of Spark's
    * own runtime-filter shape (InjectRuntimeFilter): the build side
    * aggregates its join keys into a compact bloom sketch (a few KB
    * for millions of keys), which ships to every probe task as a
    * literal (on a cluster: a broadcast) and prunes probe rows BEFORE
    * the exact join's shuffle. At 100 TB this is the difference
    * between shuffling the whole fact table and shuffling only the
    * ~matching fraction when the build side is too large to broadcast
    * the join itself. The bloom filter admits false positives, never
    * false negatives, so the EXACT semi-join that follows keeps the
    * result precisely correct — the sketch only reduces volume.
    * Internal expressions (BloomFilterAggregate/
    * BloomFilterMightContain) are Spark's own codegen'd runtime-filter
    * machinery, reached through the same shim as the native hash
    * expressions. */
  def bloomSemiJoin(
      probe: DataFrame, build: DataFrame,
      probeKey: String, buildKey: String,
      expectedItems: Long = 1000000L): DataFrame = {
    import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal, XxHash64}
    import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
    import org.apache.spark.sql.{Column, GraftSqlShim}
    def ofExpr(e: org.apache.spark.sql.catalyst.expressions.Expression): Column =
      GraftSqlShim.column(e)
    def exprOf(c: Column): org.apache.spark.sql.catalyst.expressions.Expression =
      GraftSqlShim.expression(c)
    // build-side sketch: one partial-aggregating job, driver holds
    // only the serialized filter bytes (the same thing Spark's
    // runtime-filter subquery materializes)
    val sketch = build
      .select(ofExpr(new BloomFilterAggregate(
        new XxHash64(Seq(exprOf(build(buildKey)))), expectedItems)
        .toAggregateExpression()).as("bf"))
      .head().getAs[Array[Byte]]("bf")
    val mightContain = ofExpr(BloomFilterMightContain(
      Literal(sketch, org.apache.spark.sql.types.BinaryType),
      new XxHash64(Seq(exprOf(probe(probeKey))))))
    // sketch prune (map-side, no shuffle) → exact semi-join
    probe
      .filter(mightContain)
      .join(build.select(buildKey).distinct(),
        probe(probeKey) === build(buildKey), "left_semi")
  }

  /** Driver query: bloom semi-join reduction end to end — lineitem
    * rows pruned by a bloom sketch of the Brand#23 part keys, then
    * exactly semi-joined and aggregated. The oracle is the plain
    * semi-join aggregate, so a sketch that dropped a TRUE match
    * (false negative — impossible for a correct bloom filter) would
    * hash-mismatch loudly; PlanContractSpec asserts the
    * might_contain prune sits in the scan stage. */
  def bloomPruneLineitem(s: SparkSession, d: String): DataFrame = {
    val li = t(s, d, "lineitem")
    val parts = t(s, d, "part").filter(col("p_brand") === "Brand#23")
    bloomSemiJoin(li, parts, "l_partkey", "p_partkey", expectedItems = 65536L)
      .groupBy("l_returnflag")
      .agg(
        count(lit(1)).as("n"),
        round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 6)
          .as("revenue"))
      .orderBy("l_returnflag")
  }

  /** TPC-H Q6 shape (forecast revenue change): the pure
    * filter-and-sum scan — every predicate pushes to the parquet
    * reader, no joins, one partial-agg reduction. The query that
    * measures scan + pushdown efficiency and nothing else. */
  def q6ForecastRevenue(s: SparkSession, d: String): DataFrame =
    t(s, d, "lineitem")
      .filter(col("l_shipdate") >= to_timestamp(lit("1996-01-01")) &&
        col("l_shipdate") < to_timestamp(lit("1997-01-01")) &&
        col("l_discount").between(0.05, 0.07) && col("l_quantity") < 24)
      .agg(
        round(sum(col("l_extendedprice") * col("l_discount")), 6).as("revenue"),
        count(lit(1)).as("n_lines"))

  /** TPC-H Q9 shape (product-type profit): the deep join tree —
    * lineitem ⋈ orders (the one big-big shuffle join) with part /
    * supplier / nation broadcast, profit per supplier nation per
    * order year. The driver schema has no partsupp, so supply cost is
    * the deterministic stand-in 0.6·p_retailprice (same double math
    * both engines). */
  def q9ProductProfit(s: SparkSession, d: String): DataFrame =
    t(s, d, "lineitem")
      .join(broadcast(t(s, d, "part")
        .filter(col("p_type") === "STANDARD")
        .select("p_partkey", "p_retailprice")),
        col("l_partkey") === col("p_partkey"))
      .join(t(s, d, "orders").select("o_orderkey", "o_orderdate"),
        col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(t(s, d, "supplier").select("s_suppkey", "s_nationkey")),
        col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(t(s, d, "nation").select("n_nationkey", "n_name")),
        col("s_nationkey") === col("n_nationkey"))
      .withColumn("o_year", year(col("o_orderdate")))
      .groupBy("n_name", "o_year")
      .agg(round(sum(
        col("l_extendedprice") * (lit(1.0) - col("l_discount")) -
          lit(0.6) * col("p_retailprice") * col("l_quantity")), 6)
        .as("sum_profit"))
      .select(col("n_name").as("nation"), col("o_year"), col("sum_profit"))
      .orderBy(col("nation"), col("o_year").desc)

  /** TPC-H Q17 shape (small-quantity-order revenue): the correlated
    * per-part average, decorrelated into a per-part aggregate joined
    * back. The textbook predicate `l_quantity < 0.2 · avg(quantity)`
    * is a FLOAT boundary that partial-agg summation order could flip;
    * quantities are integral, so it is reformulated exactly as the
    * all-integer `5 · quantity · count < sum_quantity`. */
  def q17SmallQuantityRevenue(s: SparkSession, d: String): DataFrame = {
    val li = t(s, d, "lineitem")
      .select("l_partkey", "l_quantity", "l_extendedprice")
    val perPart = li.groupBy("l_partkey").agg(
      sum(col("l_quantity").cast("long")).as("sq"),
      count(lit(1)).as("cnt"))
    li
      .join(broadcast(t(s, d, "part")
        .filter(col("p_brand") === "Brand#23" && col("p_size") <= 10)
        .select("p_partkey")),
        col("l_partkey") === col("p_partkey"))
      .join(perPart, Seq("l_partkey"))
      .filter(lit(5) * col("l_quantity").cast("long") * col("cnt") < col("sq"))
      .agg(round(sum("l_extendedprice") / 7.0, 6).as("avg_yearly"),
        count(lit(1)).as("n_lines"))
  }

  /** TPC-H Q21 shape (suppliers who kept orders waiting): the double
    * correlation — orders with at least two suppliers where EXACTLY
    * ONE shipped late (> 60 days after order date, the schema's
    * lateness notion as in Q4). The EXISTS / NOT EXISTS pair
    * decorrelates into one per-order aggregate (distinct suppliers,
    * distinct late suppliers) joined back to the late lines; output
    * is the top-20 suppliers by waiting count under a total order. */
  def q21WaitingSuppliers(s: SparkSession, d: String): DataFrame = {
    val late = col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 60 DAYS")
    val lo = t(s, d, "lineitem")
      .select("l_orderkey", "l_suppkey", "l_shipdate")
      .join(t(s, d, "orders").select("o_orderkey", "o_orderdate"),
        col("l_orderkey") === col("o_orderkey"))
    val perOrder = lo.groupBy("l_orderkey").agg(
      countDistinct("l_suppkey").as("nsupp"),
      countDistinct(when(late, col("l_suppkey"))).as("nlate"))
    lo.filter(late)
      .join(perOrder.filter(col("nsupp") >= 2 && col("nlate") === 1),
        Seq("l_orderkey"))
      .select("l_orderkey", "l_suppkey").distinct()
      .join(broadcast(t(s, d, "supplier").select("s_suppkey", "s_name")),
        col("l_suppkey") === col("s_suppkey"))
      .groupBy("s_name")
      .agg(count(lit(1)).as("numwait"))
      .orderBy(col("numwait").desc, col("s_name"))
      .limit(20)
  }

  /** TPC-H Q8 shape (national market share): of the revenue on
    * ECONOMY-type parts ordered by ASIA-region customers in
    * 1996–1997, the fraction supplied by NATION_7, per order year.
    * Join posture mirrors q5: lineitem⋈orders and orders⋈customer
    * are the two fact shuffles; part (filtered), both nation copies,
    * region, and supplier broadcast. The share is a single
    * conditional-sum ratio per year — partial aggregation collapses
    * everything before the one groupBy shuffle, and the division
    * happens once per output row, rounded after (q14's float rule). */
  def q8MarketShare(s: SparkSession, d: String): DataFrame = {
    val vol = col("l_extendedprice") * (lit(1.0) - col("l_discount"))
    t(s, d, "lineitem")
      .select("l_orderkey", "l_partkey", "l_suppkey",
        "l_extendedprice", "l_discount")
      .join(broadcast(t(s, d, "part")
        .filter(col("p_type") === "ECONOMY").select("p_partkey")),
        col("l_partkey") === col("p_partkey"))
      .join(t(s, d, "orders")
        .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
          col("o_orderdate") < lit("1998-01-01").cast("timestamp"))
        .select("o_orderkey", "o_custkey", "o_orderdate"),
        col("l_orderkey") === col("o_orderkey"))
      .join(t(s, d, "customer").select("c_custkey", "c_nationkey"),
        col("o_custkey") === col("c_custkey"))
      .join(broadcast(t(s, d, "nation")
        .select(col("n_nationkey").as("cn_key"), col("n_regionkey"))),
        col("c_nationkey") === col("cn_key"))
      .join(broadcast(t(s, d, "region")
        .filter(col("r_name") === "ASIA").select("r_regionkey")),
        col("n_regionkey") === col("r_regionkey"))
      .join(broadcast(t(s, d, "supplier").select("s_suppkey", "s_nationkey")),
        col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(t(s, d, "nation")
        .select(col("n_nationkey").as("sn_key"), col("n_name").as("supp_nation"))),
        col("s_nationkey") === col("sn_key"))
      .withColumn("o_year", year(col("o_orderdate")))
      .groupBy("o_year")
      .agg(
        round(sum(when(col("supp_nation") === "NATION_7", vol).otherwise(0.0)) /
          sum(vol), 6).as("mkt_share"),
        count(lit(1)).as("n_lines"))
      .orderBy("o_year")
  }

  /** TPC-H Q15 shape (top supplier): the revenue "view" is a
    * per-supplier aggregate over one ship-date quarter; the top
    * supplier(s) are those whose revenue equals the global max —
    * the classic scalar-subquery-on-an-aggregate. One groupBy
    * shuffle builds the view, the max comes back as a broadcast
    * single row, and the selection is a map-side equality — no
    * global sort, no second pass over lineitem. Revenue is ROUNDED
    * before the max/equality (the repo's sum-of-doubles rule) so
    * both engines compare the identical decimal. */
  def q15TopSupplier(s: SparkSession, d: String): DataFrame = {
    val rev = t(s, d, "lineitem")
      .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1996-04-01").cast("timestamp"))
      .groupBy("l_suppkey")
      .agg(round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 6)
        .as("total_revenue"))
    rev
      .join(broadcast(rev.agg(max(col("total_revenue")).as("mx"))),
        col("total_revenue") === col("mx"))
      .join(broadcast(t(s, d, "supplier").select("s_suppkey", "s_name")),
        col("l_suppkey") === col("s_suppkey"))
      .select(col("s_suppkey"), col("s_name"), col("total_revenue"))
      .orderBy("s_name")
  }

  /** TPC-H Q2 shape (minimum-cost supplier): the correlated scalar
    * subquery `cost = (SELECT min(cost) … WHERE partkey = p_partkey
    * AND region)` decorrelated into a per-part min aggregate joined
    * back — the min-rejoin pattern, the only shape that survives
    * 100 TB (per-row correlated execution would re-scan the supply
    * relation per part). The driver corpus has no partsupp table, so
    * the supply relation is DERIVED: per (partkey, suppkey) the
    * minimum observed unit price from lineitem — same keys, same
    * role. Unit cost is ROUNDED before the min/equality (q15's rule)
    * so both engines compare the identical decimal; supplier, nation,
    * region broadcast; output carries a total tie-break order. */
  def q2MinCostSupplier(s: SparkSession, d: String): DataFrame = {
    val ps = t(s, d, "lineitem")
      .groupBy("l_partkey", "l_suppkey")
      .agg(round(min(col("l_extendedprice") / col("l_quantity")), 6).as("cost"))
    val rps = ps
      .join(broadcast(t(s, d, "supplier")
        .select("s_suppkey", "s_name", "s_acctbal", "s_nationkey")),
        col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(t(s, d, "nation")
        .select("n_nationkey", "n_name", "n_regionkey")),
        col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(t(s, d, "region")
        .filter(col("r_name") === "EUROPE").select("r_regionkey")),
        col("n_regionkey") === col("r_regionkey"))
    val minCost = rps.groupBy(col("l_partkey").as("mc_partkey"))
      .agg(min(col("cost")).as("mincost"))
    rps
      .join(minCost,
        col("l_partkey") === col("mc_partkey") && col("cost") === col("mincost"))
      .join(broadcast(t(s, d, "part")
        .filter(col("p_type") === "STANDARD" && col("p_size").between(10, 20))
        .select("p_partkey", "p_brand")),
        col("l_partkey") === col("p_partkey"))
      .select("s_acctbal", "s_name", "n_name", "p_partkey", "p_brand")
      .orderBy(col("s_acctbal").desc, col("p_partkey"), col("s_name"))
      .limit(100)
  }

  /** TPC-H Q11 shape (important stock identification): a per-part
    * value aggregate over one nation's supply lines, kept only where
    * the group exceeds a FRACTION of the global total — the
    * scalar-subquery HAVING. The textbook `value > 0.0001 · total` is
    * a float boundary that summation order could flip, so value is
    * the INTEGRAL quantity sum and the threshold the all-integer
    * `1000 · value > total` — exact in both engines (q17's
    * reformulation rule). One partkey shuffle builds the groups; the
    * total comes back as a broadcast single row; suppliers of the
    * nation reach lineitem as a broadcast semi-join. */
  def q11ImportantStock(s: SparkSession, d: String): DataFrame = {
    val pv = t(s, d, "lineitem")
      .join(broadcast(t(s, d, "supplier")
        .filter(col("s_nationkey") === 3).select("s_suppkey")),
        col("l_suppkey") === col("s_suppkey"), "left_semi")
      .groupBy("l_partkey")
      .agg(sum(col("l_quantity").cast("long")).as("qty_value"))
    pv.crossJoin(broadcast(pv.agg(sum("qty_value").as("total"))))
      .filter(lit(1000L) * col("qty_value") > col("total"))
      .select("l_partkey", "qty_value")
      .orderBy(col("qty_value").desc, col("l_partkey"))
  }

  /** TPC-H Q16 shape (supplier count by part attributes): distinct
    * suppliers per (brand, type, size) over the derived supply
    * relation, EXCLUDING a blacklist via anti-join — the NOT IN
    * subquery shape (anti-join, never a NOT IN over a nullable
    * column). The complaint filter has no comment column to LIKE
    * over, so the blacklist is negative-balance suppliers — same
    * role: a supplier-side exclusion subquery. countDistinct is the
    * one expensive aggregate; it shuffles (brand,type,size) with the
    * suppkey carried, all integer/count arithmetic — exact. */
  def q16SupplierCountByPart(s: SparkSession, d: String): DataFrame =
    t(s, d, "lineitem").select("l_partkey", "l_suppkey").distinct()
      .join(broadcast(t(s, d, "supplier")
        .filter(col("s_acctbal") < 0.0).select(col("s_suppkey"))),
        col("l_suppkey") === col("s_suppkey"), "left_anti")
      .join(broadcast(t(s, d, "part")
        .filter(col("p_brand") =!= "Brand#23" && col("p_type") =!= "PROMO" &&
          col("p_size").isin(1, 4, 9, 14, 19, 23, 36, 45))
        .select("p_partkey", "p_brand", "p_type", "p_size")),
        col("l_partkey") === col("p_partkey"))
      .groupBy("p_brand", "p_type", "p_size")
      .agg(countDistinct("l_suppkey").as("supplier_cnt"))
      .orderBy(col("supplier_cnt").desc, col("p_brand"), col("p_type"),
        col("p_size"))

  /** TPC-H Q20 shape (potential part promotion): the nested
    * IN-subquery chain — suppliers IN (supply rows whose available
    * quantity beats half a correlated shipped-quantity subquery) for
    * parts IN (a name-prefix filter) — decorrelated into one derived
    * per-(part,supplier) aggregate and two semi-joins. No availqty
    * column exists, so the "more than half" predicate compares the
    * pair's 1996 shipments against its ALL-TIME volume (2·q96 > qall,
    * all-integer, exact), with a volume floor so the answer means
    * "suppliers who concentrated meaningful volume into 1996".
    * Region-filtered suppliers broadcast; output is the supplier
    * list, totally ordered. */
  def q20PromotionSuppliers(s: SparkSession, d: String): DataFrame = {
    val y96 = col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
      col("l_shipdate") < lit("1997-01-01").cast("timestamp")
    val pssum = t(s, d, "lineitem")
      .join(broadcast(t(s, d, "part")
        .filter(col("p_name").startsWith("small")).select("p_partkey")),
        col("l_partkey") === col("p_partkey"), "left_semi")
      .groupBy("l_partkey", "l_suppkey")
      .agg(
        sum(when(y96, col("l_quantity").cast("long")).otherwise(0L)).as("q96"),
        sum(col("l_quantity").cast("long")).as("qall"))
    t(s, d, "supplier")
      .join(broadcast(t(s, d, "nation").select("n_nationkey", "n_regionkey")),
        col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(t(s, d, "region")
        .filter(col("r_name") === "EUROPE").select("r_regionkey")),
        col("n_regionkey") === col("r_regionkey"))
      .join(pssum
        .filter(lit(2L) * col("q96") > col("qall") && col("qall") >= 60L)
        .select(col("l_suppkey")),
        col("s_suppkey") === col("l_suppkey"), "left_semi")
      .select("s_suppkey", "s_name", "s_acctbal")
      .orderBy("s_name")
  }

  /** A12b APPROXIMATE QUANTILES — the sketch that replaces exact
    * percentiles at 100 TB: `percentile_approx` is Spark's
    * Greenwald–Khanna summary, a MERGEABLE fixed-size state with a
    * guaranteed rank error ≤ 1/accuracy — partial-aggregatable like
    * any algebraic function, where the exact percentile family
    * ([[quantileQuantity]]) is holistic and must see every value.
    * The returned VALUES are engine-specific, so the declared query
    * is the ORACLE-GATED form (round-10 verdict ask #3): per group,
    * the exact row count plus one BOOLEAN per quantile asserting the
    * sketch value's RANK sits within the guaranteed ±1/accuracy
    * window — verified in-query by counting rows below/at the sketch
    * value (one broadcast join of the 5-row sketch frame back onto
    * events, two conditional counts per quantile). The oracle asserts
    * the booleans as literal `true` and recomputes `n` exactly; the
    * raw sketch values stay available via [[approxQuantilesRaw]]. */
  def approxQuantiles(s: SparkSession, d: String, accuracy: Int = 100): DataFrame = {
    val phis = Seq(0.25 -> "q25", 0.5 -> "q50", 0.75 -> "q75", 0.9 -> "q90")
    val sk = t(s, d, "events")
      .groupBy("event_type")
      .agg(percentile_approx(col("value"),
        array(phis.map(p => lit(p._1)): _*), lit(accuracy)).as("qs"))
    val eps = 1.0 / accuracy
    val rankCols = phis.zipWithIndex.flatMap { case ((_, nm), i) =>
      Seq(
        sum(when(col("value") < col("qs")(i), 1L).otherwise(0L)).as(s"${nm}_lt"),
        sum(when(col("value") <= col("qs")(i), 1L).otherwise(0L)).as(s"${nm}_le"))
    }
    t(s, d, "events")
      .join(broadcast(sk), Seq("event_type"))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"), rankCols: _*)
      .select(col("event_type") +: col("n") +: phis.map { case (phi, nm) =>
        ((col(s"${nm}_lt").cast("double") <= (lit(phi) + eps) * col("n") + 1) &&
          (col(s"${nm}_le").cast("double") >= (lit(phi) - eps) * col("n") - 1))
          .as(s"${nm}_ok")
      }: _*)
      .orderBy("event_type")
  }

  /** The production form of [[approxQuantiles]] — sketch values only
    * (mergeable fixed-size state; what actually runs at 100 TB). */
  def approxQuantilesRaw(s: SparkSession, d: String, accuracy: Int = 100): DataFrame =
    t(s, d, "events")
      .groupBy("event_type")
      .agg(
        count(lit(1)).as("n"),
        percentile_approx(col("value"),
          array(lit(0.25), lit(0.5), lit(0.75), lit(0.9)), lit(accuracy))
          .as("qs"))
      .select(col("event_type"), col("n"),
        col("qs")(0).as("q25"), col("qs")(1).as("q50"),
        col("qs")(2).as("q75"), col("qs")(3).as("q90"))
      .orderBy("event_type")

  /** L9 K-ANONYMITY AUDIT — the governance-side complement of
    * [[dqChecks]]: group the corpus by its quasi-identifier tuple
    * (lang, source, length bucket) and flag groups smaller than k=5,
    * whose members are re-identification risks if the dataset is
    * released with those attributes. ONE hash aggregate over the
    * corpus (partial-agg friendly); the risk flag is an integer
    * compare on the group row itself, so the audit output is bounded
    * by the quasi-identifier domain, never the corpus size. */
  def kAnonymityAudit(s: SparkSession, d: String, k: Int = 5): DataFrame =
    t(s, d, "documents")
      .groupBy(col("lang"), col("source"),
        expr("CAST(n_chars DIV 100 AS INT)").as("len_bucket"))
      .agg(count(lit(1)).as("n_docs"))
      .select(col("lang"), col("source"), col("len_bucket"), col("n_docs"),
        (col("n_docs") < k).as("at_risk"))
      .orderBy("lang", "source", "len_bucket")
}
