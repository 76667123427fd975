package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types.DecimalType

/** Relational core of the engine (SURVEY §2.2-2.4, §2.6 patterns):
  * aggregation with map-side partials, broadcast joins, windows,
  * semi/anti joins, rollup. Each query has a DuckDB oracle in
  * [[graft.SparkEntry.oracleSql]].
  *
  * Numeric determinism: double sums are order-dependent, so every money
  * aggregate casts to DECIMAL(18,2) first (exact, associative) and casts
  * the final result back to double — both engines then agree bit-for-bit.
  */
object RelationalQueries {

  private def t(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  private def dec(c: org.apache.spark.sql.Column) = c.cast(DecimalType(18, 2))

  /** A1-style global aggregation with multiple measures (pricing summary).
    * Shuffle: one hash-agg keyed by the 2 flag columns — partial agg
    * map-side, 6 groups total.
    */
  def q1Agg(spark: SparkSession, dir: String): DataFrame = {
    val li = t(spark, dir, "lineitem")
    li.groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        sum(dec(col("l_quantity"))).cast("double").as("sum_qty"),
        sum(dec(col("l_extendedprice"))).cast("double").as("sum_base_price"),
        sum(dec(col("l_extendedprice")) * (lit(1).cast(DecimalType(18, 2)) -
          dec(col("l_discount")))).cast("double").as("sum_disc_price"),
        (sum(dec(col("l_quantity"))).cast("double") / count(lit(1))).as("avg_qty"),
        count(lit(1)).as("count_order"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))
  }

  /** Broadcast-join chain: fact orders joined to small dims customer ⋈
    * nation ⋈ region; revenue per nation. customer/nation/region are dim
    * tables → explicit broadcast; agg partials map-side.
    */
  def q2JoinAgg(spark: SparkSession, dir: String): DataFrame = {
    val o = t(spark, dir, "orders")
    val c = t(spark, dir, "customer")
    val n = t(spark, dir, "nation")
    val r = t(spark, dir, "region")
    o.join(broadcast(c), o("o_custkey") === c("c_custkey"))
      .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
      .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
      .groupBy(col("r_name"), col("n_name"))
      .agg(
        sum(dec(col("o_totalprice"))).cast("double").as("revenue"),
        count(lit(1)).as("n_orders"))
      .orderBy(col("r_name"), col("n_name"))
  }

  /** K3/K4-style ranked selection: top-3 orders per market segment
    * (row_number window with deterministic tiebreak).
    */
  def q3TopkWindow(spark: SparkSession, dir: String): DataFrame = {
    val o = t(spark, dir, "orders")
    val c = t(spark, dir, "customer")
    val w = Window.partitionBy(col("c_mktsegment"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    o.join(broadcast(c), o("o_custkey") === c("c_custkey"))
      .withColumn("rn", row_number().over(w).cast("long"))
      .filter(col("rn") <= 3)
      .select(col("c_mktsegment"), col("rn"), col("o_orderkey"),
        dec(col("o_totalprice")).cast("double").as("o_totalprice"))
      .orderBy(col("c_mktsegment"), col("rn"))
  }

  /** Left-semi join (EXISTS): customers having at least one order, counted
    * per segment.
    */
  def q4Semi(spark: SparkSession, dir: String): DataFrame = {
    val o = t(spark, dir, "orders")
    val c = t(spark, dir, "customer")
    c.join(o, c("c_custkey") === o("o_custkey"), "left_semi")
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("n_customers"))
      .orderBy(col("c_mktsegment"))
  }

  /** Left-anti join (NOT EXISTS): customers with no urgent orders. */
  def q5Anti(spark: SparkSession, dir: String): DataFrame = {
    val o = t(spark, dir, "orders")
      .filter(col("o_orderpriority") === "1-URGENT")
    val c = t(spark, dir, "customer")
    c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
      .select(col("c_custkey"), col("c_name"), col("c_mktsegment"))
      .orderBy(col("c_custkey"))
  }

  /** Selective filter + projection (predicate pushdown to parquet — the
    * scan reads 3 columns and `PushedFilters` shows the range predicate).
    */
  def q6Filter(spark: SparkSession, dir: String): DataFrame = {
    val li = t(spark, dir, "lineitem")
    li.filter(col("l_discount") >= 0.05 && col("l_discount") <= 0.07 &&
        col("l_quantity") < 24)
      .agg(sum(dec(col("l_extendedprice")) * dec(col("l_discount")))
        .cast("double").as("revenue"),
        count(lit(1)).as("n_rows"))
  }

  /** Scalar extraction from a JSON-ish column via regexp (F-series string
    * ops; stays in whole-stage codegen).
    */
  def q7Json(spark: SparkSession, dir: String): DataFrame = {
    val e = t(spark, dir, "events")
    e.withColumn("k", regexp_extract(col("props"), "[0-9]+", 0).cast("long"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("k")).as("sum_k"),
        min(col("k")).as("min_k"),
        max(col("k")).as("max_k"))
      .orderBy(col("event_type"))
  }

  /** Running (prefix) aggregation per user ordered by time — the
    * reference's sequential streaming counters (A9/T1) as a window frame.
    * Decimal-exact running sum keeps both engines bit-identical.
    */
  def q8Running(spark: SparkSession, dir: String): DataFrame = {
    val e = t(spark, dir, "events")
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    e.withColumn("running_value", sum(dec(col("value"))).over(w).cast("double"))
      .select(col("user_id"), col("event_id"), col("running_value"))
      .orderBy(col("user_id"), col("event_id"))
  }

  /** Rollup (A2-style histogram with subtotal tiers). NULLS FIRST ordering
    * matches Spark's asc default; oracle says NULLS FIRST explicitly.
    */
  def q9Rollup(spark: SparkSession, dir: String): DataFrame = {
    val o = t(spark, dir, "orders")
    val c = t(spark, dir, "customer")
    val n = t(spark, dir, "nation")
    o.join(broadcast(c), o("o_custkey") === c("c_custkey"))
      .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
      .rollup(col("n_name"), col("o_orderpriority"))
      .agg(count(lit(1)).as("n_orders"),
        sum(dec(col("o_totalprice"))).cast("double").as("revenue"))
      .orderBy(col("n_name").asc_nulls_first, col("o_orderpriority").asc_nulls_first)
  }

  /** Time-bucketed aggregation (tumbling 1-hour windows, batch form of the
    * T1 streaming phases; the bucket arithmetic is identical to the
    * Structured Streaming `window()` start).
    */
  def q10TimeBucket(spark: SparkSession, dir: String): DataFrame = {
    val e = t(spark, dir, "events")
    e.withColumn("bucket",
        (floor(unix_timestamp(col("ts")) / 3600) * 3600).cast("long"))
      .groupBy(col("bucket"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(dec(col("value"))).cast("double").as("sum_value"))
      .orderBy(col("bucket"), col("event_type"))
  }

  /** AS-OF join via the engine's custom planner operator
    * ([[graft.plans.AsofJoin]] — Spark has no native as-of join): each
    * purchase event joined to the user's latest click at-or-before it.
    * The oracle is DuckDB's NATIVE `ASOF JOIN`, so the custom physical
    * operator is driver-gated against an independent first-class
    * implementation. (user_id, ts) is unique in the events table, so
    * the match is deterministic.
    */
  def q11Asof(spark: SparkSession, dir: String): DataFrame = {
    val ev = t(spark, dir, "events")
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts"),
        col("event_id").as("purchase_id"))
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id"), col("ts"), col("event_id").as("click_id"))
    graft.plans.AsofJoinApi.asofJoin(purchases, clicks,
        keys = Seq("user_id"), ts = "ts")
      .toDF("user_id", "p_ts", "purchase_id", "r_user_id", "c_ts",
        "click_id")
      .select(col("purchase_id"), col("user_id"), col("p_ts"),
        col("click_id"), col("c_ts"))
      .orderBy(col("purchase_id"))
  }

  /** Left-outer as-of (pandas merge_asof default): every signup keeps a
    * row; users with no prior click get null right columns. Oracle:
    * DuckDB's native `ASOF LEFT JOIN`.
    */
  def q12AsofOuter(spark: SparkSession, dir: String): DataFrame = {
    val ev = t(spark, dir, "events")
    val signups = ev.filter(col("event_type") === "signup")
      .select(col("user_id"), col("ts"), col("event_id").as("signup_id"))
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id"), col("ts"), col("event_id").as("click_id"))
    graft.plans.AsofJoinApi.asofJoin(signups, clicks,
        keys = Seq("user_id"), ts = "ts", outer = true)
      .toDF("user_id", "s_ts", "signup_id", "r_user_id", "c_ts",
        "click_id")
      .select(col("signup_id"), col("user_id"), col("s_ts"),
        col("click_id"), col("c_ts"))
      .orderBy(col("signup_id"))
  }

  /** Gap-based sessionization over the event stream ([[graft.plans
    * .Sessionize]]): 30-minute inactivity cut per user, one summary row
    * per session. One user-keyed exchange total (the groupBy reuses the
    * window's partitioning). Oracle replays the break-flag → prefix-sum
    * formulation with `epoch_us` integer gap arithmetic.
    */
  def q13Session(spark: SparkSession, dir: String): DataFrame = {
    val e = t(spark, dir, "events")
    graft.plans.Sessionize.withSessionIdx(e, "user_id", "ts",
        "event_id", 1800L)
      .groupBy(col("user_id"), col("session_idx"))
      .agg(count(lit(1)).as("n_events"),
        min(col("ts")).as("start_ts"),
        max(col("ts")).as("end_ts"),
        sum(dec(col("value"))).cast("double").as("sum_value"))
      .orderBy(col("user_id"), col("session_idx"))
  }

  /** Range (interval) join via the bucket-exploded equi-join
    * ([[graft.plans.RangeJoinApi]]): every purchase falling inside any
    * signup's 2-hour attribution window, across ALL users (a genuine
    * unkeyed containment join — the naive plan is a broadcast
    * nested-loop over |purchases|x|signups|). Oracle is DuckDB's native
    * inequality join, so the bucketed rewrite is gated against an
    * independent range-join implementation.
    */
  def q14Range(spark: SparkSession, dir: String): DataFrame = {
    val ev = t(spark, dir, "events")
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"), col("ts").as("p_ts"))
    val windows = ev.filter(col("event_type") === "signup")
      .select(col("event_id").as("signup_id"),
        col("ts").as("w_start"),
        (col("ts") + expr("INTERVAL 2 HOURS")).as("w_end"))
    graft.plans.RangeJoinApi.intervalJoin(purchases, windows,
        tsCol = "p_ts", startCol = "w_start", endCol = "w_end",
        bucketSeconds = 3600L)
      .select(col("purchase_id"), col("p_ts"), col("signup_id"),
        col("w_start"))
      .orderBy(col("purchase_id"), col("signup_id"))
  }

  /** PIVOT — long-to-wide reshaping, the one OLAP form Catalyst plans
    * specially (a single-pass conditional aggregation over the pivot
    * value list, NOT one scan per column): yearly revenue by order
    * status. Values are enumerated explicitly (`Seq("F","O","P")`) so
    * the plan skips the extra distinct-values job Spark otherwise runs,
    * and the oracle replays each cell as a FILTERed aggregate. Money
    * sums go through DECIMAL(18,2) per the q1 exactness convention;
    * absent cells coalesce to 0 on both sides.
    */
  def q15Pivot(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "orders")
      .select(year(col("o_orderdate")).cast("long").as("yr"),
        col("o_orderstatus"),
        col("o_totalprice").cast("decimal(18,2)").as("tp"))
      .groupBy("yr").pivot("o_orderstatus", Seq("F", "O", "P"))
      .agg(sum(col("tp")))
      .select(col("yr"),
        coalesce(col("F").cast("double"), lit(0.0)).as("f_rev"),
        coalesce(col("O").cast("double"), lit(0.0)).as("o_rev"),
        coalesce(col("P").cast("double"), lit(0.0)).as("p_rev"))
      .orderBy("yr")

  /** CUBE over (nation, order status) with an explicit grouping id —
    * the full 2^k grouping-sets lattice q9's ROLLUP only walks one
    * chain of, plus the GROUPING() disambiguator that separates a
    * genuine NULL group key from a subtotal row (the semantics
    * downstream BI relies on). Money sums through DECIMAL(18,2) per
    * the q1 exactness convention; gid = grouping(n_name)·2 +
    * grouping(status) replays verbatim in DuckDB.
    */
  def q16Cube(spark: SparkSession, dir: String): DataFrame = {
    val o = t(spark, dir, "orders")
    val c = t(spark, dir, "customer")
    val n = t(spark, dir, "nation")
    o.join(broadcast(c), o("o_custkey") === c("c_custkey"))
      .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
      .cube(col("n_name"), col("o_orderstatus"))
      .agg(count(lit(1)).as("n_orders"),
        sum(dec(col("o_totalprice"))).cast("double").as("revenue"),
        (grouping(col("n_name")) * 2 + grouping(col("o_orderstatus")))
          .cast("long").as("gid"))
      .orderBy(col("gid"), col("n_name").asc_nulls_first,
        col("o_orderstatus").asc_nulls_first)
  }

  /** Per-nation customer-spend quartiles: NTILE(4) plus an integer
    * percent-rank replay over the (spend DESC, custkey) total order —
    * the deterministic tie-break makes both engines' standard NTILE
    * (first buckets take the remainder) assign identically, and
    * pr_micro = (rn−1)·10^6 div (cnt−1) avoids PERCENT_RANK's float.
    *
    * Scale shape: one map-side-combined spend agg, one broadcast dim
    * join, one nation-PARTITIONED window (no global sort — the global
    * quantile readout at corpus scale is sketch_quantile's job); the
    * final orderBy is the driver-compare convention only.
    */
  def q17Ntile(spark: SparkSession, dir: String): DataFrame = {
    val o = t(spark, dir, "orders")
    val c = t(spark, dir, "customer")
    val spend = o.groupBy(col("o_custkey"))
      .agg(sum(dec(col("o_totalprice"))).as("spend"))
    val w = Window.partitionBy(col("c_nationkey"))
      .orderBy(col("spend").desc, col("c_custkey"))
    val wn = Window.partitionBy(col("c_nationkey"))
    spend.join(broadcast(c), col("o_custkey") === col("c_custkey"))
      .select(col("c_custkey"), col("c_nationkey"), col("spend"))
      .withColumn("quartile", ntile(4).over(w).cast("long"))
      .withColumn("rn", row_number().over(w).cast("long"))
      .withColumn("cnt", count(lit(1)).over(wn))
      .select(col("c_custkey"), col("c_nationkey"),
        col("spend").cast("double").as("spend"), col("quartile"),
        when(col("cnt") > 1,
            expr("(rn - 1) * 1000000 div (cnt - 1)"))
          .otherwise(0L).as("pr_micro"))
      .orderBy("c_custkey")
  }

  /** LAG inter-event gaps: per-user summary of the time deltas between
    * consecutive events (the session-cadence profile q13's sessionizer
    * cuts on). Gap arithmetic is exact epoch-microsecond integers
    * (`unix_micros` ↔ DuckDB `epoch_us`), so min/max/sum replay
    * bit-for-bit; a single-event user keeps NULL gap stats on both
    * engines.
    *
    * Scale shape: ONE user-keyed exchange end-to-end — the groupBy
    * reuses the lag window's hashpartitioning(user_id) (the q13
    * subset-of-clustering-keys rule), so corpus-scale event history
    * shuffles exactly once.
    */
  def q18Lag(spark: SparkSession, dir: String): DataFrame = {
    val e = t(spark, dir, "events")
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    // ts is TIMESTAMP_NTZ in the parquet; with the session TZ pinned to
    // UTC the cast is identity and matches DuckDB's epoch_us
    e.withColumn("us", unix_micros(col("ts").cast("timestamp")))
      .withColumn("gap_us", col("us") - lag(col("us"), 1).over(w))
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_events"),
        count(col("gap_us")).as("n_gaps"),
        min(col("gap_us")).as("min_gap_us"),
        max(col("gap_us")).as("max_gap_us"),
        sum(col("gap_us")).as("sum_gap_us"))
      .orderBy("user_id")
  }

  /** Exact per-group median without an engine `median()` (whose
    * interpolation/typing rules differ across engines): the two middle
    * rows are selected by ROW_NUMBER against the group count —
    * rn = (cnt+1) div 2 and (cnt+2) div 2 coincide for odd groups —
    * and the median is reassembled as SUM(mid)·(3−|mid|)/2, exact in
    * DECIMAL(18,2) until the final halving (a power-of-two double op,
    * also exact). Ties on price are broken by orderkey; the tiebreak
    * cannot change the selected VALUES, only which duplicate carries
    * them.
    *
    * Scale shape: one segment-keyed exchange (window + filter); the
    * middle-row filter is rank-based, so Spark 4's
    * InsertWindowGroupLimits cannot bound it — at corpus scale the
    * exact-median operator necessarily sorts each group once, which is
    * why the streaming/monitoring tier uses sketch_quantile instead.
    */
  def q19Median(spark: SparkSession, dir: String): DataFrame = {
    val o = t(spark, dir, "orders")
    val c = t(spark, dir, "customer")
    val j = o.join(broadcast(c), o("o_custkey") === c("c_custkey"))
      .select(col("c_mktsegment"), dec(col("o_totalprice")).as("tp"),
        col("o_orderkey"))
    val w = Window.partitionBy(col("c_mktsegment"))
      .orderBy(col("tp"), col("o_orderkey"))
    val wn = Window.partitionBy(col("c_mktsegment"))
    j.withColumn("rn", row_number().over(w).cast("long"))
      .withColumn("cnt", count(lit(1)).over(wn))
      .filter(expr("rn = (cnt + 1) div 2 OR rn = (cnt + 2) div 2"))
      .groupBy(col("c_mktsegment"))
      .agg(max(col("cnt")).as("n_orders"),
        (sum(col("tp")) * (lit(3) - count(lit(1)))).as("med2"))
      .select(col("c_mktsegment"), col("n_orders"),
        (col("med2").cast("double") / 2.0).as("median"))
      .orderBy("c_mktsegment")
  }

  /** Set operators INTERSECT / EXCEPT: users who both clicked and
    * purchased vs users who clicked but never purchased. Catalyst plans
    * these as aggregate + left-semi / left-anti joins (set semantics,
    * distinct built in), i.e. the same shuffle shape as q4/q5 with the
    * dedup fused — no distinct pre-pass needed on either input.
    */
  def q20Setops(spark: SparkSession, dir: String): DataFrame = {
    val e = t(spark, dir, "events")
    val clickers = e.filter(col("event_type") === "click")
      .select(col("user_id"))
    val purchasers = e.filter(col("event_type") === "purchase")
      .select(col("user_id"))
    val both = clickers.intersect(purchasers)
      .select(lit("click_and_purchase").as("tag"), col("user_id"))
    val onlyClick = clickers.except(purchasers)
      .select(lit("click_only").as("tag"), col("user_id"))
    both.union(onlyClick).orderBy("tag", "user_id")
  }

  /** Exact distributed Pearson correlation (quantity vs line price per
    * return flag) via integer moment algebra — the one aggregate family
    * the engine's built-in `corr()` can't make engine-stable (its
    * running-covariance update is a float recurrence whose result
    * depends on partitioning AND differs from DuckDB's). Here both
    * sides reduce the SAME six exact integer moments over cents
    * (n, Σx, Σy, Σxy, Σx², Σy² — per-row products fit in BIGINT, the
    * Σy² sum alone crosses 2^63 at corpus scale so it accumulates in
    * DECIMAL(38,0)/HUGEINT), and the finishing arithmetic
    * r = (nΣxy−ΣxΣy) / (√(nΣx²−Σx²ᵀ)·√(nΣy²−Σy²ᵀ)) runs in IEEE
    * doubles from identical integers — correctly-rounded casts, mul,
    * sqrt, div — so the DOUBLE result is bit-identical by construction,
    * not by luck (the kg_assortativity argument, in-engine instead of
    * driver-side).
    *
    * Scale shape: one map-side-combined agg keyed by the 3-value flag —
    * the q1 shuffle (six extra partials), no second pass.
    */
  def q21Corr(spark: SparkSession, dir: String): DataFrame = {
    val li = t(spark, dir, "lineitem")
    val xc = (dec(col("l_quantity")) * 100).cast("long")
    val yc = (dec(col("l_extendedprice")) * 100).cast("long")
    li.select(col("l_returnflag"), xc.as("x"), yc.as("y"))
      .groupBy("l_returnflag")
      .agg(count(lit(1)).as("n"),
        sum(col("x")).as("sx"),
        sum(col("y")).as("sy"),
        sum((col("x") * col("y")).cast(DecimalType(38, 0))).as("sxy"),
        sum((col("x") * col("x")).cast(DecimalType(38, 0))).as("sxx"),
        sum((col("y") * col("y")).cast(DecimalType(38, 0))).as("syy"))
      .select(col("l_returnflag"), col("n"), col("sx"), col("sy"),
        col("sxy"), col("sxx"), col("syy"))
      .select(col("l_returnflag"), col("n"), col("sx"), col("sy"),
        // every product in DECIMAL(38,0) — sx·sy alone crosses 2^63
        (((col("n") * col("sxy") -
            col("sx").cast(DecimalType(38, 0)) * col("sy"))
            .cast("double")) /
          (sqrt((col("n") * col("sxx") -
              col("sx").cast(DecimalType(38, 0)) * col("sx"))
            .cast("double")) *
           sqrt((col("n") * col("syy") -
              col("sy").cast(DecimalType(38, 0)) * col("sy"))
            .cast("double")))).as("r"))
      .orderBy("l_returnflag")
  }

  /** Time-series gap fill + LOCF: per user, the hourly event-count
    * series densified over that user's [min, max] hour range — missing
    * hours appear with n_events = 0 and `filled = true`, and the last
    * observed event value carries forward (last-observation-carried-
    * forward over the densified spine). Hours are exact integer hour
    * epochs (`date_trunc` makes the microsecond epoch an exact multiple
    * of 3.6e9, so the division is engine-identical), the carried value
    * is the DECIMAL(18,2)-exact value of the (ts, event_id)-max event in
    * the hour, picked by ONE struct-max aggregate (no second window).
    *
    * Scale shape: the corpus is touched once by the (user, hour) hash
    * agg (map-side combined); the spine derives from the AGGREGATED
    * table (hours-scale) — min/max per user, `explode(sequence(...))`
    * generated distributed, never a driver loop; then one left join on
    * (user, hour) and one user-keyed LOCF window. Every exchange after
    * the first is on post-aggregation (user × hours) rows.
    */
  def q22Gapfill(spark: SparkSession, dir: String): DataFrame = {
    val e = t(spark, dir, "events")
    val eh = e.select(
      col("user_id"),
      (unix_micros(date_trunc("hour", col("ts")).cast("timestamp"))
        / lit(3600000000L)).cast("long").as("h"),
      unix_micros(col("ts").cast("timestamp")).as("us"),
      col("event_id"), dec(col("value")).as("v"))
    val obs = eh.groupBy(col("user_id"), col("h"))
      .agg(count(lit(1)).as("n_obs"),
        max(struct(col("us"), col("event_id"), col("v")))
          .getField("v").as("v"))
    val spine = obs.groupBy(col("user_id"))
      .agg(min(col("h")).as("h0"), max(col("h")).as("h1"))
      .select(col("user_id"),
        explode(sequence(col("h0"), col("h1"))).as("h"))
    val w = Window.partitionBy(col("user_id")).orderBy(col("h"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    spine.join(obs, Seq("user_id", "h"), "left")
      .select(col("user_id"), col("h"),
        coalesce(col("n_obs"), lit(0L)).as("n_events"),
        col("n_obs").isNull.as("filled"),
        last(col("v"), ignoreNulls = true).over(w)
          .cast("double").as("locf_value"))
      .orderBy("user_id", "h")
  }

  /** 2-D Pareto frontier over orders: maximize o_totalprice (exact
    * cents), minimize o_orderdate (epoch days) — "the earliest order at
    * every achievable price level". See [[graft.plans.Skyline]] for the
    * grid-pruned two-phase plan (the NOT-EXISTS formulation the oracle
    * replays is quadratic; the single-sort window formulation funnels
    * the corpus through one partition — the operator does neither).
    */
  def q23Skyline(spark: SparkSession, dir: String): DataFrame = {
    val o = t(spark, dir, "orders")
      .select(col("o_orderkey"),
        (dec(col("o_totalprice")) * 100).cast("long").as("price_cents"),
        datediff(col("o_orderdate"), lit("1970-01-01").cast("date"))
          .cast("long").as("day"))
    graft.plans.Skyline.skyline2d(o, col("price_cents"), col("day"))
      .select(col("o_orderkey"), col("price_cents"), col("day"))
      .orderBy("price_cents", "day", "o_orderkey")
  }

  /** Event funnel (view → click → purchase): per user, the greedy
    * earliest completion of each stage STRICTLY AFTER the previous
    * stage's chosen event — greedy-earliest is exact for max funnel
    * depth when stages have no deadline (choosing any later t₁ only
    * shrinks the suffix available to later stages). Event order is the
    * per-user (ts, event_id) ROW_NUMBER, so stage positions are total-
    * order integers and ties never reach float/timestamp semantics.
    *
    * Scale shape: ONE user-keyed exchange (the row_number window);
    * every later step — the three conditional min-aggregates and the
    * two stage joins — groups/joins on the SAME user key, so Catalyst
    * reuses the window's hash partitioning end-to-end (no further
    * exchange; stages after the first also shrink to ≤ |users| rows).
    */
  def q24Funnel(spark: SparkSession, dir: String): DataFrame = {
    val ev = t(spark, dir, "events")
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("user_id"))
          .orderBy(col("ts"), col("event_id"))).cast("long"))
      .select(col("user_id"), col("event_type"), col("rn"))
      .localCheckpoint()
    val s1 = ev.filter(col("event_type") === "view")
      .groupBy("user_id").agg(min(col("rn")).as("r1"))
    val s2 = ev.filter(col("event_type") === "click")
      .join(s1, Seq("user_id"))
      .filter(col("rn") > col("r1"))
      .groupBy("user_id").agg(min(col("rn")).as("r2"))
    val s3 = ev.filter(col("event_type") === "purchase")
      .join(s2, Seq("user_id"))
      .filter(col("rn") > col("r2"))
      .groupBy("user_id").agg(min(col("rn")).as("r3"))
    ev.select("user_id").distinct()
      .join(s1, Seq("user_id"), "left")
      .join(s2, Seq("user_id"), "left")
      .join(s3, Seq("user_id"), "left")
      .select(col("user_id"), col("r1"), col("r2"), col("r3"),
        when(col("r3").isNotNull, 3L).when(col("r2").isNotNull, 2L)
          .when(col("r1").isNotNull, 1L).otherwise(0L).as("level"))
      .orderBy("user_id")
  }

  /** SCD type-2 compaction of a changelog: per user, consecutive runs
    * of the same event_type collapse into one dimension row carrying
    * [valid_from, valid_to) microsecond bounds (valid_to = the next
    * run's start, NULL while current) and the run's event count — the
    * warehouse-dimension build every CDC pipeline ends in. Run ids come
    * from the classic change-flag running sum over the per-user
    * (ts, event_id) total order.
    *
    * Scale shape: ONE user-keyed exchange — the change-detect window,
    * the run rollup, and the valid_to LEAD all cluster on user, so
    * Catalyst plans a single Exchange and sorts once per stage within
    * it. All arithmetic is exact integers (epoch-us, counts).
    */
  def q25Scd2(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    val prev = lag(col("event_type"), 1).over(w)
    val e = t(spark, dir, "events")
      .withColumn("us", unix_micros(col("ts").cast("timestamp")))
      .withColumn("chg",
        when(prev.isNull || prev =!= col("event_type"), 1L).otherwise(0L))
      .withColumn("run", sum(col("chg")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    e.groupBy(col("user_id"), col("run"))
      .agg(min(col("event_type")).as("event_type"), // constant per run
        min(col("us")).as("valid_from_us"),
        count(lit(1)).as("n_events"))
      .withColumn("valid_to_us", lead(col("valid_from_us"), 1).over(
        Window.partitionBy(col("user_id")).orderBy(col("run"))))
      .select(col("user_id"), col("run"), col("event_type"),
        col("valid_from_us"), col("valid_to_us"), col("n_events"))
      .orderBy("user_id", "run")
  }

  /** Exponentially time-decayed engagement counts: each event
    * contributes 2^-age_days (age anchored at the corpus max timestamp,
    * floor-day granularity) to its (user, event_type) counter — the
    * recency-weighted activity feature ranking/freshness systems keep
    * next to raw counts. Contributions are exact integers in micro
    * units (10^6 // 2^age, 0 beyond 62 days), so the sums replay
    * bit-for-bit; no float pow, no libm.
    *
    * Scale shape: one scan for the 1-row max-ts scalar (the broadcast
    * shape PlanGuard allowlists), then ONE map-side-combined aggregate —
    * corpus-scale events shuffle only as (user, type, two longs)
    * partials. The decayed sum is a MONOID (each event's weight is
    * fixed once the anchor is), so the same aggregate serves
    * incremental/streaming maintenance — re-anchoring by one day is a
    * global integer halving.
    */
  def q26Decay(spark: SparkSession, dir: String): DataFrame = {
    val e = t(spark, dir, "events")
      .withColumn("us", unix_micros(col("ts").cast("timestamp")))
    val anchor = e.agg(max(col("us"))).head().getLong(0)
    // integer floor division: Column `/` is double division, so go
    // through the SQL `div` operator like the other exact-int queries
    e.withColumn("age_d",
        expr(s"($anchor - us) div 86400000000"))
      .withColumn("w_micro",
        when(col("age_d") > 62L, 0L)
          .otherwise(expr(
            "1000000 div shiftleft(cast(1 as bigint), cast(age_d as int))")))
      .groupBy(col("user_id"), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("w_micro")).as("decayed_micro"))
      .orderBy("user_id", "event_type")
  }

  /** MERGE INTO semantics over a profile dimension — the query-level
    * expression of the pipeline's snapshot merge (IncrementalKg): the
    * target is the per-user profile from events BEFORE the cutoff day,
    * the source the same aggregate AFTER it, and the merge applies
    * WHEN MATCHED UPDATE (counts add, last_type takes the source's
    * latest), WHEN MATCHED AND tombstone DELETE (a user whose
    * post-cutoff stream carries ≥5 errors is purged — and a tombstone
    * suppresses its INSERT too), WHEN NOT MATCHED INSERT. The `action`
    * column exposes which clause fired.
    *
    * Scale shape: both sides pre-aggregate to user grain (map-side
    * combined) BEFORE one user-keyed full-outer join — the delta-merge
    * shape that never rewrites the unmatched target (here expressed
    * relationally; the pipeline's bucketed-snapshot variant avoids even
    * the target-side exchange). last_type = max(struct(us, event_id,
    * event_type)) — one aggregate, no second window pass.
    */
  def q27Merge(spark: SparkSession, dir: String): DataFrame = {
    val e = t(spark, dir, "events")
      .withColumn("us", unix_micros(col("ts").cast("timestamp")))
    val cut = unix_micros(to_timestamp(lit("2024-01-16 00:00:00")))
    def profile(df: DataFrame) = df.groupBy("user_id")
      .agg(count(lit(1)).as("n_events"),
        max(struct(col("us"), col("event_id"), col("event_type")))
          .getField("event_type").as("last_type"))
    val target = profile(e.filter(col("us") < cut))
    val post = e.filter(col("us") >= cut)
    val srcAgg = profile(post)
      .join(post.filter(col("event_type") === "error")
          .groupBy("user_id").agg(count(lit(1)).as("n_err")),
        Seq("user_id"), "left")
      .withColumn("tomb", coalesce(col("n_err"), lit(0L)) >= 5L)
      .drop("n_err")
    target.alias("t").join(srcAgg.alias("s"), Seq("user_id"), "full_outer")
      .filter(!coalesce(col("tomb"), lit(false)))
      .select(col("user_id"),
        (coalesce(col("t.n_events"), lit(0L)) +
          coalesce(col("s.n_events"), lit(0L))).as("n_events"),
        coalesce(col("s.last_type"), col("t.last_type")).as("last_type"),
        when(col("s.n_events").isNull, "kept")
          .when(col("t.n_events").isNull, "inserted")
          .otherwise("updated").as("action"))
      .orderBy("user_id")
  }

  /** Cohort retention matrix: users cohorted by FIRST-activity day,
    * retention(k) = distinct cohort members active exactly k days later
    * (k ≤ 7), next to the cohort size — the product-analytics staple.
    * Days are exact integer epoch-day numbers (epoch_us div 86400e6),
    * so cohort and offset replay bit-for-bit.
    *
    * Scale shape: the corpus reduces to distinct (user, day) rows in ONE
    * map-side-combined aggregate; the cohort day derives from the same
    * user-keyed partitioning (min over the user's days — Catalyst reuses
    * the exchange), and the matrix rollup runs over user×day rows, never
    * raw events.
    */
  def q28Retention(spark: SparkSession, dir: String): DataFrame = {
    val ud = t(spark, dir, "events")
      .select(col("user_id"),
        expr("unix_micros(cast(ts as timestamp)) div 86400000000")
          .as("day"))
      .distinct()
    val cohort = ud.groupBy("user_id").agg(min(col("day")).as("c_day"))
    val sizes = cohort.groupBy("c_day")
      .agg(count(lit(1)).as("n_cohort"))
    ud.join(cohort, "user_id")
      .withColumn("k", col("day") - col("c_day"))
      .filter(col("k") <= 7L)
      .groupBy(col("c_day"), col("k"))
      .agg(countDistinct(col("user_id")).as("n_active"))
      .join(sizes, "c_day")
      .select(col("c_day"), col("k"), col("n_active"), col("n_cohort"))
      .orderBy("c_day", "k")
  }

  /** Windowed funnel (ClickHouse `windowFunnel` semantics): per user,
    * level = the longest view → click → purchase chain whose END-TO-END
    * span fits 4 hours — q24's greedy is exact only WITHOUT deadlines;
    * with one, the minimal-span chain matters. Running-max windows give
    * it exactly: lv = latest view strictly before each row, and for
    * each purchase the latest QUALIFIED click c* (struct-max over
    * (us, id) of clicks carrying a view) — any chain (v,c,p) has
    * c ≤ c* and v ≤ lv(c) ≤ lv(c*), so (lv(c*), c*, p) is the max-v =
    * minimal-span chain ending at p. The oracle deliberately uses a
    * DIFFERENT algorithm (existential three-way join) so the
    * minimality argument itself is machine-checked.
    *
    * Scale shape: ONE user-keyed exchange; both running maxima and the
    * final rollup reuse its partitioning (q18's
    * subset-of-clustering-keys rule) — no joins, no second shuffle.
    */
  def q29Wfunnel(spark: SparkSession, dir: String): DataFrame = {
    val W = 4L * 3600000000L // 4 h: tight enough that the deadline binds
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("us"), col("event_id"))
    val prev = w.rowsBetween(Window.unboundedPreceding, -1)
    val e = t(spark, dir, "events")
      .withColumn("us", unix_micros(col("ts").cast("timestamp")))
    val d = e
      .withColumn("lv",
        max(when(col("event_type") === "view", col("us"))).over(prev))
      .withColumn("qc", when(col("event_type") === "click" &&
        col("lv").isNotNull,
        struct(col("us"), col("event_id"), col("lv"))))
    val d2 = d.withColumn("bc", max(col("qc")).over(prev))
    d2.groupBy("user_id").agg(
        max(when(col("event_type") === "view", 1L).otherwise(0L)).as("h1"),
        max(when(col("event_type") === "click" && col("lv").isNotNull &&
          col("us") - col("lv") <= W, 1L).otherwise(0L)).as("h2"),
        max(when(col("event_type") === "purchase" && col("bc").isNotNull &&
          col("us") - col("bc.lv") <= W, 1L).otherwise(0L)).as("h3"))
      .select(col("user_id"),
        when(col("h3") === 1L, 3L).when(col("h2") === 1L, 2L)
          .when(col("h1") === 1L, 1L).otherwise(0L).as("level"))
      .orderBy("user_id")
  }

  /** Frontier closure for [[q30Bom]]: every (anc, dsc) pair of the
    * hierarchy with the PRODUCT of edge quantities along the (unique,
    * in a tree) path and the path depth. One equi-join of the previous
    * frontier against the broadcast edge table per round — the frontier
    * extends one level per round, so rounds = hierarchy depth; each
    * round localCheckpoints to cut lineage (the [[graft.canon]]
    * iteration convention). Exact integer quantities.
    */
  private[queries] def bomClosure(e: DataFrame): DataFrame = {
    val e0 = e.select(col("anc"), col("dsc"), col("qty")).localCheckpoint()
    var acc = e0.withColumn("depth", lit(1L))
    var frontier = acc
    var more = true
    while (more) {
      val next = frontier.alias("f")
        .join(broadcast(e0.alias("g")), col("f.dsc") === col("g.anc"))
        .select(col("f.anc").as("anc"), col("g.dsc").as("dsc"),
          (col("f.qty") * col("g.qty")).as("qty"),
          (col("f.depth") + 1L).as("depth"))
        .localCheckpoint()
      if (next.limit(1).count() == 0) more = false
      else { acc = acc.union(next); frontier = next }
    }
    acc
  }

  /** BOM explosion — the classic iterated-transitive-closure rollup
    * (assemblies, org charts, category trees: the hierarchical shape
    * every warehouse keeps next to its facts). Hierarchy synthesized
    * deterministically from `part`: parent(p) = p div 2 (a binary tree
    * over p_partkey ∈ [2, 255], depth ≤ 7), qty(child) =
    * (child mod 3) + 1 units per parent. Emits every (anc, dsc) pair
    * with the quantity product along the path (exact integers ≤ 3⁷) and
    * the depth — see [[bomClosure]] for the per-round join shape. The
    * edge table is the DICTIONARY-scale side (a real estate's hierarchy
    * is orders of magnitude below its facts), hence the broadcast; the
    * oracle replays the closure as a WITH RECURSIVE over the identical
    * edge derivation.
    */
  def q30Bom(spark: SparkSession, dir: String): DataFrame = {
    val e = t(spark, dir, "part")
      .filter(col("p_partkey") >= 2 && col("p_partkey") <= 255)
      .select(expr("p_partkey div 2").cast("long").as("anc"),
        col("p_partkey").cast("long").as("dsc"),
        (col("p_partkey") % 3 + 1).cast("long").as("qty"))
    bomClosure(e).orderBy("anc", "dsc")
  }

  /** RANGE-interval window frame — the TIME-bounded moving aggregate
    * (per user, events + cent-exact value mass + integer micro-mean
    * over the trailing hour INCLUDING the current row). Distinct from
    * every ROWS-frame window in the suite: the frame is defined by the
    * ORDER-BY VALUE (`us ∈ [cur − 1h, cur]`), so ties in `us` all see
    * the identical frame regardless of physical order — which is what
    * makes it deterministic, and what a rows-frame can't express.
    * Values quantized to integer cents HALF_UP before any aggregation
    * (the quantizedTop1 rounding discipline) so sums are associative
    * exact longs; the mean finishes in micro-cents by floor division.
    * One user-keyed exchange serves the single window.
    *
    * PRECONDITION (round-6 advice): events.value ≥ 0, so every
    * sum_cents_1h is non-negative and Spark's `div` (truncate toward
    * zero) agrees with the oracle's `//` (floor) — the testdata
    * generator emits non-negative values by construction (verified:
    * min(value) ≥ 0 at every SF). A corpus with negative event values
    * would need a sign-safe floor (e.g. pmod-adjusted division) on
    * BOTH engines before this query could be reused unchanged.
    */
  def q31Movavg(spark: SparkSession, dir: String): DataFrame = {
    val hourUs = 3600000000L
    val w = Window.partitionBy(col("user_id")).orderBy(col("us"))
      .rangeBetween(-hourUs, 0)
    t(spark, dir, "events")
      .select(col("event_id"), col("user_id"),
        unix_micros(col("ts").cast("timestamp")).as("us"),
        round(col("value") * 100).cast("long").as("cents"))
      .withColumn("n_1h", count(lit(1)).over(w))
      .withColumn("sum_cents_1h", sum(col("cents")).over(w))
      .withColumn("avg_microcents_1h",
        expr("(1000000 * sum_cents_1h) div n_1h"))
      .select(col("event_id"), col("user_id"), col("us"), col("n_1h"),
        col("sum_cents_1h"), col("avg_microcents_1h"))
      .orderBy("event_id")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q31_movavg" -> q31Movavg,
    "q30_bom" -> q30Bom,
    "q29_wfunnel" -> q29Wfunnel,
    "q28_retention" -> q28Retention,
    "q27_merge" -> q27Merge,
    "q26_decay" -> q26Decay,
    "q25_scd2" -> q25Scd2,
    "q24_funnel" -> q24Funnel,
    "q22_gapfill" -> q22Gapfill,
    "q23_skyline" -> q23Skyline,
    "q21_corr" -> q21Corr,
    "q17_ntile" -> q17Ntile,
    "q18_lag" -> q18Lag,
    "q19_median" -> q19Median,
    "q20_setops" -> q20Setops,
    "q1_agg" -> q1Agg,
    "q2_join_agg" -> q2JoinAgg,
    "q3_topk_window" -> q3TopkWindow,
    "q4_semi" -> q4Semi,
    "q5_anti" -> q5Anti,
    "q6_filter" -> q6Filter,
    "q7_json" -> q7Json,
    "q8_running" -> q8Running,
    "q9_rollup" -> q9Rollup,
    "q10_time_bucket" -> q10TimeBucket,
    "q11_asof" -> q11Asof,
    "q12_asof_outer" -> q12AsofOuter,
    "q13_session" -> q13Session,
    "q14_range" -> q14Range,
    "q15_pivot" -> q15Pivot,
    "q16_cube" -> q16Cube
  )

  val oracles: Map[String, String] = Map(
    // RANGE frame over epoch-us; cents quantized HALF_UP from the same
    // IEEE double product; non-negative floor division
    "q31_movavg" ->
      """WITH e AS (SELECT event_id, user_id, epoch_us(ts) AS us,
        |    CAST(round(value * 100) AS BIGINT) AS cents FROM events),
        |w AS (SELECT event_id, user_id, us,
        |    CAST(COUNT(*) OVER fr AS BIGINT) AS n_1h,
        |    CAST(SUM(cents) OVER fr AS BIGINT) AS sum_cents_1h
        |  FROM e
        |  WINDOW fr AS (PARTITION BY user_id ORDER BY us
        |    RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW))
        |SELECT event_id, user_id, us, n_1h, sum_cents_1h,
        |  (1000000 * sum_cents_1h) // n_1h AS avg_microcents_1h
        |FROM w ORDER BY event_id""".stripMargin,
    // the closure replayed as WITH RECURSIVE over the identical
    // deterministic hierarchy; integer qty products replay exactly
    "q30_bom" ->
      """WITH RECURSIVE e AS (
        |  SELECT CAST(p_partkey // 2 AS BIGINT) AS anc,
        |    CAST(p_partkey AS BIGINT) AS dsc,
        |    CAST(p_partkey % 3 + 1 AS BIGINT) AS qty
        |  FROM part WHERE p_partkey BETWEEN 2 AND 255),
        |bom(anc, dsc, qty, depth) AS (
        |  SELECT anc, dsc, qty, CAST(1 AS BIGINT) FROM e
        |  UNION ALL
        |  SELECT b.anc, e.dsc, b.qty * e.qty, b.depth + 1
        |  FROM bom b JOIN e ON e.anc = b.dsc)
        |SELECT anc, dsc, qty, depth FROM bom ORDER BY anc, dsc""".stripMargin,
    // existential formulation — independent of the engine's running-max
    // minimality argument: a level holds iff SOME chain fits the window
    "q29_wfunnel" ->
      """WITH e AS (SELECT user_id, event_id, event_type, epoch_us(ts) AS us
        |  FROM events),
        |v AS (SELECT * FROM e WHERE event_type = 'view'),
        |c AS (SELECT * FROM e WHERE event_type = 'click'),
        |p AS (SELECT * FROM e WHERE event_type = 'purchase'),
        |l1 AS (SELECT DISTINCT user_id FROM v),
        |l2 AS (SELECT DISTINCT v.user_id FROM v JOIN c
        |  ON c.user_id = v.user_id
        |  AND (c.us > v.us OR (c.us = v.us AND c.event_id > v.event_id))
        |  AND c.us - v.us <= 14400000000),
        |l3 AS (SELECT DISTINCT v.user_id FROM v
        |  JOIN c ON c.user_id = v.user_id
        |    AND (c.us > v.us OR (c.us = v.us AND c.event_id > v.event_id))
        |  JOIN p ON p.user_id = v.user_id
        |    AND (p.us > c.us OR (p.us = c.us AND p.event_id > c.event_id))
        |    AND p.us - v.us <= 14400000000)
        |SELECT u.user_id,
        |  CAST(CASE WHEN l3.user_id IS NOT NULL THEN 3
        |       WHEN l2.user_id IS NOT NULL THEN 2
        |       WHEN l1.user_id IS NOT NULL THEN 1 ELSE 0 END AS BIGINT)
        |    AS level
        |FROM (SELECT DISTINCT user_id FROM e) u
        |LEFT JOIN l1 USING (user_id)
        |LEFT JOIN l2 USING (user_id)
        |LEFT JOIN l3 USING (user_id)
        |ORDER BY user_id""".stripMargin,
    // cohort = min epoch-day per user; matrix over distinct (user, day)
    "q28_retention" ->
      """WITH ud AS (SELECT DISTINCT user_id,
        |    epoch_us(ts) // 86400000000 AS day
        |  FROM events),
        |c AS (SELECT user_id, MIN(day) AS c_day FROM ud GROUP BY 1),
        |s AS (SELECT c_day, CAST(COUNT(*) AS BIGINT) AS n_cohort
        |  FROM c GROUP BY 1),
        |m AS (SELECT c.c_day, ud.day - c.c_day AS k,
        |    CAST(COUNT(DISTINCT ud.user_id) AS BIGINT) AS n_active
        |  FROM ud JOIN c USING (user_id)
        |  WHERE ud.day - c.c_day <= 7
        |  GROUP BY 1, 2)
        |SELECT CAST(m.c_day AS BIGINT) AS c_day, CAST(m.k AS BIGINT) AS k,
        |  m.n_active, s.n_cohort
        |FROM m JOIN s USING (c_day)
        |ORDER BY c_day, k""".stripMargin,
    // MERGE replay: per-side profile (count + ROW_NUMBER argmax over
    // (us, event_id, event_type) DESC = the struct-max), tombstone =
    // >=5 post-cutoff errors, FULL OUTER + the three clauses as CASE
    "q27_merge" ->
      """WITH e AS (SELECT user_id, event_id, event_type, epoch_us(ts) AS us
        |  FROM events),
        |c AS (SELECT epoch_us(TIMESTAMP '2024-01-16 00:00:00') AS cut),
        |tb AS (SELECT user_id, event_type,
        |    ROW_NUMBER() OVER (PARTITION BY user_id
        |      ORDER BY us DESC, event_id DESC, event_type DESC) AS rn
        |  FROM e, c WHERE us < cut),
        |tgt AS (SELECT a.user_id, a.n, b.event_type AS last_type
        |  FROM (SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n FROM tb
        |        GROUP BY 1) a
        |  JOIN (SELECT user_id, event_type FROM tb WHERE rn = 1) b
        |    USING (user_id)),
        |sb AS (SELECT user_id, event_type,
        |    ROW_NUMBER() OVER (PARTITION BY user_id
        |      ORDER BY us DESC, event_id DESC, event_type DESC) AS rn
        |  FROM e, c WHERE us >= cut),
        |src AS (SELECT a.user_id, a.n, b.event_type AS last_type,
        |    COALESCE(er.n_err, 0) >= 5 AS tomb
        |  FROM (SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n FROM sb
        |        GROUP BY 1) a
        |  JOIN (SELECT user_id, event_type FROM sb WHERE rn = 1) b
        |    USING (user_id)
        |  LEFT JOIN (SELECT user_id, COUNT(*) AS n_err FROM sb
        |        WHERE event_type = 'error' GROUP BY 1) er
        |    USING (user_id))
        |SELECT COALESCE(t.user_id, s.user_id) AS user_id,
        |  CAST(COALESCE(t.n, 0) + COALESCE(s.n, 0) AS BIGINT) AS n_events,
        |  COALESCE(s.last_type, t.last_type) AS last_type,
        |  CASE WHEN s.n IS NULL THEN 'kept'
        |       WHEN t.n IS NULL THEN 'inserted'
        |       ELSE 'updated' END AS action
        |FROM tgt t FULL OUTER JOIN src s ON s.user_id = t.user_id
        |WHERE NOT COALESCE(s.tomb, false)
        |ORDER BY user_id""".stripMargin,
    // anchor = scalar max(epoch_us), weight = 1e6 // 2^age_days in exact
    // integers (no float pow on either engine)
    "q26_decay" ->
      """WITH mx AS (SELECT MAX(epoch_us(ts)) AS a FROM events),
        |e AS (SELECT user_id, event_type,
        |    (mx.a - epoch_us(ts)) // 86400000000 AS age_d
        |  FROM events, mx),
        |w AS (SELECT user_id, event_type,
        |    CASE WHEN age_d > 62 THEN 0
        |         ELSE 1000000 // (CAST(1 AS BIGINT) << CAST(age_d AS INTEGER))
        |    END AS w_micro
        |  FROM e)
        |SELECT user_id, event_type, CAST(COUNT(*) AS BIGINT) AS n_events,
        |  CAST(SUM(w_micro) AS BIGINT) AS decayed_micro
        |FROM w GROUP BY 1, 2
        |ORDER BY user_id, event_type""".stripMargin,
    // the same change-flag running sum, run rollup, and LEAD bound
    "q25_scd2" ->
      """WITH e AS (
        |  SELECT user_id, event_id, event_type, epoch_us(ts) AS us,
        |    CASE WHEN LAG(event_type) OVER w IS NULL
        |      OR LAG(event_type) OVER w <> event_type
        |      THEN 1 ELSE 0 END AS chg
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |r AS (
        |  SELECT user_id, event_type, us,
        |    SUM(chg) OVER (PARTITION BY user_id ORDER BY us, event_id
        |      ROWS UNBOUNDED PRECEDING) AS run
        |  FROM e),
        |g AS (
        |  SELECT user_id, CAST(run AS BIGINT) AS run,
        |    MIN(event_type) AS event_type,
        |    CAST(MIN(us) AS BIGINT) AS valid_from_us,
        |    CAST(COUNT(*) AS BIGINT) AS n_events
        |  FROM r GROUP BY user_id, run)
        |SELECT user_id, run, event_type, valid_from_us,
        |  LEAD(valid_from_us) OVER (PARTITION BY user_id ORDER BY run)
        |    AS valid_to_us,
        |  n_events
        |FROM g ORDER BY user_id, run""".stripMargin,
    // the same greedy stage walk over the same per-user total order
    "q24_funnel" ->
      """WITH ev AS (
        |  SELECT user_id, event_type, CAST(ROW_NUMBER() OVER (
        |    PARTITION BY user_id ORDER BY ts, event_id) AS BIGINT) AS rn
        |  FROM events),
        |s1 AS (SELECT user_id, MIN(rn) AS r1 FROM ev
        |  WHERE event_type = 'view' GROUP BY user_id),
        |s2 AS (SELECT e.user_id, MIN(e.rn) AS r2 FROM ev e
        |  JOIN s1 ON s1.user_id = e.user_id AND e.rn > s1.r1
        |  WHERE e.event_type = 'click' GROUP BY e.user_id),
        |s3 AS (SELECT e.user_id, MIN(e.rn) AS r3 FROM ev e
        |  JOIN s2 ON s2.user_id = e.user_id AND e.rn > s2.r2
        |  WHERE e.event_type = 'purchase' GROUP BY e.user_id)
        |SELECT u.user_id, s1.r1, s2.r2, s3.r3,
        |  CAST(CASE WHEN s3.r3 IS NOT NULL THEN 3
        |    WHEN s2.r2 IS NOT NULL THEN 2
        |    WHEN s1.r1 IS NOT NULL THEN 1 ELSE 0 END AS BIGINT) AS level
        |FROM (SELECT DISTINCT user_id FROM ev) u
        |LEFT JOIN s1 ON s1.user_id = u.user_id
        |LEFT JOIN s2 ON s2.user_id = u.user_id
        |LEFT JOIN s3 ON s3.user_id = u.user_id
        |ORDER BY u.user_id""".stripMargin,
    // densify with generate_series over the per-user hour range, LOCF
    // via IGNORE NULLS; the in-hour value pick replays the struct max
    // as a (ts, event_id) DESC row_number
    "q22_gapfill" ->
      """WITH eh AS (
        |  SELECT user_id,
        |    epoch_us(date_trunc('hour', ts)) // 3600000000 AS h,
        |    ts, event_id, CAST(value AS DECIMAL(18,2)) AS v
        |  FROM events),
        |obs AS (
        |  SELECT user_id, h, CAST(COUNT(*) AS BIGINT) AS n_obs FROM eh
        |  GROUP BY 1, 2),
        |pick AS (
        |  SELECT user_id, h, v, ROW_NUMBER() OVER (
        |    PARTITION BY user_id, h ORDER BY ts DESC, event_id DESC) AS rn
        |  FROM eh),
        |obs2 AS (
        |  SELECT o.user_id, o.h, o.n_obs, p.v
        |  FROM obs o JOIN pick p
        |    ON p.user_id = o.user_id AND p.h = o.h AND p.rn = 1),
        |spine AS (
        |  SELECT user_id, unnest(generate_series(MIN(h), MAX(h))) AS h
        |  FROM obs GROUP BY user_id),
        |j AS (
        |  SELECT s.user_id, s.h,
        |    COALESCE(o.n_obs, 0) AS n_events,
        |    o.n_obs IS NULL AS filled, o.v
        |  FROM spine s LEFT JOIN obs2 o
        |    ON o.user_id = s.user_id AND o.h = s.h)
        |SELECT user_id, h, n_events, filled,
        |  CAST(LAST_VALUE(v IGNORE NULLS) OVER (
        |    PARTITION BY user_id ORDER BY h
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |    AS DOUBLE) AS locf_value
        |FROM j ORDER BY user_id, h""".stripMargin,
    // the quadratic dominance truth the grid-pruned plan must equal
    "q23_skyline" ->
      """WITH o AS (
        |  SELECT o_orderkey,
        |    CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)
        |      AS price_cents,
        |    CAST(CAST(o_orderdate AS DATE) - DATE '1970-01-01' AS BIGINT)
        |      AS day
        |  FROM orders)
        |SELECT o_orderkey, price_cents, day FROM o x
        |WHERE NOT EXISTS (
        |  SELECT 1 FROM o y
        |  WHERE y.price_cents >= x.price_cents AND y.day <= x.day
        |    AND (y.price_cents > x.price_cents OR y.day < x.day))
        |ORDER BY price_cents, day, o_orderkey""".stripMargin,
    // same six integer moments in HUGEINT, same IEEE finishing arithmetic
    "q21_corr" ->
      """WITH t AS (SELECT l_returnflag,
        |    CAST(CAST(l_quantity AS DECIMAL(18,2)) * 100 AS BIGINT) AS x,
        |    CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS y
        |  FROM lineitem)
        |SELECT l_returnflag, COUNT(*) AS n,
        |  CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
        |  CAST(CAST(COUNT(*) AS HUGEINT) * SUM(x*y)
        |       - CAST(SUM(x) AS HUGEINT) * SUM(y) AS DOUBLE) /
        |  (sqrt(CAST(CAST(COUNT(*) AS HUGEINT) * SUM(x*x)
        |       - CAST(SUM(x) AS HUGEINT) * SUM(x) AS DOUBLE)) *
        |   sqrt(CAST(CAST(COUNT(*) AS HUGEINT) * SUM(y*y)
        |       - CAST(SUM(y) AS HUGEINT) * SUM(y) AS DOUBLE))) AS r
        |FROM t GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "q18_lag" ->
      """WITH g AS (
        |  SELECT user_id,
        |    epoch_us(ts) - lag(epoch_us(ts)) OVER w AS gap_us
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
        |SELECT user_id, COUNT(*) AS n_events,
        |  COUNT(gap_us) AS n_gaps,
        |  MIN(gap_us) AS min_gap_us,
        |  MAX(gap_us) AS max_gap_us,
        |  CAST(SUM(gap_us) AS BIGINT) AS sum_gap_us
        |FROM g GROUP BY user_id ORDER BY user_id""".stripMargin,
    "q19_median" ->
      """WITH j AS (
        |  SELECT c_mktsegment, CAST(o_totalprice AS DECIMAL(18,2)) AS tp,
        |    o_orderkey
        |  FROM orders JOIN customer ON o_custkey = c_custkey),
        |w AS (
        |  SELECT c_mktsegment, tp,
        |    ROW_NUMBER() OVER (PARTITION BY c_mktsegment
        |      ORDER BY tp, o_orderkey) AS rn,
        |    COUNT(*) OVER (PARTITION BY c_mktsegment) AS cnt
        |  FROM j),
        |mid AS (
        |  SELECT c_mktsegment, tp, cnt FROM w
        |  WHERE rn = (cnt + 1) // 2 OR rn = (cnt + 2) // 2)
        |SELECT c_mktsegment, MAX(cnt) AS n_orders,
        |  CAST(SUM(tp) * (3 - COUNT(*)) AS DOUBLE) / 2.0 AS median
        |FROM mid GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin,
    "q20_setops" ->
      """WITH c AS (SELECT user_id FROM events WHERE event_type = 'click'),
        |p AS (SELECT user_id FROM events WHERE event_type = 'purchase')
        |SELECT * FROM (
        |  SELECT 'click_and_purchase' AS tag, user_id
        |  FROM (SELECT user_id FROM c INTERSECT SELECT user_id FROM p)
        |  UNION ALL
        |  SELECT 'click_only' AS tag, user_id
        |  FROM (SELECT user_id FROM c EXCEPT SELECT user_id FROM p))
        |ORDER BY tag, user_id""".stripMargin,
    "q17_ntile" ->
      """WITH sp AS (SELECT o_custkey,
        |    SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS spend
        |  FROM orders GROUP BY o_custkey),
        |j AS (SELECT c_custkey, c_nationkey, spend
        |  FROM sp JOIN customer ON o_custkey = c_custkey),
        |wnd AS (SELECT c_custkey, c_nationkey, spend,
        |    CAST(NTILE(4) OVER w AS BIGINT) AS quartile,
        |    ROW_NUMBER() OVER w AS rn,
        |    COUNT(*) OVER (PARTITION BY c_nationkey) AS cnt
        |  FROM j
        |  WINDOW w AS (PARTITION BY c_nationkey
        |               ORDER BY spend DESC, c_custkey))
        |SELECT c_custkey, c_nationkey, CAST(spend AS DOUBLE) AS spend,
        |  quartile,
        |  CAST(CASE WHEN cnt > 1 THEN (rn - 1) * 1000000 // (cnt - 1)
        |       ELSE 0 END AS BIGINT) AS pr_micro
        |FROM wnd ORDER BY c_custkey""".stripMargin,
    "q13_session" ->
      """WITH g AS (
        |  SELECT user_id, ts, event_id, value,
        |    CASE WHEN lag(ts) OVER w IS NULL
        |         OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 1800000000
        |      THEN 1 ELSE 0 END AS brk
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |s AS (
        |  SELECT *, CAST(SUM(brk) OVER (PARTITION BY user_id
        |    ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING) AS BIGINT)
        |    AS session_idx
        |  FROM g)
        |SELECT user_id, session_idx, COUNT(*) AS n_events,
        |  MIN(ts) AS start_ts, MAX(ts) AS end_ts,
        |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
        |FROM s GROUP BY user_id, session_idx
        |ORDER BY user_id, session_idx""".stripMargin,
    // native inequality join — an independent range-join implementation
    // gating the bucket-exploded rewrite
    "q14_range" ->
      """WITH p AS (SELECT event_id AS purchase_id, ts AS p_ts
        |  FROM events WHERE event_type = 'purchase'),
        |w AS (SELECT event_id AS signup_id, ts AS w_start,
        |    ts + INTERVAL 2 HOUR AS w_end
        |  FROM events WHERE event_type = 'signup')
        |SELECT p.purchase_id, p.p_ts, w.signup_id, w.w_start
        |FROM p JOIN w ON p.p_ts BETWEEN w.w_start AND w.w_end
        |ORDER BY purchase_id, signup_id""".stripMargin,
    "q12_asof_outer" ->
      """WITH s AS (SELECT user_id, ts, event_id AS signup_id
        |  FROM events WHERE event_type = 'signup'),
        |c AS (SELECT user_id, ts AS c_ts, event_id AS click_id
        |  FROM events WHERE event_type = 'click')
        |SELECT s.signup_id, s.user_id, s.ts AS s_ts, c.click_id, c.c_ts
        |FROM s ASOF LEFT JOIN c ON s.user_id = c.user_id AND s.ts >= c.c_ts
        |ORDER BY signup_id""".stripMargin,
    // native DuckDB ASOF JOIN — an independent as-of implementation
    // gating the custom Spark operator
    "q11_asof" ->
      """WITH p AS (SELECT user_id, ts, event_id AS purchase_id
        |  FROM events WHERE event_type = 'purchase'),
        |c AS (SELECT user_id, ts AS c_ts, event_id AS click_id
        |  FROM events WHERE event_type = 'click')
        |SELECT p.purchase_id, p.user_id, p.ts AS p_ts, c.click_id, c.c_ts
        |FROM p ASOF JOIN c ON p.user_id = c.user_id AND p.ts >= c.c_ts
        |ORDER BY purchase_id""".stripMargin,
    // PIVOT cells ≡ FILTERed aggregates over the explicit value list
    "q15_pivot" ->
      """SELECT CAST(year(o_orderdate) AS BIGINT) AS yr,
        |  CAST(COALESCE(SUM(CAST(o_totalprice AS DECIMAL(18,2)))
        |    FILTER (o_orderstatus = 'F'), 0) AS DOUBLE) AS f_rev,
        |  CAST(COALESCE(SUM(CAST(o_totalprice AS DECIMAL(18,2)))
        |    FILTER (o_orderstatus = 'O'), 0) AS DOUBLE) AS o_rev,
        |  CAST(COALESCE(SUM(CAST(o_totalprice AS DECIMAL(18,2)))
        |    FILTER (o_orderstatus = 'P'), 0) AS DOUBLE) AS p_rev
        |FROM orders GROUP BY 1 ORDER BY yr""".stripMargin,
    "q1_agg" ->
      """SELECT l_returnflag, l_linestatus,
        |CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        |CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
        |CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS sum_disc_price,
        |CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_qty,
        |COUNT(*) AS count_order
        |FROM lineitem GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "q2_join_agg" ->
      """SELECT r_name, n_name,
        |CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
        |COUNT(*) AS n_orders
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY r_name, n_name ORDER BY r_name, n_name""".stripMargin,
    "q3_topk_window" ->
      """SELECT c_mktsegment, rn, o_orderkey, o_totalprice FROM (
        |SELECT c_mktsegment, o_orderkey,
        |CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS DOUBLE) AS o_totalprice,
        |ROW_NUMBER() OVER (PARTITION BY c_mktsegment ORDER BY o_totalprice DESC, o_orderkey) AS rn
        |FROM orders JOIN customer ON o_custkey = c_custkey) t
        |WHERE rn <= 3 ORDER BY c_mktsegment, rn""".stripMargin,
    "q4_semi" ->
      """SELECT c_mktsegment, COUNT(*) AS n_customers FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin,
    "q5_anti" ->
      """SELECT c_custkey, c_name, c_mktsegment FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')
        |ORDER BY c_custkey""".stripMargin,
    "q6_filter" ->
      """SELECT
        |CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
        |COUNT(*) AS n_rows
        |FROM lineitem
        |WHERE l_discount >= 0.05 AND l_discount <= 0.07 AND l_quantity < 24""".stripMargin,
    "q7_json" ->
      """SELECT event_type, COUNT(*) AS n,
        |CAST(SUM(CAST(regexp_extract(props, '[0-9]+') AS BIGINT)) AS BIGINT) AS sum_k,
        |MIN(CAST(regexp_extract(props, '[0-9]+') AS BIGINT)) AS min_k,
        |MAX(CAST(regexp_extract(props, '[0-9]+') AS BIGINT)) AS max_k
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
    "q8_running" ->
      """SELECT user_id, event_id,
        |CAST(SUM(CAST(value AS DECIMAL(18,2))) OVER (PARTITION BY user_id ORDER BY ts, event_id ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_value
        |FROM events ORDER BY user_id, event_id""".stripMargin,
    "q9_rollup" ->
      """SELECT n_name, o_orderpriority, COUNT(*) AS n_orders,
        |CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |GROUP BY ROLLUP(n_name, o_orderpriority)
        |ORDER BY n_name ASC NULLS FIRST, o_orderpriority ASC NULLS FIRST""".stripMargin,
    "q10_time_bucket" ->
      """SELECT (CAST(floor(epoch(ts) / 3600) AS BIGINT) * 3600) AS bucket,
        |event_type, COUNT(*) AS n,
        |CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
        |FROM events GROUP BY 1, 2 ORDER BY bucket, event_type""".stripMargin,
    "q16_cube" ->
      """SELECT n_name, o_orderstatus, COUNT(*) AS n_orders,
        |CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
        |CAST(GROUPING(n_name) * 2 + GROUPING(o_orderstatus) AS BIGINT) AS gid
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |GROUP BY CUBE(n_name, o_orderstatus)
        |ORDER BY gid, n_name ASC NULLS FIRST, o_orderstatus ASC NULLS FIRST""".stripMargin
  )
}
