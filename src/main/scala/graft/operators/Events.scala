package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables

/** Time-series / event-stream batch operators over the `events` table.
  * The reference has no stream engine (SURVEY.md §2.10) — its incremental
  * surface is IVM matviews + cron-refreshed dynamic tables; these queries
  * are the batch semantics that the streaming layer (graft.streaming)
  * incrementalizes. Sessionization and as-of joins are the operators a
  * 100 TB event pipeline needs; both partition by user/time so they scale
  * horizontally without a global sort.
  */
object Events {

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // -- e14: interval-overlap join (PG range && GiST join / Greenplum
    //    range predicates): user-day activity intervals × half-hour-
    //    padded high-value "incident" windows. The scale problem is that
    //    `a_lo <= b_hi AND b_lo <= a_hi` is not an equi-join — a naive
    //    plan is |A|×|B| nested loops (exactly what the DuckDB oracle
    //    runs). The distributed spelling BANDS time into day buckets:
    //    each interval explodes to the buckets it covers (sessions ≤ 1
    //    day, windows ≤ 2 — bounded fan-out), overlaps become an
    //    equi-join on the bucket, and the duplicate-pair problem is
    //    solved WITHOUT a distinct by keeping a pair only in the bucket
    //    containing greatest(a_lo, b_lo) — each overlapping pair
    //    survives exactly once. One shuffle, no quadratic blow-up,
    //    overlap durations as exact epoch-ms BIGINTs. --
    "e14_interval_join" -> { (s, dir) =>
      val ev = Tables.df(s, dir, "events")
      val sessions = ev
        .groupBy(col("user_id"), expr("CAST(date_trunc('DAY', ts) AS DATE)").as("day"))
        .agg(unix_millis(min(col("ts"))).as("a_lo"), unix_millis(max(col("ts"))).as("a_hi"))
      val windows = ev.filter(col("value") > 200.0)
        .select(col("event_type"),
          (unix_millis(col("ts")) - lit(1800000L)).as("b_lo"),
          (unix_millis(col("ts")) + lit(1800000L)).as("b_hi"))
      val aB = sessions.withColumn("bkt",
        explode(expr("sequence(a_lo div 86400000, a_hi div 86400000)")))
      val bB = windows.withColumn("bkt",
        explode(expr("sequence(b_lo div 86400000, b_hi div 86400000)")))
      aB.join(bB, Seq("bkt"))
        .filter(col("a_lo") <= col("b_hi") && col("b_lo") <= col("a_hi"))
        .filter(col("bkt") === expr("greatest(a_lo, b_lo) div 86400000"))
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n_overlaps"),
          countDistinct(col("user_id")).as("n_users"),
          sum(least(col("a_hi"), col("b_hi")) - greatest(col("a_lo"), col("b_lo")))
            .cast("bigint").as("overlap_ms"))
        .orderBy(col("event_type"))
    },

    // -- e15: EWMA (exponentially weighted moving average) per user —
    //    the standard smoothing/anomaly baseline for event streams
    //    (α = 0.2, seeded with the first observation). The recurrence
    //    ewma_t = α·v_t + (1−α)·ewma_{t−1} is inherently sequential, so
    //    it runs as ONE ordered fold per user: collect the user's
    //    values sorted by (ts, event_id) and fold left-to-right inside
    //    a codegen'd aggregate() — per-user state is bounded by the
    //    user's event count, the only shuffle is the groupBy, and the
    //    identical left fold runs in DuckDB's list_reduce so the
    //    doubles match bit-for-bit before rounding. (The closed-form
    //    Σ v_i·(1−α)^(n−i) window rewrite is numerically divergent for
    //    long histories — (1−α)^(−i) overflows — so the fold IS the
    //    scale-correct form.) --
    "e15_ewma" -> { (s, dir) =>
      Tables.df(s, dir, "events")
        .groupBy(col("user_id"))
        .agg(
          count(lit(1)).as("n_events"),
          expr("transform(sort_array(collect_list(struct(ts, event_id, value))), e -> e.value)")
            .as("vs"))
        .select(col("user_id"), col("n_events"),
          col("vs")(0).as("v_first"),
          element_at(col("vs"), -1).as("v_last"),
          round(expr(
            """aggregate(slice(vs, 2, size(vs)), CAST(vs[0] AS DOUBLE),
                 (acc, x) -> CAST(0.2 AS DOUBLE) * x + CAST(0.8 AS DOUBLE) * acc)"""), 6)
            .as("ewma"))
        .orderBy(col("user_id"))
    },

    // -- e13: SCD2 effective-dated LOOKUP — the read side of e12's
    //    history build: each purchase event joins to the dimension
    //    version active AT ITS TIMESTAMP (valid_from ≤ ts < valid_to),
    //    answering "what state was the user in when they bought".
    //    Versions per user are non-overlapping, so the range join
    //    collapses to an as-of (e03's shape): one user-keyed join of
    //    purchases × version STARTS, argmax of the latest start ≤ ts as
    //    a map-side-combined max_by — no window over the fact stream,
    //    no interval explosion. Per-user fan-out is bounded by that
    //    user's change count, at any corpus size --
    "e13_scd2_lookup" -> { (s, dir) =>
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      val ev = Tables.df(s, dir, "events")
      val versions = ev
        .withColumn("prev_type", lag(col("event_type"), 1).over(w))
        .filter(col("prev_type").isNull || col("prev_type") =!= col("event_type"))
        .select(col("user_id"), col("event_type").as("state"),
          unix_millis(col("ts")).as("vf"), col("event_id").as("vid"))
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("user_id"), unix_millis(col("ts")).as("pts"),
          col("event_id").as("pid"))
      // strictly-before lookup ((vf, vid) < (pts, pid)) — the purchase's
      // OWN version change must not answer its own lookup; a purchase
      // with no prior state attributes to 'none' (the LEFT join leg)
      val att = purchases.join(versions, Seq("user_id"))
        .filter(col("vf") < col("pts") ||
          (col("vf") === col("pts") && col("vid") < col("pid")))
        .groupBy(col("user_id"), col("pid"))
        .agg(expr("max_by(state, struct(vf, vid))").as("sab"))
      purchases.join(att, Seq("user_id", "pid"), "left")
        .withColumn("state_at_purchase", coalesce(col("sab"), lit("none")))
        .groupBy(col("state_at_purchase"))
        .agg(count(lit(1)).as("n_purchases"),
          countDistinct(col("user_id")).as("n_users"))
        .orderBy(col("state_at_purchase"))
    },

    // -- e16: TIME-WEIGHTED average per user (the TimescaleDB
    //    time_weight('LOCF') aggregate): each observation's value holds
    //    until the next observation, so the average weights v_i by
    //    (t_{i+1} − t_i) over the user's observed span. Exact arithmetic
    //    discipline: value-cents × Δms accumulate as BIGINTs (order-free
    //    across any partitioning), one division at the end. One window
    //    pass for the lead(ts) (partitioned by user — bounded state),
    //    one map-side-combined rollup. --
    "e16_time_weighted_avg" -> { (s, dir) =>
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      Tables.df(s, dir, "events")
        .select(col("user_id"), col("ts"), col("event_id"),
          expr("CAST(round(value * 10000) AS BIGINT)").as("vc"),
          unix_millis(col("ts")).as("ms"))
        .withColumn("nxt", lead(col("ms"), 1).over(w))
        .groupBy(col("user_id"))
        .agg(count(lit(1)).as("n_events"),
          (max(col("ms")) - min(col("ms"))).as("span_ms"),
          sum(when(col("nxt").isNotNull, col("vc") * (col("nxt") - col("ms"))))
            .as("wsum"))
        .filter(col("span_ms") > 0)
        .select(col("user_id"), col("n_events"), col("span_ms"),
          round(col("wsum").cast("double") / 10000.0 / col("span_ms"), 6).as("twa"))
        .orderBy(col("user_id"))
    },

    // -- e17: seasonal decomposition (classical additive: trend by
    //    centered 25-hour moving average, seasonal index = mean of the
    //    detrended series per hour-of-day — the MADlib/forecasting
    //    pre-step; PG ecosystems run this shape via window functions
    //    exactly like this). Scale shape: the series windows partition
    //    by event_type (one series per partition — never a corpus-wide
    //    unpartitioned window); the hourly pre-aggregate collapses the
    //    raw events first, so the window input is |hours|, not |events|.
    //    Exactness: hourly sums are 1e-4-unit BIGINTs; the trend enters
    //    the seasonal mean as its exact window SUM (count-25 full
    //    windows only), so seasonal = (25·Σy − Σtsum) / (25·n) is ONE
    //    double division over exact integers — any partitioning, any
    //    merge order, same bits --
    "e17_seasonal_decompose" -> { (s, dir) =>
      val hourly = Tables.df(s, dir, "events")
        .groupBy(col("event_type"), date_trunc("hour", col("ts")).as("h"))
        .agg(sum(expr("CAST(round(value * 10000) AS BIGINT)")).as("y"))
      val w = Window.partitionBy(col("event_type")).orderBy(col("h"))
        .rowsBetween(-12, 12)
      hourly
        .withColumn("tsum", sum(col("y")).over(w))
        .withColumn("tcnt", count(lit(1)).over(w))
        .filter(col("tcnt") === 25) // full centered windows only
        .withColumn("hod", hour(col("h")).cast("bigint"))
        .groupBy(col("event_type"), col("hod"))
        .agg(count(lit(1)).as("n"),
          sum(col("y")).as("sum_y"), sum(col("tsum")).as("sum_t"))
        .select(col("event_type"), col("hod"), col("n"),
          round((lit(25L) * col("sum_y") - col("sum_t")).cast("double") /
            (lit(25.0) * col("n")) / 10000.0, 6).as("seasonal"))
        .orderBy(col("event_type"), col("hod"))
    },

    // -- e18: marketing attribution — for every purchase, the LAST and
    //    FIRST preceding touchpoint (click/view) by the same user
    //    within a 7-day lookback (last-touch / first-touch attribution,
    //    the funnel-analytics counterpart of e03's as-of join). Shape:
    //    ONE equi-join on user_id (both sides shuffle-aligned; the
    //    range predicate runs co-located), then min/max(struct) picks
    //    both endpoints in a single map-side-combinable aggregate — no
    //    window, no per-purchase rescan, exactly e03's discipline.
    //    Ties break on event_id through the struct order --
    "e18_attribution" -> { (s, dir) =>
      val ev = Tables.df(s, dir, "events")
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("event_id").as("p_id"), col("user_id"), col("ts").as("p_ts"))
      // rename the touch side's user_id BEFORE joining: both frames
      // derive from the same scan, so purchases("user_id") and
      // touches("user_id") can resolve to one attribute (the Spark
      // self-join reference trap) and drop() would keep the wrong one
      val touches = ev.filter(col("event_type").isin("click", "view"))
        .select(col("user_id").as("t_uid"), col("event_type").as("t_type"),
          col("event_id").as("t_id"), col("ts").as("t_ts"))
      purchases
        .join(touches,
          col("user_id") === col("t_uid") &&
          col("t_ts") < col("p_ts") &&
          col("t_ts") >= col("p_ts") - expr("INTERVAL 7 DAY"), "left_outer")
        .groupBy(col("p_id"), col("user_id"), col("p_ts"))
        // wrap in when(): an unmatched left row yields struct(null,…) —
        // a NON-null struct that min() would pick as the first touch;
        // the when() turns it into a true NULL that min/max skip
        .agg(count(col("t_id")).as("n_touches"),
          max(when(col("t_id").isNotNull,
            struct(col("t_ts"), col("t_id"), col("t_type")))).as("last_t"),
          min(when(col("t_id").isNotNull,
            struct(col("t_ts"), col("t_id"), col("t_type")))).as("first_t"))
        .select(col("p_id"), col("user_id"), col("n_touches"),
          col("last_t.t_type").as("last_touch_type"),
          col("last_t.t_id").as("last_touch_id"),
          col("first_t.t_type").as("first_touch_type"),
          col("first_t.t_id").as("first_touch_id"))
        .orderBy(col("p_id"))
    },

    // -- e19: as-of join, DIRECTION + TOLERANCE variants — the full
    //    pandas merge_asof / kdb aj surface next to e03's backward-only
    //    form: for each purchase, the user's latest order at-or-before
    //    (backward), earliest at-or-after (forward), and NEAREST by
    //    absolute gap (ties to the earlier order, then lower key), all
    //    within a ±7-day tolerance. ONE user-aligned equi-join feeds
    //    all three picks — each is a min/max(struct) aggregate whose
    //    leading field encodes its direction's ordering, so the pair
    //    stream is scanned once, map-side combined, never windowed.
    //    (Right side = the user's signup events: both streams live in
    //    event time, so the tolerance does real work — orders' 1990s
    //    dates would make a ±7d band vacuously empty.) --
    "e19_asof_nearest" -> { (s, dir) =>
      val tolMs = 7L * 86400000L
      val p = Tables.df(s, dir, "events")
        .filter(col("event_type") === "purchase")
        .select(col("event_id").as("p_id"), col("user_id"),
          unix_millis(col("ts")).as("p_ms"))
      val o = Tables.df(s, dir, "events")
        .filter(col("event_type") === "signup")
        .select(col("user_id"), col("event_id").as("o_orderkey"),
          unix_millis(col("ts")).as("o_ms"))
      // tolerance lives INSIDE the pick conditions, not a row filter: a
      // purchase whose only orders fall outside ±7d must still emit its
      // row with NULL picks (merge_asof keeps the left row)
      p.join(o, Seq("user_id"), "left_outer")
        .withColumn("gap", col("o_ms") - col("p_ms"))
        .groupBy(col("p_id"), col("user_id"))
        .agg(
          max(when(col("gap").between(-tolMs, 0),
            struct(col("o_ms"), (-col("o_orderkey")).as("nk")))).as("bwd"),
          min(when(col("gap").between(0, tolMs),
            struct(col("o_ms"), col("o_orderkey")))).as("fwd"),
          min(when(abs(col("gap")) <= tolMs,
            struct(abs(col("gap")).as("ad"), col("o_ms"), col("o_orderkey"))))
            .as("nst"))
        .select(col("p_id"), col("user_id"),
          (-col("bwd.nk")).as("bwd_signup_id"),
          col("fwd.o_orderkey").as("fwd_signup_id"),
          col("nst.o_orderkey").as("nearest_signup_id"),
          expr("nst.ad DIV 3600000").as("nearest_gap_hours"))
        .orderBy(col("p_id"))
    },

    // -- e21: LINEAR (fractional) attribution — the credit-splitting
    //    counterpart of e18's first/last-touch: every click/view in
    //    the purchase's 7-day lookback gets 1/n_touches of the
    //    conversion credit, rolled up per channel (the multi-touch
    //    model marketing stacks report next to first/last). Exactness:
    //    credit is a RATIONAL per purchase — summing doubles of 1/3s
    //    across engines drifts — so credit aggregates as exact
    //    micro-credit BIGINTs: round(1e6/n) per touch plus a
    //    remainder term folded into the FIRST touch (largest-remainder
    //    method), making the per-channel totals integer-exact and the
    //    grand total exactly 1e6 × conversions. Shapes: the same ONE
    //    user-aligned equi-join as e18, a per-purchase census, one
    //    channel rollup --
    "e21_linear_attribution" -> { (s, dir) =>
      val ev = Tables.df(s, dir, "events")
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("event_id").as("p_id"), col("user_id"), col("ts").as("p_ts"))
      val touches = ev.filter(col("event_type").isin("click", "view"))
        .select(col("user_id").as("t_uid"), col("event_type").as("t_type"),
          col("event_id").as("t_id"), col("ts").as("t_ts"))
      val attributed = purchases
        .join(touches,
          col("user_id") === col("t_uid") &&
          col("t_ts") < col("p_ts") &&
          col("t_ts") >= col("p_ts") - expr("INTERVAL 7 DAY"))
        .withColumn("n_touches",
          count(lit(1)).over(Window.partitionBy(col("p_id"))))
        .withColumn("rk", row_number().over(
          Window.partitionBy(col("p_id")).orderBy(col("t_ts"), col("t_id"))))
        .withColumn("credit_u",
          expr("""CAST(1000000 DIV n_touches AS BIGINT) +
                  CASE WHEN rk = 1 THEN 1000000 % n_touches ELSE 0L END"""))
      attributed.groupBy(col("t_type"))
        .agg(count(lit(1)).as("n_touches_total"),
          countDistinct(col("p_id")).as("n_conversions_touched"),
          sum(col("credit_u")).as("credit_u"))
        .select(col("t_type"), col("n_touches_total"),
          col("n_conversions_touched"),
          round(col("credit_u").cast("double") / 1000000.0, 6).as("credit"))
        .orderBy(col("t_type"))
    },

    // -- e20: rolling exact MEDIAN — robust smoothing over a 24-event
    //    frame per user (the outlier-resistant counterpart of e15's
    //    EWMA; PG expresses it as percentile_cont OVER, an ordered-set
    //    agg in a window frame). Spark evaluates the percentile
    //    aggregate per frame; the frame is ROWS-bounded (24), so the
    //    per-row cost is constant and the window partitions by user —
    //    never corpus-wide. vc is the 1e-4-unit BIGINT, so the only
    //    doubles are midpoint interpolation over exact ints — both
    //    engines produce identical halves --
    "e20_rolling_median" -> { (s, dir) =>
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id")).rowsBetween(-23, 0)
      Tables.df(s, dir, "events")
        .select(col("user_id"), col("event_id"), col("ts"),
          expr("CAST(round(value * 10000) AS BIGINT)").as("vc"))
        .withColumn("n_in_frame", count(lit(1)).over(w))
        .withColumn("med", round(
          expr("percentile(vc, 0.5)").over(w) / lit(10000.0), 6))
        .select(col("user_id"), col("event_id"), col("n_in_frame"), col("med"))
        .orderBy(col("user_id"), col("event_id"))
    },

    // -- e12: SCD Type-2 dimension build. Each user's event_type stream
    //    collapses to change rows (lag ≠ current — island detection),
    //    then lead() closes each version's [valid_from, valid_to) —
    //    the standard warehouse history-table construction the
    //    reference expresses as MERGE + triggers. Durations in exact
    //    epoch-ms BIGINTs. Scale shape: both windows partition by
    //    user_id (no global sort); the second window runs on the
    //    COLLAPSED change rows, a small fraction of the corpus. --
    "e12_scd2_history" -> { (s, dir) =>
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      val changes = Tables.df(s, dir, "events")
        .withColumn("prev_type", lag(col("event_type"), 1).over(w))
        .filter(col("prev_type").isNull || col("prev_type") =!= col("event_type"))
        .select(col("user_id"), col("event_type"), col("event_id"),
          unix_millis(col("ts")).as("ms"))
      val w2 = Window.partitionBy(col("user_id")).orderBy(col("ms"), col("event_id"))
      changes
        .withColumn("to_ms", lead(col("ms"), 1).over(w2))
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n_versions"),
          sum(when(col("to_ms").isNull, 1L).otherwise(0L)).as("n_open"),
          sum(when(col("to_ms").isNull, 0L).otherwise(col("to_ms") - col("ms")))
            .cast("bigint").as("dur_ms"),
          max(col("to_ms") - col("ms")).as("max_dur_ms"))
        .orderBy(col("event_type"))
    },

    // -- tumbling-window rollup (event-time bucketing) --
    "e01_hourly_rollup" -> { (s, dir) =>
      Tables.df(s, dir, "events")
        .groupBy(date_trunc("hour", col("ts")).as("hour"), col("event_type"))
        .agg(count(lit(1)).as("n"),
          expr("round(CAST(sum(CAST(round(value * 10000) AS BIGINT)) AS DOUBLE) / 10000.0, 4)").as("total_value"))
        .orderBy(col("hour"), col("event_type"))
    },

    // -- sessionization: 30-minute inactivity gap, window + prefix sum --
    "e02_sessionize" -> { (s, dir) =>
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      val withGap = Tables.df(s, dir, "events")
        .withColumn("prev_ms", lag(unix_millis(col("ts")), 1).over(w))
        .withColumn("new_session",
          when(col("prev_ms").isNull || unix_millis(col("ts")) - col("prev_ms") > 30L * 60 * 1000, 1L)
            .otherwise(0L))
      withGap
        .withColumn("session_id", sum(col("new_session")).over(
          w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .groupBy(col("user_id"))
        .agg(
          max(col("session_id")).as("n_sessions"),
          count(lit(1)).as("n_events"))
        .orderBy(col("user_id"))
    },

    // -- as-of join: latest order at-or-before each event (MergeJoin range) --
    "e03_asof_last_order" -> { (s, dir) =>
      val e = Tables.df(s, dir, "events").filter(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"), col("ts"))
      val o = Tables.df(s, dir, "orders")
        .select(col("o_custkey"), col("o_orderkey"), col("o_orderdate"))
      // Join on user, keep orders at-or-before the event, take the latest
      // (ties broken by orderkey). Equi-join on user shuffles both sides by
      // the same key, so the range filter runs co-located — no broadcast of
      // the big side at scale. The "latest" pick is a lexicographic
      // max(struct) aggregate — map-side partial max collapses the pair
      // explosion inside the join stage, and there is no second
      // sort-shuffle (round-1 used row_number over a window, which added
      // one). struct(null,null) from unmatched left rows sorts below any
      // real order, preserving left-outer semantics.
      val joined = e.join(o, col("user_id") === col("o_custkey") && col("o_orderdate") <= col("ts"), "left_outer")
      joined
        .groupBy(col("event_id"), col("user_id"))
        .agg(max(struct(col("o_orderdate"), col("o_orderkey"))).as("best"))
        .select(col("event_id"), col("user_id"),
          col("best.o_orderkey").as("last_orderkey"),
          col("best.o_orderdate").as("last_orderdate"))
        .orderBy(col("event_id"))
    },

    // -- funnel: users who signed up before first purchase --
    "e04_signup_purchase_funnel" -> { (s, dir) =>
      val e = Tables.df(s, dir, "events")
      val firstByType = e.filter(col("event_type").isin("signup", "purchase"))
        .groupBy(col("user_id"))
        .agg(
          min(when(col("event_type") === "signup", col("ts"))).as("first_signup"),
          min(when(col("event_type") === "purchase", col("ts"))).as("first_purchase"))
      firstByType
        .select(col("user_id"),
          (col("first_signup").isNotNull).cast("int").as("signed_up"),
          (col("first_purchase").isNotNull).cast("int").as("purchased"),
          (col("first_signup").isNotNull && col("first_purchase").isNotNull
            && col("first_signup") < col("first_purchase")).cast("int").as("converted"))
        .orderBy(col("user_id"))
    },

    // -- event-type daily share (window over aggregate) --
    "e05_daily_type_share" -> { (s, dir) =>
      val daily = Tables.df(s, dir, "events")
        .groupBy(date_trunc("day", col("ts")).as("day"), col("event_type"))
        .agg(count(lit(1)).as("n"))
      val w = Window.partitionBy(col("day"))
      daily
        .withColumn("day_total", sum(col("n")).over(w))
        .select(col("day"), col("event_type"), col("n"),
          round(col("n").cast("double") / col("day_total"), 9).as("share"))
        .orderBy(col("day"), col("event_type"))
    },

    // -- native session windows: gap-merged event-time sessions --
    // Spark's session_window (batch + streaming) IS the e02 gap logic as
    // a first-class operator: windows merge while events arrive within
    // the 30-minute gap; window end = last event + gap.
    "e06_session_window" -> { (s, dir) =>
      Tables.df(s, dir, "events")
        .groupBy(col("user_id"), session_window(col("ts"), "30 minutes"))
        .agg(count(lit(1)).as("n_events"))
        .select(col("user_id"),
          col("session_window.start").as("session_start"),
          col("session_window.end").as("session_end"),
          col("n_events"))
        .orderBy(col("user_id"), col("session_start"))
    },

    // -- time-series gap fill + LOCF (the time_bucket_gapfill /
    //    interpolate idiom): densify each user's hourly series over its
    //    own [min, max] span, then carry the last observation forward
    //    into empty hours. Plan at scale: the observation aggregate is
    //    one shuffle on (user, hour) with a map-side partial max(struct)
    //    pick of the latest reading; the grid explodes one row per
    //    user-hour from a 2-column bounds aggregate (never from raw
    //    events); the fill is a single user-partitioned window — grid
    //    size is users × hours regardless of event volume --
    // -- z-score anomaly flags: per-type population mean/σ in exact
    //    fixed-point components (n, Σc, Σc²) — the i09 variance state —
    //    then a BROADCAST of the |types|-row stats back over the stream.
    //    Two linear passes, no window, no self-shuffle; the identical
    //    double arithmetic runs in the oracle so the >3σ cut can't
    //    straddle engines --
    "e11_anomaly_zscore" -> { (s, dir) =>
      val ev = Tables.df(s, dir, "events")
        .withColumn("c", expr("CAST(round(value * 100) AS BIGINT)"))
      val stats = ev.groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"), sum(col("c")).as("sm"), sum(expr("c * c")).as("s2"))
      val z = """(CAST(c AS DOUBLE) - CAST(sm AS DOUBLE) / n) /
                 sqrt(greatest(CAST(s2 AS DOUBLE) / n
                   - (CAST(sm AS DOUBLE) / n) * (CAST(sm AS DOUBLE) / n), 1e-12))"""
      ev.join(broadcast(stats), Seq("event_type"))
        .withColumn("z", expr(z))
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n_events"),
          sum(expr("CASE WHEN abs(z) > 3 THEN 1 ELSE 0 END")).cast("bigint").as("n_anomalies"),
          round(max(abs(col("z"))), 6).as("max_abs_z"))
        .orderBy(col("event_type"))
    },

    // -- OHLC bars (min_by/max_by ≙ PG's first/last ordered-set pair):
    //    open/close are arg-min/arg-max over a composite (ts, event_id)
    //    key packed into a fixed-width string so ties break identically
    //    on both engines; ONE hash aggregate, no window sort --
    "e10_ohlc_bars" -> { (s, dir) =>
      Tables.df(s, dir, "events")
        .withColumn("hour", date_trunc("hour", col("ts")))
        .withColumn("k", concat(
          lpad(unix_micros(col("ts")).cast("string"), 20, "0"),
          lpad(col("event_id").cast("string"), 12, "0")))
        .groupBy(col("event_type"), col("hour"))
        .agg(
          round(min_by(col("value"), col("k")), 4).as("open"),
          round(max(col("value")), 4).as("high"),
          round(min(col("value")), 4).as("low"),
          round(max_by(col("value"), col("k")), 4).as("close"),
          count(lit(1)).as("n"))
        .orderBy(col("event_type"), col("hour"))
    },

    // -- ordered windowed funnel (the N-step generalization of e04):
    //    signup → click → purchase must occur in first-occurrence order,
    //    with the whole path inside 14 days of the signup. ONE shuffle
    //    (conditional min per user); the step logic is a pure projection
    //    over the three firsts — no joins, no window sort --
    "e09_windowed_funnel" -> { (s, dir) =>
      Tables.df(s, dir, "events")
        .filter(col("event_type").isin("signup", "click", "purchase"))
        .groupBy(col("user_id"))
        .agg(
          min(when(col("event_type") === "signup", col("ts"))).as("ts_s"),
          min(when(col("event_type") === "click", col("ts"))).as("ts_c"),
          min(when(col("event_type") === "purchase", col("ts"))).as("ts_p"))
        .select(expr("""
          CASE WHEN ts_s IS NULL THEN 0
               WHEN ts_c IS NULL OR ts_c <= ts_s THEN 1
               WHEN ts_p IS NULL OR ts_p <= ts_c
                    OR ts_p > ts_s + INTERVAL 14 DAYS THEN 2
               ELSE 3 END""").cast("bigint").as("steps_completed"))
        .groupBy(col("steps_completed"))
        .agg(count(lit(1)).as("n_users"))
        .orderBy(col("steps_completed"))
    },

    // -- retention cohorts: signup-week × weeks-since matrix, the
    //    canonical product-analytics rollup. Spark-first: ONE hash
    //    aggregate per user collapses the raw stream to (first_ts,
    //    distinct active weeks) — map-side combined, no window sort, no
    //    self-join — and because each user then contributes each week
    //    exactly once, the cohort rollup is a plain count, not a
    //    DISTINCT aggregate (no Expand, no second dedup shuffle). At
    //    100 TB the shuffle carries |users|·|weeks-per-user| rows, the
    //    minimum possible for this matrix --
    "e08_retention_cohorts" -> { (s, dir) =>
      Tables.df(s, dir, "events")
        .withColumn("wk", date_trunc("week", col("ts")).cast("date"))
        .groupBy(col("user_id"))
        .agg(min(col("ts")).as("first_ts"), collect_set(col("wk")).as("weeks"))
        .withColumn("cohort_week", date_trunc("week", col("first_ts")).cast("date"))
        .select(col("cohort_week"), explode(col("weeks")).as("wk"))
        .groupBy(col("cohort_week"),
          (datediff(col("wk"), col("cohort_week")) / 7).cast("bigint").as("week_offset"))
        .agg(count(lit(1)).as("n_users"))
        .orderBy(col("cohort_week"), col("week_offset"))
    },

    "e07_gapfill" -> { (s, dir) =>
      val obs = Tables.df(s, dir, "events")
        .filter(col("user_id") <= 20)
        .withColumn("hour", date_trunc("hour", col("ts")))
        .withColumn("vcents", expr("CAST(round(value * 10000) AS BIGINT)"))
        .groupBy(col("user_id"), col("hour"))
        .agg(max(struct(col("ts"), col("event_id"), col("vcents")))
            .getField("vcents").as("v_obs"),
          count(lit(1)).as("n_obs"))
      val grid = obs.groupBy(col("user_id"))
        .agg(min(col("hour")).as("h0"), max(col("hour")).as("h1"))
        .select(col("user_id"),
          explode(expr("sequence(h0, h1, interval 1 hour)")).as("hour"))
      val w = Window.partitionBy(col("user_id")).orderBy(col("hour"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      grid.join(obs, Seq("user_id", "hour"), "left")
        .select(col("user_id"), col("hour"),
          coalesce(col("n_obs"), lit(0L)).as("n_obs"),
          round(last(col("v_obs"), ignoreNulls = true).over(w)
            .cast("double") / 10000.0, 4).as("v_locf"))
        .orderBy(col("user_id"), col("hour"))
    }
  )

  def oracle: Map[String, String] = Map(
    // the oracle runs the overlap join NAIVELY (nested-loop range
    // predicate) — same semantics the banded plan must reproduce
    "e14_interval_join" -> """
      WITH a AS (
        SELECT user_id, CAST(ts AS DATE) AS day,
               epoch_ms(min(ts)) AS a_lo, epoch_ms(max(ts)) AS a_hi
        FROM events GROUP BY 1, 2),
      b AS (
        SELECT event_type,
               epoch_ms(ts) - 1800000 AS b_lo, epoch_ms(ts) + 1800000 AS b_hi
        FROM events WHERE value > 200.0)
      SELECT event_type, count(*) AS n_overlaps,
             count(DISTINCT user_id) AS n_users,
             CAST(sum(least(a_hi, b_hi) - greatest(a_lo, b_lo)) AS BIGINT)
               AS overlap_ms
      FROM a JOIN b ON a_lo <= b_hi AND b_lo <= a_hi
      GROUP BY event_type ORDER BY event_type""",

    "e12_scd2_history" -> """
      WITH o AS (
        SELECT user_id, event_type, event_id, epoch_ms(ts) AS ms,
               lag(event_type) OVER (PARTITION BY user_id
                 ORDER BY ts, event_id) AS prev_type
        FROM events),
      ch AS (
        SELECT user_id, event_type, event_id, ms
        FROM o WHERE prev_type IS NULL OR prev_type <> event_type),
      v AS (
        SELECT event_type, ms,
               lead(ms) OVER (PARTITION BY user_id
                 ORDER BY ms, event_id) AS to_ms
        FROM ch)
      SELECT event_type, count(*) AS n_versions,
        CAST(sum(CASE WHEN to_ms IS NULL THEN 1 ELSE 0 END) AS BIGINT)
          AS n_open,
        CAST(sum(CASE WHEN to_ms IS NULL THEN 0 ELSE to_ms - ms END)
          AS BIGINT) AS dur_ms,
        CAST(max(to_ms - ms) AS BIGINT) AS max_dur_ms
      FROM v GROUP BY event_type ORDER BY event_type""",

    // same densify-and-fill, spelled with generate_series + IGNORE NULLS
    "e11_anomaly_zscore" -> """
      SELECT event_type, count(*) AS n_events,
        CAST(sum(CASE WHEN abs(z) > 3 THEN 1 ELSE 0 END) AS BIGINT) AS n_anomalies,
        round(max(abs(z)), 6) AS max_abs_z
      FROM (
        SELECT e.event_type,
          (CAST(c AS DOUBLE) - CAST(sm AS DOUBLE) / n) /
            sqrt(greatest(CAST(s2 AS DOUBLE) / n
              - (CAST(sm AS DOUBLE) / n) * (CAST(sm AS DOUBLE) / n), 1e-12)) AS z
        FROM (SELECT event_type, CAST(round(value * 100) AS BIGINT) AS c FROM events) e
        JOIN (SELECT event_type, count(*) AS n, sum(c) AS sm, sum(c * c) AS s2
              FROM (SELECT event_type, CAST(round(value * 100) AS BIGINT) AS c
                    FROM events) i
              GROUP BY event_type) st USING (event_type)) t
      GROUP BY event_type ORDER BY event_type""",

    "e10_ohlc_bars" -> """
      SELECT event_type, date_trunc('hour', ts) AS hour,
        round(arg_min(value, k), 4) AS open,
        round(max(value), 4) AS high,
        round(min(value), 4) AS low,
        round(arg_max(value, k), 4) AS close,
        count(*) AS n
      FROM (
        SELECT event_type, ts, value,
          lpad(CAST(epoch_us(ts) AS VARCHAR), 20, '0')
            || lpad(CAST(event_id AS VARCHAR), 12, '0') AS k
        FROM events) t
      GROUP BY 1, 2 ORDER BY event_type, hour""",

    "e09_windowed_funnel" -> """
      SELECT steps_completed, count(*) AS n_users
      FROM (
        SELECT CAST(CASE WHEN ts_s IS NULL THEN 0
                         WHEN ts_c IS NULL OR ts_c <= ts_s THEN 1
                         WHEN ts_p IS NULL OR ts_p <= ts_c
                              OR ts_p > ts_s + INTERVAL 14 DAY THEN 2
                         ELSE 3 END AS BIGINT) AS steps_completed
        FROM (
          SELECT user_id,
            min(CASE WHEN event_type = 'signup' THEN ts END) AS ts_s,
            min(CASE WHEN event_type = 'click' THEN ts END) AS ts_c,
            min(CASE WHEN event_type = 'purchase' THEN ts END) AS ts_p
          FROM events
          WHERE event_type IN ('signup', 'click', 'purchase')
          GROUP BY user_id) f) g
      GROUP BY steps_completed ORDER BY steps_completed""",

    "e08_retention_cohorts" -> """
      SELECT CAST(date_trunc('week', first_ts) AS DATE) AS cohort_week,
        CAST(date_diff('day', CAST(date_trunc('week', first_ts) AS DATE),
                       CAST(date_trunc('week', ts) AS DATE)) / 7 AS BIGINT) AS week_offset,
        count(DISTINCT user_id) AS n_users
      FROM (SELECT user_id, ts, min(ts) OVER (PARTITION BY user_id) AS first_ts
            FROM events) w
      GROUP BY 1, 2 ORDER BY 1, 2""",

    "e07_gapfill" -> """
      WITH raw AS (
        SELECT user_id, date_trunc('hour', ts) AS hour,
          CAST(round(value * 10000) AS BIGINT) AS vcents,
          row_number() OVER (PARTITION BY user_id, date_trunc('hour', ts)
            ORDER BY ts DESC, event_id DESC) AS rn,
          count(*) OVER (PARTITION BY user_id, date_trunc('hour', ts)) AS n_obs
        FROM events WHERE user_id <= 20),
      obs AS (SELECT user_id, hour, vcents AS v_obs, n_obs FROM raw WHERE rn = 1),
      bounds AS (SELECT user_id, min(hour) AS h0, max(hour) AS h1 FROM obs GROUP BY user_id),
      grid AS (SELECT user_id, unnest(generate_series(h0, h1, INTERVAL 1 HOUR)) AS hour FROM bounds)
      SELECT g.user_id, g.hour,
        coalesce(o.n_obs, 0) AS n_obs,
        round(CAST(last_value(o.v_obs IGNORE NULLS) OVER (
          PARTITION BY g.user_id ORDER BY g.hour
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) / 10000.0, 4) AS v_locf
      FROM grid g LEFT JOIN obs o ON g.user_id = o.user_id AND g.hour = o.hour
      ORDER BY g.user_id, g.hour""",
    "e06_session_window" -> """
      SELECT user_id, min(ts) AS session_start,
        max(ts) + INTERVAL 30 MINUTE AS session_end,
        count(*) AS n_events
      FROM (
        SELECT user_id, ts,
          sum(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
        FROM (
          SELECT user_id, ts, event_id,
            CASE WHEN prev_ms IS NULL OR epoch_ms(ts) - prev_ms > 30*60*1000
                 THEN 1 ELSE 0 END AS new_session
          FROM (
            SELECT user_id, ts, event_id,
              lag(epoch_ms(ts), 1) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ms
            FROM events) a) b) c
      GROUP BY user_id, session_id
      ORDER BY user_id, session_start""",
    "e01_hourly_rollup" -> """
      SELECT date_trunc('hour', ts) AS hour, event_type,
        count(*) AS n,
        round(CAST(sum(CAST(round(value * 10000) AS BIGINT)) AS DOUBLE) / 10000.0, 4) AS total_value
      FROM events GROUP BY 1, 2 ORDER BY hour, event_type""",

    "e02_sessionize" -> """
      SELECT user_id, CAST(max(session_id) AS BIGINT) AS n_sessions, count(*) AS n_events FROM (
        SELECT user_id,
          sum(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
        FROM (
          SELECT user_id, ts, event_id,
            CASE WHEN prev_ms IS NULL OR epoch_ms(ts) - prev_ms > 30*60*1000
                 THEN 1 ELSE 0 END AS new_session
          FROM (
            SELECT user_id, ts, event_id,
              lag(epoch_ms(ts), 1) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ms
            FROM events) a) b) c
      GROUP BY user_id ORDER BY user_id""",

    "e03_asof_last_order" -> """
      SELECT event_id, user_id, last_orderkey, last_orderdate FROM (
        SELECT e.event_id, e.user_id, o.o_orderkey AS last_orderkey,
          o.o_orderdate AS last_orderdate,
          row_number() OVER (PARTITION BY e.event_id
            ORDER BY o.o_orderdate DESC, o.o_orderkey DESC) AS rn
        FROM (SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase') e
        LEFT JOIN orders o
          ON e.user_id = o.o_custkey AND o.o_orderdate <= e.ts) t
      WHERE rn = 1 ORDER BY event_id""",

    "e04_signup_purchase_funnel" -> """
      SELECT user_id,
        CAST(CASE WHEN first_signup IS NOT NULL THEN 1 ELSE 0 END AS INTEGER) AS signed_up,
        CAST(CASE WHEN first_purchase IS NOT NULL THEN 1 ELSE 0 END AS INTEGER) AS purchased,
        CAST(CASE WHEN first_signup IS NOT NULL AND first_purchase IS NOT NULL
             AND first_signup < first_purchase THEN 1 ELSE 0 END AS INTEGER) AS converted
      FROM (
        SELECT user_id,
          min(CASE WHEN event_type = 'signup' THEN ts END) AS first_signup,
          min(CASE WHEN event_type = 'purchase' THEN ts END) AS first_purchase
        FROM events WHERE event_type IN ('signup', 'purchase')
        GROUP BY user_id) t
      ORDER BY user_id""",

    "e05_daily_type_share" -> """
      SELECT day, event_type, n,
        round(CAST(n AS DOUBLE) / day_total, 9) AS share
      FROM (
        SELECT day, event_type, n, sum(n) OVER (PARTITION BY day) AS day_total
        FROM (
          SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day, event_type, count(*) AS n
          FROM events GROUP BY 1, 2) a) b
      ORDER BY day, event_type""",

    // list() with ORDER BY is the ordered collect; list_reduce seeds
    // with the first element, matching the Spark fold's init = vs[0].
    "e15_ewma" -> """
      WITH ordered AS (
        SELECT user_id, count(*) AS n_events,
          list(value ORDER BY ts, event_id) AS vs
        FROM events GROUP BY user_id)
      SELECT user_id, n_events,
        vs[1] AS v_first,
        vs[-1] AS v_last,
        round(list_reduce(vs,
          (a, b) -> CAST(0.2 AS DOUBLE) * b + CAST(0.8 AS DOUBLE) * a), 6) AS ewma
      FROM ordered ORDER BY user_id""",

    "e13_scd2_lookup" -> """
      WITH versions AS (
        SELECT user_id, event_type AS state,
          CAST(epoch_ms(ts) AS BIGINT) AS vf, event_id AS vid
        FROM (
          SELECT user_id, event_type, ts, event_id,
            lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_type
          FROM events) t
        WHERE prev_type IS NULL OR prev_type <> event_type),
      purchases AS (
        SELECT user_id, CAST(epoch_ms(ts) AS BIGINT) AS pts, event_id AS pid
        FROM events WHERE event_type = 'purchase'),
      looked AS (
        SELECT user_id, pid, state, row_number() OVER (
          PARTITION BY user_id, pid ORDER BY vf DESC, vid DESC) AS rn
        FROM purchases JOIN versions USING (user_id)
        WHERE vf < pts OR (vf = pts AND vid < pid)),
      att AS (SELECT user_id, pid, state FROM looked WHERE rn = 1)
      SELECT coalesce(att.state, 'none') AS state_at_purchase,
        count(*) AS n_purchases,
        count(DISTINCT p.user_id) AS n_users
      FROM purchases p LEFT JOIN att ON p.user_id = att.user_id AND p.pid = att.pid
      GROUP BY coalesce(att.state, 'none')
      ORDER BY state_at_purchase""",

    "e16_time_weighted_avg" -> """
      WITH obs AS (
        SELECT user_id, event_id,
          CAST(round(value * 10000) AS BIGINT) AS vc,
          CAST(epoch_ms(ts) AS BIGINT) AS ms,
          lead(CAST(epoch_ms(ts) AS BIGINT))
            OVER (PARTITION BY user_id ORDER BY ts, event_id) AS nxt
        FROM events),
      agg AS (
        SELECT user_id, count(*) AS n_events,
          CAST(max(ms) - min(ms) AS BIGINT) AS span_ms,
          CAST(sum(CASE WHEN nxt IS NOT NULL THEN vc * (nxt - ms) END) AS BIGINT) AS wsum
        FROM obs GROUP BY user_id)
      SELECT user_id, n_events, span_ms,
        round(CAST(wsum AS DOUBLE) / 10000.0 / span_ms, 6) AS twa
      FROM agg WHERE span_ms > 0 ORDER BY user_id""",

    "e17_seasonal_decompose" -> """
      WITH hourly AS (
        SELECT event_type, date_trunc('hour', ts) AS h,
          CAST(sum(CAST(round(value * 10000) AS BIGINT)) AS BIGINT) AS y
        FROM events GROUP BY 1, 2),
      trended AS (
        SELECT event_type, h, y,
          CAST(sum(y) OVER (PARTITION BY event_type ORDER BY h
            ROWS BETWEEN 12 PRECEDING AND 12 FOLLOWING) AS BIGINT) AS tsum,
          count(*) OVER (PARTITION BY event_type ORDER BY h
            ROWS BETWEEN 12 PRECEDING AND 12 FOLLOWING) AS tcnt
        FROM hourly)
      SELECT event_type, CAST(hour(h) AS BIGINT) AS hod, count(*) AS n,
        round(CAST(25 * sum(y) - sum(tsum) AS DOUBLE)
              / (25.0 * count(*)) / 10000.0, 6) AS seasonal
      FROM trended WHERE tcnt = 25
      GROUP BY event_type, hour(h)
      ORDER BY event_type, hod""",

    "e18_attribution" -> """
      WITH p AS (
        SELECT event_id AS p_id, user_id, ts AS p_ts
        FROM events WHERE event_type = 'purchase'),
      t AS (
        SELECT user_id, event_type AS t_type, event_id AS t_id, ts AS t_ts
        FROM events WHERE event_type IN ('click', 'view')),
      j AS (
        SELECT p.p_id, p.user_id, t.t_type, t.t_id, t.t_ts
        FROM p LEFT JOIN t ON p.user_id = t.user_id
          AND t.t_ts < p.p_ts AND t.t_ts >= p.p_ts - INTERVAL 7 DAY),
      ranked AS (
        SELECT p_id, user_id, t_type, t_id,
          row_number() OVER (PARTITION BY p_id ORDER BY t_ts DESC, t_id DESC) AS rl,
          row_number() OVER (PARTITION BY p_id ORDER BY t_ts ASC, t_id ASC) AS rf,
          count(t_id) OVER (PARTITION BY p_id) AS n_touches
        FROM j)
      SELECT l.p_id, l.user_id, CAST(l.n_touches AS BIGINT) AS n_touches,
        l.t_type AS last_touch_type, l.t_id AS last_touch_id,
        f.t_type AS first_touch_type, f.t_id AS first_touch_id
      FROM (SELECT * FROM ranked WHERE rl = 1) l
      JOIN (SELECT * FROM ranked WHERE rf = 1) f USING (p_id)
      ORDER BY l.p_id""",

    "e19_asof_nearest" -> """
      WITH p AS (
        SELECT event_id AS p_id, user_id, CAST(epoch_ms(ts) AS BIGINT) AS p_ms
        FROM events WHERE event_type = 'purchase'),
      o AS (
        SELECT user_id, event_id AS s_id, CAST(epoch_ms(ts) AS BIGINT) AS o_ms
        FROM events WHERE event_type = 'signup'),
      j AS (
        SELECT p.p_id, p.user_id, o.s_id, o.o_ms,
          o.o_ms - p.p_ms AS gap
        FROM p LEFT JOIN o ON p.user_id = o.user_id),
      bwd AS (
        SELECT p_id, s_id FROM (
          SELECT p_id, s_id, row_number() OVER (
            PARTITION BY p_id ORDER BY o_ms DESC, s_id ASC) AS rn
          FROM j WHERE gap BETWEEN -604800000 AND 0) t WHERE rn = 1),
      fwd AS (
        SELECT p_id, s_id FROM (
          SELECT p_id, s_id, row_number() OVER (
            PARTITION BY p_id ORDER BY o_ms ASC, s_id ASC) AS rn
          FROM j WHERE gap BETWEEN 0 AND 604800000) t WHERE rn = 1),
      nst AS (
        SELECT p_id, s_id, ad FROM (
          SELECT p_id, s_id, abs(gap) AS ad, row_number() OVER (
            PARTITION BY p_id ORDER BY abs(gap) ASC, o_ms ASC, s_id ASC) AS rn
          FROM j WHERE abs(gap) <= 604800000) t WHERE rn = 1)
      SELECT p.p_id, p.user_id,
        bwd.s_id AS bwd_signup_id,
        fwd.s_id AS fwd_signup_id,
        nst.s_id AS nearest_signup_id,
        nst.ad // 3600000 AS nearest_gap_hours
      FROM p
      LEFT JOIN bwd ON p.p_id = bwd.p_id
      LEFT JOIN fwd ON p.p_id = fwd.p_id
      LEFT JOIN nst ON p.p_id = nst.p_id
      ORDER BY p.p_id""",

    "e20_rolling_median" -> """
      SELECT user_id, event_id,
        count(*) OVER w AS n_in_frame,
        round(quantile_cont(CAST(round(value * 10000) AS BIGINT), 0.5) OVER w
              / CAST(10000 AS DOUBLE), 6) AS med
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN 23 PRECEDING AND CURRENT ROW)
      ORDER BY user_id, event_id""",

    "e21_linear_attribution" -> """
      WITH p AS (
        SELECT event_id AS p_id, user_id, ts AS p_ts
        FROM events WHERE event_type = 'purchase'),
      t AS (
        SELECT user_id AS t_uid, event_type AS t_type, event_id AS t_id, ts AS t_ts
        FROM events WHERE event_type IN ('click', 'view')),
      j AS (
        SELECT p.p_id, t.t_type, t.t_id,
          count(*) OVER (PARTITION BY p.p_id) AS n_touches,
          row_number() OVER (PARTITION BY p.p_id ORDER BY t.t_ts, t.t_id) AS rk
        FROM p JOIN t ON p.user_id = t.t_uid
          AND t.t_ts < p.p_ts AND t.t_ts >= p.p_ts - INTERVAL 7 DAY),
      c AS (
        SELECT t_type, p_id,
          CAST(1000000 // n_touches AS BIGINT) +
          CASE WHEN rk = 1 THEN 1000000 % n_touches ELSE 0 END AS credit_u
        FROM j)
      SELECT t_type, count(*) AS n_touches_total,
        count(DISTINCT p_id) AS n_conversions_touched,
        round(CAST(sum(credit_u) AS DOUBLE) / 1000000.0, 6) AS credit
      FROM c GROUP BY t_type ORDER BY t_type"""
  )
}
