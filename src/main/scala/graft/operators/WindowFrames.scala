package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** GROUPS window frames and frame EXCLUDE clauses as a SHARED rewriter
  * (reference: `src/include/nodes/parsenodes.h:631-658` frameOptions —
  * FRAMEOPTION_GROUPS, FRAMEOPTION_EXCLUDE_{CURRENT_ROW,GROUP,TIES};
  * executor `src/backend/executor/nodeWindowAgg.c` row_is_in_frame).
  * Spark has neither; both reduce to compositions of RANGE windows:
  *
  *  - GROUPS n PRECEDING..m FOLLOWING ⟺ RANGE n..m over the ORDER
  *    key's dense_rank (peer groups are exactly the dense_rank levels);
  *  - EXCLUDE over any RANGE frame ⟺ frame aggregate minus the peer
  *    group's (RANGE frames contain WHOLE peer groups by definition, so
  *    peer-sum subtraction is exact — this is precisely why the same
  *    rewrite is NOT valid for ROWS frames, which can split a peer
  *    group at the frame edge; callers with ROWS+EXCLUDE must go
  *    through GROUPS first).
  *
  * The r16 verdict asked for these promoted from per-query spellings
  * (q63/q64/q72/q93) to one rewriter with property tests vs the
  * ROWS/RANGE semantics — WindowFramesSpec holds the brute-force
  * equivalence properties, including the null cases below.
  *
  * Null semantics match PG's sum-over-remaining-rows exactly: the
  * subtraction spelling alone would return NULL whenever the current
  * row's value is NULL (x - NULL) and 0 (not NULL) when every remaining
  * value is NULL — so the rewrite carries a remaining-non-null COUNT
  * and CASEs to NULL exactly when PG's sum over the post-exclusion
  * frame would be empty-of-non-nulls.
  */
object WindowFrames {

  sealed trait FrameExclusion
  /** EXCLUDE CURRENT ROW — drop only the row itself (peers stay). */
  case object ExcludeCurrentRow extends FrameExclusion
  /** EXCLUDE GROUP — drop the row AND all its ORDER-BY peers. */
  case object ExcludeGroup extends FrameExclusion
  /** EXCLUDE TIES — drop the peers but keep the row itself. */
  case object ExcludeTies extends FrameExclusion
  /** EXCLUDE NO OTHERS — the default: drop nothing. */
  case object ExcludeNoOthers extends FrameExclusion

  /** Add `out` = sum(value) OVER (PARTITION BY part ORDER BY ord
    * GROUPS BETWEEN lo AND hi) — lo/hi in peer-group units, negative =
    * PRECEDING (e.g. GROUPS 1 PRECEDING..CURRENT ROW = (-1, 0)).
    * One dense_rank pass converts peer groups to a dense integer key;
    * the frame is then an ordinary RANGE over that key. Both windows
    * share (part, ord) sort order, so Spark plans ONE exchange + sort. */
  def withGroupsSum(df: DataFrame, out: String, value: Column,
      part: Seq[Column], ord: Column, lo: Long, hi: Long): DataFrame = {
    val grp = s"__wf_grp_$out"
    val byOrd = Window.partitionBy(part: _*).orderBy(ord)
    val grpRange = Window.partitionBy(part: _*).orderBy(col(grp))
      .rangeBetween(lo, hi)
    df.withColumn(grp, dense_rank().over(byOrd))
      .withColumn(out, sum(value).over(grpRange))
      .drop(grp)
  }

  /** sum(value) OVER (PARTITION BY part [RANGE frame] EXCLUDE exclude),
    * as a Column — no temp columns needed. `frame` is an optional RANGE
    * bound pair over `ord` (None = the whole partition); when given, it
    * must contain the current row (lo <= 0 <= hi) — the only case where
    * EXCLUDE changes anything, and the precondition for subtracting the
    * row/peer terms. ROWS frames are deliberately NOT accepted: a ROWS
    * frame can cut a peer group, making the peer subtraction wrong —
    * rewrite via GROUPS (withGroupsSum) instead. */
  def sumExcluding(value: Column, part: Seq[Column], ord: Column,
      exclude: FrameExclusion, frame: Option[(Long, Long)] = None): Column = {
    require(frame.forall { case (lo, hi) => lo <= 0 && hi >= 0 },
      "EXCLUDE over a RANGE frame requires the frame to contain the current row")
    val wFrame = frame match {
      case Some((lo, hi)) =>
        Window.partitionBy(part: _*).orderBy(ord).rangeBetween(lo, hi)
      case None => Window.partitionBy(part: _*)
    }
    val wPeers = Window.partitionBy(part: _*).orderBy(ord).rangeBetween(0, 0)
    val frameSum = sum(value).over(wFrame)
    val frameCnt = count(value).over(wFrame)
    val peerSum = sum(value).over(wPeers)
    val peerCnt = count(value).over(wPeers)
    val selfCnt = when(value.isNotNull, lit(1L)).otherwise(lit(0L))
    // (sum, non-null count) of the post-exclusion frame; NULL exactly
    // when the remaining frame holds no non-null value (PG sum semantics)
    val (remSum, remCnt) = exclude match {
      case ExcludeNoOthers => (coalesce(frameSum, lit(0L)), frameCnt)
      case ExcludeCurrentRow =>
        (coalesce(frameSum, lit(0L)) - coalesce(value, lit(0L)),
          frameCnt - selfCnt)
      case ExcludeGroup =>
        (coalesce(frameSum, lit(0L)) - coalesce(peerSum, lit(0L)),
          frameCnt - peerCnt)
      case ExcludeTies =>
        (coalesce(frameSum, lit(0L)) - coalesce(peerSum, lit(0L)) +
          coalesce(value, lit(0L)), frameCnt - peerCnt + selfCnt)
    }
    when(remCnt > 0, remSum).otherwise(lit(null))
  }

  /** Add `out` = sum(value) OVER (PARTITION BY part ORDER BY ord
    * GROUPS BETWEEN lo AND hi EXCLUDE exclude) — the composition of
    * the two rewrites: a GROUPS frame is a RANGE frame over the order
    * key's dense_rank, and on ANY RANGE frame the peer-subtraction
    * EXCLUDE arithmetic is exact (GROUPS frames contain whole peer
    * groups too). Deterministic under order-key ties — both the frame
    * content and the peer terms depend only on the peer-group
    * decomposition, never on physical row order. */
  def groupsSumExcluding(df: DataFrame, out: String, value: Column,
      part: Seq[Column], ord: Column, lo: Long, hi: Long,
      exclude: FrameExclusion): DataFrame = {
    val grp = s"__wf_grp_$out"
    val byOrd = Window.partitionBy(part: _*).orderBy(ord)
    df.withColumn(grp, dense_rank().over(byOrd))
      .withColumn(out,
        sumExcluding(value, part, col(grp), exclude, Some((lo, hi))))
      .drop(grp)
  }

  /** Global rank + per-group row count over a TOTAL order, WITHOUT a
    * single-task-per-group WindowExec — the scalable spelling of
    * `row_number() OVER (PARTITION BY part ORDER BY order)` when
    * `part` has FEW DISTINCT VALUES (q34's 3-value o_orderstatus: a
    * plain window gives 3 tasks however many executors exist; at
    * 100 TB one status group in one task is the canonical window
    * anti-pattern). Classic two-pass distributed ranking:
    *
    *  1. range-repartition by (part ++ order) — group runs are
    *     contiguous across range buckets and bucket b's rows precede
    *     bucket b+1's within a group;
    *  2. rank locally per (bucket, group) — the window key includes
    *     the bucket id, so Spark runs ~numPartitions × |groups|
    *     window partitions in parallel instead of |groups| tasks;
    *  3. offset each local rank by the earlier buckets' per-group row
    *     counts — a tiny (buckets × groups) aggregate, prefix-summed
    *     and broadcast back.
    *
    * Adds `rankCol` (1-based global rank within the `part` group under
    * `order`) and `cntCol` (group row count). percent_rank, cume_dist
    * and ntile all derive arithmetically when `order` is total:
    * percent_rank = (rank−1)/(n−1), cume_dist = rank/n, ntile(k) by
    * the remainder formula.
    *
    * Contract: `order` is ASCENDING column names and (part ++ order)
    * must be a total order (append a tiebreak column). For a DESC key,
    * rank over a negated/derived column instead. */
  def scalableRank(df: DataFrame, part: Seq[String], order: Seq[String],
      rankCol: String, cntCol: String): DataFrame = {
    val b = s"__wf_bucket_$rankCol"
    val mid = s"__wf_mid_$rankCol"
    val keys = (part ++ order).map(col)
    // local ranks WITHOUT a window exchange: after the range
    // repartition + in-partition sort, monotonically_increasing_id is
    // sequential in sort order within each partition, so the rank
    // inside a (bucket, group) run is mid − min(mid of the run) + 1 —
    // and min(mid) rides the SAME tiny aggregate as the counts. The
    // fat data crosses exactly one exchange here (the range
    // repartition), at full parallelism.
    //
    // The eager localCheckpoint pins CORRECTNESS, not just cost: the
    // offsets side and the join's left side both consume `bucketed`,
    // and repartitionByRange samples its range boundaries per plan
    // instantiation (RDD-id-seeded) — two independent instantiations
    // can draw DIFFERENT bucket boundaries, after which the
    // (bucket, group) join silently misaligns (the r17 advice
    // finding). Exchange reuse usually collapses the two consumers
    // onto one sampled exchange, but AQE's opportunistic stage reuse
    // has a measured race on identical subtrees (the ds38/ds87
    // plan-fingerprint flap) — tolerable when duplication only costs,
    // not when it corrupts. Checkpointing materializes ONE bucket
    // assignment both consumers must read; lineage is truncated, so a
    // lost replica fails the job loudly instead of recomputing with
    // fresh boundaries. At scale the checkpoint stores the same bytes
    // the reused range exchange would have kept in shuffle files.
    val bucketed = df.repartitionByRange(keys: _*)
      .sortWithinPartitions(keys: _*)
      .withColumn(b, spark_partition_id())
      .withColumn(mid, monotonically_increasing_id())
      .localCheckpoint()
    val grpCols = (b +: part).map(col)
    // (bucket, group) rows → exclusive prefix per group + group total.
    // Tiny relation (numPartitions × |groups| rows): the single-task
    // window over it is deliberate, and it broadcasts back.
    val wOff = Window.partitionBy(part.map(col): _*).orderBy(col(b))
      .rowsBetween(Window.unboundedPreceding, -1)
    val wTot = Window.partitionBy(part.map(col): _*)
    val offsets = bucketed.groupBy(grpCols: _*)
      .agg(count(lit(1)).as("__wf_n"), min(col(mid)).as("__wf_min"))
      .select((grpCols :+
        coalesce(sum(col("__wf_n")).over(wOff), lit(0L)).as("__wf_off") :+
        sum(col("__wf_n")).over(wTot).as(cntCol) :+ col("__wf_min")): _*)
    bucketed.join(broadcast(offsets), b +: part)
      .withColumn(rankCol, col(mid) - col("__wf_min") + 1 + col("__wf_off"))
      .drop(b, mid, "__wf_off", "__wf_min")
  }

  /** Add `out` = sum(value) OVER (PARTITION BY part ORDER BY order
    * ROWS BETWEEN lo AND hi EXCLUDE exclude), where `order` must be a
    * TOTAL order (append a tiebreak column) and `peer` defines the
    * ORDER-BY peer groups (equal `peer` values — PG's frame/peer
    * split: the frame is physical rows, the exclusion unit is the
    * peer group). Windows-only construction, no self-join:
    *
    *  - the peer group is CONTIGUOUS in the total order, so the
    *    peers-inside-the-frame span is a contiguous row range
    *    [max(first_peer, rn+lo), min(last_peer, rn+hi)];
    *  - its sum falls out of running prefix sums: C(upper) − C(lower−1),
    *    with C at a relative offset read by lead/lag over the same
    *    sort, and C at the peer-group edges read by min/max over the
    *    peer partition (same exchange, one extra sort);
    *  - NULL semantics ride a parallel count prefix — the result is
    *    NULL exactly when the post-exclusion frame holds no non-null
    *    value (PG sum-over-remaining), never 0-for-empty.
    *
    * A ROWS frame straddling a peer group makes per-row results
    * depend on the physical position within the group — well-defined
    * here because `order` is total; cross-engine determinism needs
    * either a unique ORDER BY (each row its own peer group) or value
    * constant per peer group, same as PG. */
  def rowsSumExcluding(df: DataFrame, out: String, value: Column,
      part: Seq[Column], order: Seq[Column], peer: Column,
      lo: Long, hi: Long, exclude: FrameExclusion): DataFrame = {
    require(lo <= 0 && hi >= 0,
      "EXCLUDE over a ROWS frame requires the frame to contain the current row")
    val wOrd = Window.partitionBy(part: _*).orderBy(order: _*)
    val wFrame = wOrd.rowsBetween(lo, hi)
    val wCum = wOrd.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // peer-group aggregates WITHOUT a second exchange: same partition
    // keys, ordered by the peer key with a peers-only RANGE frame
    val wPeers = Window.partitionBy(part: _*).orderBy(peer).rangeBetween(0, 0)
    val cv = coalesce(value, lit(0L))
    val cn = when(value.isNotNull, lit(1L)).otherwise(lit(0L))
    def terms(x: Column): (Column, Column) = {
      // (frame sum of x, peers-in-frame sum of x) via prefix arithmetic
      val cum = sum(x).over(wCum) // C(rn)
      val cumPrev = cum - x       // C(rn − 1)
      val rn = row_number().over(wOrd)
      val firstRn = min(rn).over(wPeers)
      val lastRn = max(rn).over(wPeers)
      // The peer-edge prefixes C(lastRn) / C(firstRn−1) are the cum
      // values AT the edge rows, read positionally (max_by/min_by on
      // the unique rn) — NOT max(cum)/min(cumPrev) over the peer run,
      // which coincide only while the running sum is monotone within
      // the run, i.e. only for non-negative `value` (the r17 advice
      // finding: deltas/balances would have been silently wrong)
      val cUpper = when(rn + lit(hi) >= lastRn, max_by(cum, rn).over(wPeers))
        .otherwise(lead(cum, hi.toInt).over(wOrd))
      val cLower = when(rn + lit(lo) <= firstRn, min_by(cumPrev, rn).over(wPeers))
        .otherwise(lag(cumPrev, (-lo).toInt).over(wOrd))
      (sum(x).over(wFrame), cUpper - cLower)
    }
    val (frameSum, peerSum) = terms(cv)
    val (frameCnt, peerCnt) = terms(cn)
    val (remSum, remCnt) = exclude match {
      case ExcludeNoOthers => (frameSum, frameCnt)
      case ExcludeCurrentRow => (frameSum - cv, frameCnt - cn)
      case ExcludeGroup => (frameSum - peerSum, frameCnt - peerCnt)
      case ExcludeTies => (frameSum - peerSum + cv, frameCnt - peerCnt + cn)
    }
    df.withColumn(out, when(remCnt > 0, remSum).otherwise(lit(null)))
  }

  /** Add `out` = min/max(value) OVER (PARTITION BY part ORDER BY ord
    * [RANGE frame] EXCLUDE exclude) — closing the r17 boundary: the
    * peer-SUBTRACTION rewrite (sumExcluding) cannot express extrema
    * (min/max don't invert), but the post-exclusion frame decomposes
    * into CONTIGUOUS runs whose extrema Spark's native RANGE frames
    * compute directly (nodeWindowAgg.c row_is_in_frame is
    * aggregate-agnostic; this is the aggregate-specific construction
    * Spark needs):
    *
    *  - frame minus the current PEER GROUP = the frame's sub-run
    *    strictly before the group ∪ strictly after it — two RANGE
    *    frames, `[lo, −1]` and `[+1, hi]` in `ord` units, combined
    *    with least/greatest (both skip NULLs, so the result is NULL
    *    exactly when the remaining frame holds no non-null value —
    *    PG min/max semantics for free);
    *  - EXCLUDE TIES adds the row's own value back into the combine;
    *  - EXCLUDE CURRENT ROW additionally needs the PEERS-MINUS-SELF
    *    extremum, computed within the peer group without a total
    *    order: m1 = group extremum, c1 = how many rows attain it,
    *    m2 = extremum over values strictly beyond m1 — the row's
    *    exclusion changes the answer only when it is the UNIQUE
    *    attainer (then m2), all other rows read m1. Three window
    *    aggregates over the same (part, ord) sort: one exchange.
    *
    * `ord` must be INTEGER-VALUED (peer groups are whole integers, so
    * the ±1 run edges are exact — day numbers, dense ranks, cents);
    * for an arbitrary order key route through
    * [[groupsExtremeExcluding]], whose dense_rank key is integer by
    * construction. `frame` must contain the current row when given. */
  def extremeExcluding(df: DataFrame, out: String, value: Column,
      part: Seq[Column], ord: Column, exclude: FrameExclusion,
      frame: Option[(Long, Long)], isMin: Boolean): DataFrame = {
    require(frame.forall { case (lo, hi) => lo <= 0 && hi >= 0 },
      "EXCLUDE over a RANGE frame requires the frame to contain the current row")
    val wOrd = Window.partitionBy(part: _*).orderBy(ord)
    def agg(c: Column): Column = if (isMin) min(c) else max(c)
    def cmb(cs: Column*): Column = if (isMin) least(cs: _*) else greatest(cs: _*)
    val typedNull = when(lit(false), value) // NULL of value's type
    val (flo, fhi) = frame.getOrElse(
      (Window.unboundedPreceding, Window.unboundedFollowing))
    // the two contiguous frame runs flanking the current peer group
    val left =
      if (frame.exists(_._1 == 0L)) typedNull
      else agg(value).over(wOrd.rangeBetween(flo, -1L))
    val right =
      if (frame.exists(_._2 == 0L)) typedNull
      else agg(value).over(wOrd.rangeBetween(1L, fhi))
    exclude match {
      case ExcludeNoOthers =>
        val wFrame = frame match {
          case Some((lo, hi)) => wOrd.rangeBetween(lo, hi)
          case None => Window.partitionBy(part: _*)
        }
        df.withColumn(out, agg(value).over(wFrame))
      case ExcludeGroup => df.withColumn(out, cmb(left, right))
      case ExcludeTies => df.withColumn(out, cmb(left, right, value))
      case ExcludeCurrentRow =>
        val wPeers = wOrd.rangeBetween(0, 0)
        val m1 = s"__wf_m1_$out"
        val c1 = s"__wf_c1_$out"
        val m2 = s"__wf_m2_$out"
        val beyond = if (isMin) value > col(m1) else value < col(m1)
        val peersMinusSelf = // m2 only for the unique attainer
          when(value <=> col(m1) && col(c1) === 1L, col(m2)).otherwise(col(m1))
        df.withColumn(m1, agg(value).over(wPeers))
          .withColumn(c1,
            sum(when(value === col(m1), 1L).otherwise(0L)).over(wPeers))
          .withColumn(m2, agg(when(beyond, value)).over(wPeers))
          .withColumn(out, cmb(left, right, peersMinusSelf))
          .drop(m1, c1, m2)
    }
  }

  /** Add `out` = min/max(value) OVER (PARTITION BY part ORDER BY ord
    * GROUPS BETWEEN lo AND hi EXCLUDE exclude) — the dense_rank
    * composition (as groupsSumExcluding) over the extremum
    * construction above; dense_rank's integer key satisfies
    * extremeExcluding's integral-order contract for ANY order key. */
  def groupsExtremeExcluding(df: DataFrame, out: String, value: Column,
      part: Seq[Column], ord: Column, lo: Long, hi: Long,
      exclude: FrameExclusion, isMin: Boolean): DataFrame = {
    val grp = s"__wf_grp_$out"
    val byOrd = Window.partitionBy(part: _*).orderBy(ord)
    val withGrp = df.withColumn(grp, dense_rank().over(byOrd))
    extremeExcluding(withGrp, out, value, part, col(grp), exclude,
      Some((lo, hi)), isMin).drop(grp)
  }
}
