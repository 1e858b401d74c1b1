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
}
