package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.WindowFrames
import graft.operators.WindowFrames._

/** Property tests for the shared GROUPS / EXCLUDE window rewriter
  * (r16 verdict #5b): the rewriter's output is compared row-by-row
  * against a BRUTE-FORCE evaluation of the PG frame semantics
  * (nodeWindowAgg.c row_is_in_frame) over generated data that forces
  * the hard cases — peer-group ties on the order key, NULL values
  * (sum-over-remaining must stay NULL-correct, not just subtraction-
  * correct), partitions of size 1, and frames that exclude the
  * current peer group entirely. */
class WindowFramesSpec extends AnyFunSuite {
  import SparkSuite._
  import WindowFramesSpec.R

  /** Deterministic generated data: 3 partitions + a singleton partition,
    * order keys 0..7 (dense ties), ~12% null values, and SIGNED values
    * (r17 advice: the prefix-boundary reads in rowsSumExcluding were
    * only correct while the running sum was monotone, i.e. for
    * non-negative values — a generator limited to [0,100) could never
    * catch it). */
  private lazy val rows: Seq[R] = {
    val rnd = new scala.util.Random(42)
    val bulk = (0L until 240L).map { id =>
      R(id, (rnd.nextInt(3) + 1), rnd.nextInt(8),
        if (rnd.nextInt(8) == 0) None else Some((rnd.nextInt(200) - 100).toLong))
    }
    bulk :+ R(240L, 9, 0, Some(7L)) :+ R(241L, 8, 3, None) // singletons: one non-null, one all-null
  }

  private lazy val df = {
    val s = spark; import s.implicits._
    rows.toDF("id", "p", "o", "v")
  }

  /** sum of the non-null values, NULL when none — SQL sum semantics. */
  private def sqlSum(vs: Seq[Option[Long]]): Option[Long] = {
    val nn = vs.flatten
    if (nn.isEmpty) None else Some(nn.sum)
  }

  private def denseRank(part: Seq[R]): Map[Int, Int] =
    part.map(_.o).distinct.sorted.zipWithIndex.map { case (o, i) => o -> (i + 1) }.toMap

  private def collectOut(d: org.apache.spark.sql.DataFrame): Map[Long, Option[Long]] =
    d.collect().map(r => r.getLong(0) ->
      (if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap

  for ((lo, hi) <- Seq((-1L, 0L), (0L, 0L), (-2L, 1L), (-2L, -1L), (1L, 2L))) {
    test(s"GROUPS BETWEEN $lo AND $hi == brute-force peer-group frame") {
      val got = collectOut(
        WindowFrames.withGroupsSum(df, "out", col("v"),
          Seq(col("p")), col("o"), lo, hi).select(col("id"), col("out")))
      val want = rows.groupBy(_.p).flatMap { case (_, part) =>
        val rk = denseRank(part)
        part.map { r =>
          val g = rk(r.o)
          r.id -> sqlSum(part.filter(x => rk(x.o) >= g + lo && rk(x.o) <= g + hi).map(_.v))
        }
      }
      assert(got == want)
    }
  }

  /** The post-exclusion RANGE-frame row set — shared by the sum and
    * extremum brute forces. */
  private def remainingRows(part: Seq[R], r: R, excl: FrameExclusion,
      frame: Option[(Long, Long)]): Seq[R] = {
    val inFrame = frame match {
      case Some((lo, hi)) => part.filter(x => x.o >= r.o + lo && x.o <= r.o + hi)
      case None => part
    }
    excl match {
      case ExcludeNoOthers => inFrame
      case ExcludeCurrentRow => inFrame.filterNot(_.id == r.id)
      case ExcludeGroup => inFrame.filterNot(_.o == r.o)
      case ExcludeTies => inFrame.filter(x => x.o != r.o || x.id == r.id)
    }
  }

  private def bruteExclude(part: Seq[R], r: R, excl: FrameExclusion,
      frame: Option[(Long, Long)]): Option[Long] =
    sqlSum(remainingRows(part, r, excl, frame).map(_.v))

  /** min/max of the non-null values, NULL when none — SQL semantics. */
  private def sqlExt(vs: Seq[Option[Long]], isMin: Boolean): Option[Long] = {
    val nn = vs.flatten
    if (nn.isEmpty) None else Some(if (isMin) nn.min else nn.max)
  }

  for (excl <- Seq(ExcludeNoOthers, ExcludeCurrentRow, ExcludeGroup, ExcludeTies);
       frame <- Seq(None, Some((0L, 0L)), Some((-2L, 1L)))) {
    test(s"EXCLUDE $excl over RANGE frame $frame == brute-force remaining-rows sum") {
      val got = collectOut(df.select(col("id"),
        WindowFrames.sumExcluding(col("v"), Seq(col("p")), col("o"), excl, frame).as("out")))
      val want = rows.groupBy(_.p).flatMap { case (_, part) =>
        part.map(r => r.id -> bruteExclude(part, r, excl, frame))
      }
      assert(got == want)
    }
  }

  for (excl <- Seq(ExcludeNoOthers, ExcludeCurrentRow, ExcludeGroup, ExcludeTies);
       (lo, hi) <- Seq((-1L, 1L), (0L, 0L), (-2L, 0L))) {
    test(s"GROUPS frame ($lo,$hi) EXCLUDE $excl == brute-force") {
      val got = collectOut(
        WindowFrames.groupsSumExcluding(df, "out", col("v"),
          Seq(col("p")), col("o"), lo, hi, excl).select(col("id"), col("out")))
      val want = rows.groupBy(_.p).flatMap { case (_, part) =>
        val rk = denseRank(part)
        part.map { r =>
          val g = rk(r.o)
          val inFrame = part.filter(x => rk(x.o) >= g + lo && rk(x.o) <= g + hi)
          val remaining = excl match {
            case ExcludeNoOthers => inFrame
            case ExcludeCurrentRow => inFrame.filterNot(_.id == r.id)
            case ExcludeGroup => inFrame.filterNot(_.o == r.o)
            case ExcludeTies => inFrame.filter(x => x.o != r.o || x.id == r.id)
          }
          r.id -> sqlSum(remaining.map(_.v))
        }
      }
      assert(got == want)
    }
  }

  for (excl <- Seq(ExcludeNoOthers, ExcludeCurrentRow, ExcludeGroup, ExcludeTies);
       (lo, hi) <- Seq((0L, 0L), (-2L, 1L), (-3L, 2L), (-1L, 0L))) {
    test(s"ROWS frame ($lo,$hi) EXCLUDE $excl == brute-force over the (o,id) total order") {
      val got = collectOut(
        WindowFrames.rowsSumExcluding(df, "out", col("v"),
          Seq(col("p")), Seq(col("o"), col("id")), col("o"), lo, hi, excl)
          .select(col("id"), col("out")))
      val want = rows.groupBy(_.p).flatMap { case (_, part) =>
        val sorted = part.sortBy(r => (r.o, r.id)).toIndexedSeq
        sorted.zipWithIndex.map { case (r, i) =>
          val inFrame = sorted.slice(
            math.max(0, i + lo.toInt), math.min(sorted.length, i + hi.toInt + 1))
          val remaining = excl match {
            case ExcludeNoOthers => inFrame
            case ExcludeCurrentRow => inFrame.filterNot(_.id == r.id)
            case ExcludeGroup => inFrame.filterNot(_.o == r.o)
            case ExcludeTies => inFrame.filter(x => x.o != r.o || x.id == r.id)
          }
          r.id -> sqlSum(remaining.map(_.v))
        }
      }
      assert(got == want)
    }
  }

  for (excl <- Seq(ExcludeNoOthers, ExcludeCurrentRow, ExcludeGroup, ExcludeTies);
       frame <- Seq(None, Some((0L, 0L)), Some((-2L, 1L)));
       isMin <- Seq(true, false)) {
    val fn = if (isMin) "min" else "max"
    test(s"$fn EXCLUDE $excl over RANGE frame $frame == brute-force remaining-rows extremum") {
      val got = collectOut(
        WindowFrames.extremeExcluding(df, "out", col("v"),
          Seq(col("p")), col("o"), excl, frame, isMin)
          .select(col("id"), col("out")))
      val want = rows.groupBy(_.p).flatMap { case (_, part) =>
        part.map(r => r.id ->
          sqlExt(remainingRows(part, r, excl, frame).map(_.v), isMin))
      }
      assert(got == want)
    }
  }

  for (excl <- Seq(ExcludeNoOthers, ExcludeCurrentRow, ExcludeGroup, ExcludeTies);
       isMin <- Seq(true, false)) {
    val fn = if (isMin) "min" else "max"
    test(s"GROUPS frame (-1,1) $fn EXCLUDE $excl == brute-force") {
      val got = collectOut(
        WindowFrames.groupsExtremeExcluding(df, "out", col("v"),
          Seq(col("p")), col("o"), -1L, 1L, excl, isMin)
          .select(col("id"), col("out")))
      val want = rows.groupBy(_.p).flatMap { case (_, part) =>
        val rk = denseRank(part)
        part.map { r =>
          val g = rk(r.o)
          val inFrame = part.filter(x => rk(x.o) >= g - 1 && rk(x.o) <= g + 1)
          val remaining = excl match {
            case ExcludeNoOthers => inFrame
            case ExcludeCurrentRow => inFrame.filterNot(_.id == r.id)
            case ExcludeGroup => inFrame.filterNot(_.o == r.o)
            case ExcludeTies => inFrame.filter(x => x.o != r.o || x.id == r.id)
          }
          r.id -> sqlExt(remaining.map(_.v), isMin)
        }
      }
      assert(got == want)
    }
  }

  test("extremum EXCLUDE rejects a RANGE frame that does not contain the current row") {
    intercept[IllegalArgumentException] {
      WindowFrames.extremeExcluding(df, "out", col("v"),
        Seq(col("p")), col("o"), ExcludeGroup, Some((1L, 3L)), isMin = true)
    }
  }

  test("ROWS EXCLUDE rejects a frame that does not contain the current row") {
    intercept[IllegalArgumentException] {
      WindowFrames.rowsSumExcluding(df, "out", col("v"),
        Seq(col("p")), Seq(col("o"), col("id")), col("o"), -3L, -1L, ExcludeGroup)
    }
  }

  test("EXCLUDE rejects a RANGE frame that does not contain the current row") {
    intercept[IllegalArgumentException] {
      WindowFrames.sumExcluding(col("v"), Seq(col("p")), col("o"),
        ExcludeGroup, Some((-3L, -1L)))
    }
  }
}

object WindowFramesSpec {
  /** file-scope so Spark's product encoder can instantiate it without an
    * outer-class scope (the StreamingSpec.E precedent) */
  case class R(id: Long, p: Int, o: Int, v: Option[Long])
}
