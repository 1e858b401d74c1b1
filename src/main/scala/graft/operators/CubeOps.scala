package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** contrib/cube slice (reference `contrib/cube/cube.c`): n-dimensional
  * boxes and the point-to-box metrics the GiST index orders by —
  * cube_distance:87 (L2 to the nearest box point), distance_taxicab:86,
  * distance_chebyshev:88, cube_contains:76, cube_union:79 (the box
  * aggregate), cube_size:81 (volume).
  *
  * Spark-first: a box over the first 4 embedding dimensions per label is
  * a plain min/max aggregate (cube_union over points IS min/max per
  * coordinate — cube.c cube_union_v0 folds ll=min, ur=max), fully
  * map-side combinable; the per-dim distance max(0, ll−p, p−ur) is the
  * exact per-coordinate clamp cube.c's distance functions compute. All
  * box coordinates are exact float min/maxes (no summation), the probe
  * is a plan-time constant, and the 4-term metric sums run in one fixed
  * order on both engines, so round(6) hashes identically.
  */
object CubeOps {

  /** deterministic probe point, first 4 dims */
  private val Probe = Seq(0.05, -0.05, 0.10, -0.10)

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "cu01_cube_ops" -> { (s, dir) =>
      val dims = 1 to 4
      val aggs = dims.flatMap { k =>
        val x = element_at(col("embedding"), k).cast("double")
        Seq(min(x).as(s"ll$k"), max(x).as(s"ur$k"))
      } :+ count(lit(1)).as("n_points")
      val boxes = Tables.df(s, dir, "embeddings")
        .groupBy(col("label"))
        .agg(aggs.head, aggs.tail: _*)
      val gap = dims.map(k =>
        s"greatest(0.0D, ll$k - ${Probe(k - 1)}D, ${Probe(k - 1)}D - ur$k)")
      val inside = dims.map(k =>
        s"(ll$k <= ${Probe(k - 1)}D AND ${Probe(k - 1)}D <= ur$k)")
      boxes.select(
        col("label"), col("n_points"),
        round(expr(s"sqrt(${gap.map(g => s"($g) * ($g)").mkString(" + ")})"), 6)
          .as("dist_l2"),
        round(expr(gap.mkString(" + ")), 6).as("dist_taxicab"),
        round(expr(s"greatest(${gap.mkString(", ")})"), 6).as("dist_chebyshev"),
        expr(s"CAST(${inside.mkString(" AND ")} AS INT)").as("contains_probe"),
        round(expr(dims.map(k => s"(ur$k - ll$k)").mkString(" * ")), 6).as("volume"))
        .orderBy(col("label"))
    }
  )

  def oracle: Map[String, String] = {
    val dims = 1 to 4
    val gap = dims.map(k =>
      s"greatest(0.0, ll$k - (${Probe(k - 1)}), (${Probe(k - 1)}) - ur$k)")
    val inside = dims.map(k =>
      s"(ll$k <= ${Probe(k - 1)} AND ${Probe(k - 1)} <= ur$k)")
    Map(
      "cu01_cube_ops" -> s"""
        WITH boxes AS (
          SELECT label,
            ${dims.map(k =>
              s"min(CAST(embedding[$k] AS DOUBLE)) AS ll$k, " +
              s"max(CAST(embedding[$k] AS DOUBLE)) AS ur$k").mkString(", ")},
            count(*) AS n_points
          FROM embeddings GROUP BY label)
        SELECT label, n_points,
          round(sqrt(${gap.map(g => s"($g) * ($g)").mkString(" + ")}), 6) AS dist_l2,
          round(${gap.mkString(" + ")}, 6) AS dist_taxicab,
          round(greatest(${gap.mkString(", ")}), 6) AS dist_chebyshev,
          CAST(${inside.mkString(" AND ")} AS INT) AS contains_probe,
          round(${dims.map(k => s"(ur$k - ll$k)").mkString(" * ")}, 6) AS volume
        FROM boxes ORDER BY label""")
  }
}
