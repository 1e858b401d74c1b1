package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.streaming.{DynamicTable, IvmMatview}

/** Incremental-layer queries: the correctness gate runs the REFRESH
  * PATHS (delta folding, re-materialization), and the oracle is the
  * equivalent one-shot batch SQL — refreshed result ≡ batch query is
  * precisely the IVM correctness condition. */
object Incremental {

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // -- IVM matview: fold 4 append batches, then finalize --
    "i01_ivm_matview" -> { (s, dir) =>
      val events = Tables.df(s, dir, "events")
      // deterministic append partitioning of the stream into 4 deltas
      val batches = (0 to 3).map(k => events.filter(col("event_id") % 4 === k))
      val state = batches.tail.foldLeft(IvmMatview.partialState(batches.head)) {
        (st, delta) => IvmMatview.applyDelta(st, IvmMatview.partialState(delta))
      }
      IvmMatview.finalizeState(state).orderBy(col("user_id"), col("event_type"))
    },

    // -- dynamic table: scheduled refresh re-materializes the definition --
    "i02_dynamic_table" -> { (s, dir) =>
      val tag = dir.replaceAll("[^A-Za-z0-9.]", "_")
      val dt = new DynamicTable(s, s"target/derived/$tag/dt_daily_revenue",
        () => Tables.df(s, dir, "orders")
          .groupBy(date_trunc("day", col("o_orderdate")).as("day"))
          .agg(count(lit(1)).as("n_orders"),
            expr("CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)").as("cents")))
      // two refresh cycles (idempotent overwrite — the pg_cron task body)
      dt.refresh()
      dt.refreshAndRead()
        .select(col("day"), col("n_orders"),
          round(col("cents").cast("double") / 100.0, 2).as("revenue"))
        .orderBy(col("day"))
    }
  )

  def oracle: Map[String, String] = Map(
    "i01_ivm_matview" -> """
      SELECT user_id, event_type, count(*) AS n,
        round(CAST(sum(CAST(round(value * 10000) AS BIGINT)) AS DOUBLE) / 10000.0, 4) AS total_value,
        round(CAST(sum(CAST(round(value * 10000) AS BIGINT)) AS DOUBLE) / 10000.0
          / count(*), 6) AS avg_value
      FROM events GROUP BY user_id, event_type
      ORDER BY user_id, event_type""",

    "i02_dynamic_table" -> """
      SELECT CAST(date_trunc('day', o_orderdate) AS TIMESTAMP) AS day,
        count(*) AS n_orders,
        round(CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS DOUBLE) / 100.0, 2) AS revenue
      FROM orders GROUP BY 1 ORDER BY day"""
  )
}
