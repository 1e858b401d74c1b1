package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Incremental view maintenance (IVM) — the reference's
  * `CREATE INCREMENTAL MATERIALIZED VIEW` layer
  * (`src/backend/commands/matview.c:96-151`: IVM_ADD delta application
  * maintained per statement).
  *
  * The matview state is an aggregate in PARTIAL form: per group key it
  * stores combinable components (count, sum) rather than finished values
  * — exactly the sfunc/combinefunc split (`pg_aggregate.dat`), and
  * exactly Spark's partial/final aggregate split. A delta batch is
  * aggregated to partial form (map-side, small), then merged into the
  * state by key: `state ⊕ delta` is a union + re-aggregate whose shuffle
  * key is the GROUP BY key — at 100 TB the state merge moves only
  * |groups| rows, never the raw events.
  *
  * Finished values (avg, share, …) are derived only at read time
  * ([[finalizeState]]), so repeated refreshes never compound rounding.
  */
object IvmMatview {

  /** Aggregate a raw `events` delta batch to partial state:
    * (user_id, event_type) → (n, cents). */
  def partialState(delta: DataFrame): DataFrame =
    delta.groupBy(col("user_id"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(expr("CAST(round(value * 10000) AS BIGINT)")).as("cents"))

  /** IVM_ADD: merge a partial delta into the partial state. */
  def applyDelta(state: DataFrame, deltaPartial: DataFrame): DataFrame =
    state.unionByName(deltaPartial)
      .groupBy(col("user_id"), col("event_type"))
      .agg(sum(col("n")).as("n"), sum(col("cents")).as("cents"))

  /** Read-time finalization: derive finished aggregates from the
    * combinable components. */
  def finalizeState(state: DataFrame): DataFrame =
    state.select(col("user_id"), col("event_type"), col("n"),
      round(col("cents").cast("double") / 10000.0, 4).as("total_value"),
      round(col("cents").cast("double") / 10000.0 / col("n"), 6).as("avg_value"))
}

/** Dynamic tables (`CREATE DYNAMIC TABLE ... SCHEDULE '...' AS SELECT`,
  * grammar `gram.y:7615-7667`, impl `createas.c:1858-1887`): a
  * materialized query refreshed on a schedule by the integrated pg_cron
  * (`src/backend/task/pg_cron.c`). Spark rendition: the definition query
  * is re-run and atomically overwrites the materialization; a scheduler
  * (cron, Airflow, `Trigger.AvailableNow` streaming) invokes
  * [[refresh]] — scheduling is orchestration, materialization is this. */
final class DynamicTable(spark: SparkSession, path: String,
                         definition: () => DataFrame) {
  /** Re-materialize (the `gp_dynamic_table_refresh_<oid>` task body). */
  def refresh(): Unit =
    definition().write.mode("overwrite").parquet(path)

  def read(): DataFrame = spark.read.parquet(path)

  def refreshAndRead(): DataFrame = { refresh(); read() }
}
