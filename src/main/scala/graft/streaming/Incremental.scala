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

  /** IVM_SUB (matview.c's delete path): retract a DELETE batch by merging
    * the delta with negated combinable components; a group whose count
    * reaches zero leaves the matview entirely. Only count/sum-class
    * components support subtraction — min/max would need a recompute, the
    * same restriction the reference's IVM places on retractable aggs. */
  def applyRetraction(state: DataFrame, deltaPartial: DataFrame): DataFrame =
    state.unionByName(deltaPartial.select(col("user_id"), col("event_type"),
        (-col("n")).as("n"), (-col("cents")).as("cents")))
      .groupBy(col("user_id"), col("event_type"))
      .agg(sum(col("n")).as("n"), sum(col("cents")).as("cents"))
      .filter(col("n") > 0)

  /** Read-time finalization: derive finished aggregates from the
    * combinable components. */
  def finalizeState(state: DataFrame): DataFrame =
    state.select(col("user_id"), col("event_type"), col("n"),
      round(col("cents").cast("double") / 10000.0, 4).as("total_value"),
      round(col("cents").cast("double") / 10000.0 / col("n"), 6).as("avg_value"))
}

/** Min/max IVM under retraction — the reference's recalculation path
  * (`src/backend/commands/matview.c:2539` apply_delta, `:2680` "apply
  * old delta and get rows to be recalculated"): min/max have no inverse,
  * so a DELETE delta cannot be subtracted from the state. Instead the
  * delta's per-group (d_n, d_min, d_max) splits the view into
  *  - UNAFFECTED groups — every deleted value lies STRICTLY inside the
  *    surviving range (d_min > min ∧ d_max < max ∧ d_n < n): the
  *    extremes provably survive, so the state row carries forward with
  *    only its count adjusted and the base is NOT rescanned;
  *  - AFFECTED groups — the delta touches a group extreme (or empties
  *    the group): recompute THOSE GROUPS ONLY, as a semi-join of the
  *    surviving base against the affected key set. A group whose rows
  *    are all deleted yields no recompute row and leaves the view.
  * At 100 TB the rescan cost is proportional to the affected groups'
  * rows (delta-sized in practice), never the base or the view; the
  * affected key set is delta-bounded and broadcasts. */
object MinMaxIvm {

  private val cents = expr("CAST(round(value * 10000) AS BIGINT)")

  /** Materializable state: (user_id, event_type) → (n, min_c, max_c). */
  def state(base: DataFrame): DataFrame =
    base.groupBy(col("user_id"), col("event_type"))
      .agg(count(lit(1)).as("n"), min(cents).as("min_c"), max(cents).as("max_c"))

  /** The per-group delete delta: (d_n, d_min, d_max). */
  def deleteDelta(deleted: DataFrame): DataFrame =
    deleted.groupBy(col("user_id"), col("event_type"))
      .agg(count(lit(1)).as("d_n"), min(cents).as("d_min"), max(cents).as("d_max"))

  /** Retract `deleted` from `state`; `survivors` is the base relation
    * after the DELETE commits (what a recompute may read). Returns
    * (newState, affectedKeys, recomputed) so tests can assert the
    * recompute branch's cardinality — untouched groups never reach it. */
  def applyRetraction(state: DataFrame, deleted: DataFrame, survivors: DataFrame)
      : (DataFrame, DataFrame, DataFrame) = {
    val keys = Seq("user_id", "event_type")
    // materialize the per-group delta once (PG's apply_delta reads a
    // temp delta TABLE, matview.c:2539): it feeds both the carry-forward
    // filter and the affected-key set, and it is delta-bounded — tiny
    val dd = deleteDelta(deleted).localCheckpoint(true)
    val tagged = state.join(dd, keys, "left")
    // d_n = n forces d_min = min_c ∧ d_max = max_c, so the strict
    // inequalities already exclude emptied groups
    val untouched = col("d_n").isNull ||
      (col("d_min") > col("min_c") && col("d_max") < col("max_c"))
    val unaffected = tagged.filter(untouched)
      .select(col("user_id"), col("event_type"),
        (col("n") - coalesce(col("d_n"), lit(0L))).as("n"),
        col("min_c"), col("max_c"))
    val affectedKeys = tagged.filter(!untouched).select(keys.map(col): _*)
    // the ONLY base rescan: survivors semi-joined to the delta-bounded
    // affected key set (broadcast), then re-aggregated per group
    val recomputed = survivors
      .join(broadcast(affectedKeys), keys, "left_semi")
      .groupBy(col("user_id"), col("event_type"))
      .agg(count(lit(1)).as("n"), min(cents).as("min_c"), max(cents).as("max_c"))
    (unaffected.unionByName(recomputed), affectedKeys, recomputed)
  }

  /** Read-time finalization to user-facing values. */
  def finalizeState(state: DataFrame): DataFrame =
    state.select(col("user_id"), col("event_type"), col("n"),
      round(col("min_c").cast("double") / 10000.0, 4).as("min_value"),
      round(col("max_c").cast("double") / 10000.0, 4).as("max_value"))
}

/** Algebraic IVM — the variance/stddev extension of [[IvmMatview]]:
  * aggregates whose partial state is a fixed vector of sums fold under
  * deltas exactly like count/sum. State per group is (n, Σc, Σc²) with
  * c the fixed-point value in cents; avg and population stddev are
  * DERIVED at read time, so refreshes never compound rounding and the
  * state merge still moves only |groups| rows (reference analog:
  * `pg_aggregate.dat` sfunc/combinefunc splits for var_pop/stddev_pop).
  * Σc² is carried as DECIMAL(38,0): 10^5-cent values square to 10^10 —
  * a BIGINT sum would overflow near 10^9 rows, a 100 TB-real concern. */
object AlgebraicIvm {

  def partialState(delta: DataFrame): DataFrame =
    delta.groupBy(col("user_id"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(expr("CAST(round(value * 100) AS BIGINT)")).as("c"),
        sum(expr("CAST(CAST(round(value * 100) AS BIGINT) * CAST(round(value * 100) AS BIGINT) AS DECIMAL(38,0))")).as("c2"))

  def applyDelta(state: DataFrame, deltaPartial: DataFrame): DataFrame =
    state.unionByName(deltaPartial)
      .groupBy(col("user_id"), col("event_type"))
      .agg(sum(col("n")).as("n"), sum(col("c")).as("c"), sum(col("c2")).as("c2"))

  /** IVM_SUB: every component is a plain sum, so variance state retracts
    * exactly (unlike min/max, which would force a recompute). */
  def applyRetraction(state: DataFrame, deltaPartial: DataFrame): DataFrame =
    state.unionByName(deltaPartial.select(col("user_id"), col("event_type"),
        (-col("n")).as("n"), (-col("c")).as("c"), (-col("c2")).as("c2")))
      .groupBy(col("user_id"), col("event_type"))
      .agg(sum(col("n")).as("n"), sum(col("c")).as("c"), sum(col("c2")).as("c2"))
      .filter(col("n") > 0)

  /** Read-time: avg and population stddev from the component sums. */
  def finalizeState(state: DataFrame): DataFrame =
    state.select(col("user_id"), col("event_type"), col("n"),
      round(col("c").cast("double") / col("n") / 100.0, 6).as("avg_value"),
      round(
        sqrt(greatest(
          col("c2").cast("double") / col("n") -
            (col("c").cast("double") / col("n")) * (col("c").cast("double") / col("n")),
          lit(0.0))) / 100.0, 6).as("stddev_value"))
}

/** Join-IVM — incremental maintenance of a TWO-TABLE JOIN matview, the
  * next semantic step past [[IvmMatview]]'s aggregate-over-append (the
  * most-used IVM form in practice; reference `matview.c:96-151`
  * IVM_ADD/IVM_SUB delta application through joins).
  *
  * Delta rule for J = A ⋈ B under append deltas ΔA, ΔB:
  *
  *   ΔJ = ΔA ⋈ (B ∪ ΔB)  ∪  A ⋈ ΔB
  *
  * which expands to ΔA⋈B ∪ ΔA⋈ΔB ∪ A⋈ΔB — each join row involving a new
  * tuple appears in exactly one term, so the union is disjoint and needs
  * no dedup. Both terms are plain equi-joins: at 100 TB the dominant cost
  * is |Δ|-proportional (a delta batch joins the accumulated side with the
  * DELTA as the build/broadcast side — never a re-join of A with B), and
  * J is maintained append-only, so a production refresh writes ΔJ as a
  * new partition instead of rewriting the matview. */
object JoinIvm {

  /** Accumulated state: both base sides + the maintained join view. */
  final case class State(a: DataFrame, b: DataFrame, j: DataFrame)

  def init(a0: DataFrame, b0: DataFrame, keys: Seq[String]): State =
    State(a0, b0, a0.join(b0, keys))

  /** IVM_ADD through the join: fold one append delta batch per side. */
  def applyDelta(st: State, dA: DataFrame, dB: DataFrame, keys: Seq[String]): State = {
    val dJ = dA.join(st.b.unionByName(dB), keys)
      .unionByName(st.a.join(dB, keys))
    State(st.a.unionByName(dA), st.b.unionByName(dB), st.j.unionByName(dJ))
  }
}

/** Exactly-once streaming sink over a plain-parquet target — the
  * foreachBatch upsert pattern (the streaming half of i06's MERGE; the
  * reference's dynamic-table refresh commits atomically inside a
  * transaction, `createas.c:1858-1887` — parquet has no transactions, so
  * idempotence must come from the layout instead).
  *
  * Contract: each micro-batch's PARTIAL aggregate lands in its own
  * `batch=<batchId>` directory with overwrite mode. Structured Streaming
  * guarantees a replayed batch re-arrives with the SAME batchId, so a
  * retry overwrites its own output instead of appending a duplicate —
  * at-least-once delivery × idempotent write = exactly-once result. The
  * read side folds the partials (IVM-style), so a target holding any
  * prefix-consistent set of batch dirs is always a correct snapshot. */
final class PartialStateSink(spark: SparkSession, target: String) {

  /** The foreachBatch body: reduce the batch to partial state, overwrite
    * this batch's directory. Safe to call twice with the same batchId. */
  def upsertBatch(batch: DataFrame, batchId: Long): Unit =
    IvmMatview.partialState(batch)
      .write.mode("overwrite").parquet(s"$target/batch=$batchId")

  /** Fold all landed partials into the current matview state. */
  def read(): DataFrame = {
    val all = spark.read.parquet(target)
    all.groupBy(col("user_id"), col("event_type"))
      .agg(sum(col("n")).as("n"), sum(col("cents")).as("cents"))
  }
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

/** The scheduler half of dynamic tables — the integrated pg_cron loop
  * (`src/backend/task/pg_cron.c`; task registration `commands/taskcmds.c`;
  * `SCHEDULE '...'` grammar `gram.y:7615-7667`). pg_cron semantics:
  * a job fires when its next scheduled time has passed; a DOWNTIME that
  * skips N scheduled firings produces ONE catch-up run, not N (the
  * refresh is a full re-materialization, so one run reaches the current
  * answer regardless of how many ticks were missed).
  *
  * The clock is an argument, not `System.currentTimeMillis`, so tests
  * (and replays) drive logical time deterministically; [[runFor]] is the
  * wall-clock convenience loop for production use. */
final class RefreshScheduler(refreshFn: () => Unit, intervalMs: Long) {
  /** Schedule a batch-materialized dynamic table (the common case). The
    * primary constructor takes any refresh action — e.g. a
    * `Trigger.AvailableNow` streaming drain that folds only NEW input
    * into the matview state (StreamingSpec drives both). */
  def this(table: DynamicTable, intervalMs: Long) =
    this(() => table.refresh(), intervalMs)

  private var lastRun: Long = Long.MinValue
  private var runs: Long = 0L
  def refreshCount: Long = runs

  /** Advance to `nowMs`; refresh iff a scheduled firing is due (first
    * tick always fires). Returns whether a refresh ran. */
  def tick(nowMs: Long): Boolean = {
    val due = lastRun == Long.MinValue || nowMs - lastRun >= intervalMs
    if (due) { refreshFn(); lastRun = nowMs; runs += 1 }
    due
  }

  /** Wall-clock loop: tick every `pollMs` for `durationMs`. */
  def runFor(durationMs: Long, pollMs: Long = 100L): Unit = {
    val end = System.currentTimeMillis + durationMs
    while (System.currentTimeMillis < end) {
      tick(System.currentTimeMillis)
      Thread.sleep(math.min(pollMs, math.max(1L, end - System.currentTimeMillis)))
    }
  }
}
