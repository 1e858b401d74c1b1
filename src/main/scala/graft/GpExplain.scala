package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution._
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.execution.aggregate.{HashAggregateExec, ObjectHashAggregateExec, SortAggregateExec}
import org.apache.spark.sql.execution.exchange.{BroadcastExchangeExec, ReusedExchangeExec, ShuffleExchangeExec}
import org.apache.spark.sql.execution.joins.{BroadcastHashJoinExec, BroadcastNestedLoopJoinExec, CartesianProductExec, ShuffledHashJoinExec, SortMergeJoinExec}
import org.apache.spark.sql.execution.window.WindowExec

/** EXPLAIN-format compatibility: render a Spark physical plan in the
  * Greenplum/Cloudberry EXPLAIN dialect (reference
  * `src/backend/commands/explain.c` + the cdb Motion annotations in
  * `src/backend/cdb/cdbexplain.c`), so a user migrating from the
  * reference reads the plan in the vocabulary they already know:
  *
  *  - `ShuffleExchange` → `Redistribute Motion` (hash re-distribution
  *    between slices), `BroadcastExchange` → `Broadcast Motion`,
  *    `ReusedExchange` → `Motion (shared)` (ShareInputScan analog),
  *    and the driver-side result collection is the implicit
  *    `Gather Motion` root every GP plan has;
  *  - scans print as `Seq Scan on <relation>` with pushed quals as
  *    `Filter:` lines, joins/aggregates/sorts keep their GP node names.
  *
  * Purely a rendering — the plan itself is untouched, and the mapping is
  * honest: each printed Motion corresponds to exactly one exchange in the
  * executed plan.
  */
object GpExplain {

  /** GP-dialect EXPLAIN of the query's FINAL (post-AQE) physical plan.
    * Executes the query first, since AQE only settles join strategies and
    * exchange elimination at runtime — same contract as EXPLAIN ANALYZE. */
  def explain(df: DataFrame): String = {
    // settle AQE by executing on the executors only — counting the RDD
    // never materializes result rows on the driver (a full collect() here
    // would be a driver OOM on a large result set, for a plan rendering)
    df.queryExecution.toRdd.count()
    val root = df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }
    val sb = new StringBuilder("Gather Motion (slices -> coordinator)\n")
    render(root, 1, sb)
    sb.toString
  }

  private def render(p: SparkPlan, depth: Int, sb: StringBuilder): Unit = {
    val line = describe(p)
    if (line.nonEmpty) {
      sb.append("  " * depth).append("-> ").append(line).append('\n')
      p.children.foreach(render(_, depth + 1, sb))
    } else {
      // transparent wrappers (query stages, reused subtrees, codegen ids)
      unwrap(p).foreach(render(_, depth, sb))
    }
  }

  private def unwrap(p: SparkPlan): Seq[SparkPlan] = p match {
    case q: QueryStageExec => Seq(q.plan)
    case r: ReusedExchangeExec => Seq(r.child)
    case w: WholeStageCodegenExec => Seq(w.child)
    case i: InputAdapter => Seq(i.child)
    case other => other.children
  }

  private def describe(p: SparkPlan): String = p match {
    case _: QueryStageExec | _: WholeStageCodegenExec | _: InputAdapter => ""
    case s: ShuffleExchangeExec =>
      s"Redistribute Motion (${s.outputPartitioning.getClass.getSimpleName})"
    case _: BroadcastExchangeExec => "Broadcast Motion"
    case _: ReusedExchangeExec => "" // unwrapped: shared subtree prints once per consumer
    case j: BroadcastHashJoinExec => s"Hash Join (${j.joinType}, broadcast build)"
    case j: ShuffledHashJoinExec => s"Hash Join (${j.joinType})"
    case j: SortMergeJoinExec => s"Merge Join (${j.joinType})"
    case j: BroadcastNestedLoopJoinExec => s"Nested Loop (${j.joinType})"
    case _: CartesianProductExec => "Nested Loop (cross)"
    case a: HashAggregateExec => aggName("HashAggregate", a.aggregateExpressions.map(_.mode.toString))
    case a: ObjectHashAggregateExec => aggName("HashAggregate", a.aggregateExpressions.map(_.mode.toString))
    case a: SortAggregateExec => aggName("GroupAggregate", a.aggregateExpressions.map(_.mode.toString))
    case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec =>
      // DSv2 sources (SeriesSource, ExecSource) are the external-table
      // surface — GP prints those as Foreign Scan
      s"Foreign Scan on ${b.scan.description().takeWhile(_ != '\n').take(80)}"
    case s: FileSourceScanExec =>
      val rel = s.tableIdentifier.map(_.table)
        .getOrElse(s.relation.location.rootPaths.headOption
          .map(p => p.getName.stripSuffix(".parquet")).getOrElse("?"))
      val quals = s.dataFilters
      s"Seq Scan on $rel" + (if (quals.nonEmpty) s"\n${"  "}Filter: ${quals.mkString(" AND ")}" else "")
    case _: SortExec => "Sort"
    case t: TakeOrderedAndProjectExec => s"Limit (top-${t.limit} with sort)"
    case _: LocalLimitExec | _: GlobalLimitExec => "Limit"
    case f: FilterExec => s"Result (one-time filter: ${f.condition.sql.take(80)})"
    case _: ProjectExec => "Result (projection)"
    case _: WindowExec => "WindowAgg"
    case _: ExpandExec => "TupleSplit (Expand)"
    case _: GenerateExec => "ProjectSet (set-returning)"
    case _: UnionExec => "Append"
    case _ => p.nodeName
  }

  private def aggName(base: String, modes: Seq[String]): String =
    if (modes.exists(_.startsWith("Partial"))) s"$base (partial — map-side combine)"
    else if (modes.exists(m => m.startsWith("Final") || m.startsWith("Complete"))) s"$base (final)"
    else base
}
