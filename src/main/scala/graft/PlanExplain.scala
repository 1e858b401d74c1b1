package graft

import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}

/** Dump `.explain("formatted")` for named SparkEntry queries to files —
  * the before/after plan evidence an optimization round commits
  * (plans/r{N}/<query>_{before,after}.txt).
  *
  * Usage: runMain graft.PlanExplain <sfDir> <outDir> <suffix> <q1,q2,...>
  *
  * Writes <outDir>/<query>_<suffix>.txt. Uses the same session confs as
  * Bench so the plans match what the bench executes. The formatted plan
  * is the INITIAL plan (AQE isFinalPlan=false) plus, appended, the
  * post-execution final plan string — both shapes matter: the initial
  * one shows join strategy / pushdown decisions, the final one shows
  * what AQE actually ran.
  */
object PlanExplain {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val outDir = args(1)
    val suffix = args(2)
    val names = args(3).split(",").toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.codegen.cache.maxEntries", "4000")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try {
      operators.Partitioned.ordersByMonth(spark, sfDir)
      operators.Partitioned.ordersByRegionMonth(spark, sfDir)
      operators.Partitioned.monthDimTable(spark, sfDir)
      operators.Bucketed.ensure(spark, sfDir)
      operators.Stats.ensure(spark, sfDir)
      operators.EntityResolution.ensureBaseState(spark, sfDir)
      operators.Dedup.ensureSpanState(spark, sfDir, baseSlice = true)
      operators.Dedup.ensureSpanState(spark, sfDir, baseSlice = false)
    } catch { case e: Throwable => System.err.println(s"[plan] warmup: ${e.getMessage}") }
    new java.io.File(outDir).mkdirs()
    // r18 verdict #6: changes upstream of a localCheckpoint were invisible
    // in the dumped final plan (the spool truncates lineage — the ds64 and
    // er01 after-dumps were byte-equal to the before-dumps). Capture every
    // INTERMEDIATE action the query function runs while building its
    // result — spool materializations (localCheckpoint), fixpoint counts —
    // via a QueryExecutionListener, and append their executed plans.
    val spoolPlans = new java.util.concurrent.ConcurrentLinkedQueue[(String, String)]()
    val listener = new org.apache.spark.sql.util.QueryExecutionListener {
      override def onSuccess(funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution, durationNs: Long): Unit =
        spoolPlans.add((funcName, qe.executedPlan.toString))
      override def onFailure(funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution, e: Exception): Unit = ()
    }
    spark.listenerManager.register(listener)
    names.foreach { name =>
      spoolPlans.clear()
      val df = SparkEntry.queries(name)(spark, sfDir)
      // listener events are delivered async on the listener bus; give the
      // build-phase actions time to land before snapshotting
      Thread.sleep(1000)
      val built = {
        import scala.jdk.CollectionConverters._
        spoolPlans.asScala.toVector
      }
      val formatted = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      df.queryExecution.toRdd.count() // settle AQE
      val finalPlan = df.queryExecution.executedPlan.toString
      val buildSection =
        if (built.isEmpty) ""
        else built.zipWithIndex.map { case ((fn, p), i) =>
          s"== build-phase action ${i + 1}/${built.size} ($fn) ==\n$p\n"
        }.mkString
      Files.writeString(Paths.get(s"$outDir/${name}_$suffix.txt"),
        s"== explain(formatted), initial plan ==\n$formatted\n" +
          s"== executed plan after AQE ==\n$finalPlan\n" + buildSection)
      println(s"[plan] wrote $outDir/${name}_$suffix.txt" +
        (if (built.nonEmpty) s" (+${built.size} build-phase plans)" else ""))
      spark.sharedState.cacheManager.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
    }
    spark.listenerManager.unregister(listener)
    spark.stop()
  }
}
