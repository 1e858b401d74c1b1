package graft

import org.apache.spark.sql.SparkSession

/** Committed audit for the f09 defect class (PROF_r16): predicate
  * pushdown substitutes non-cheap derived columns into Filter
  * conditions (and scan DataFilters) regardless of cost — only
  * CollapseProject has the multi-reference guard — so a
  * `.filter(col(derived))` over a text/array kernel re-evaluates the
  * kernel per corpus row below the projection (f09 carried THREE
  * tokenizes in its pushed filter). For every text/dedup/chunking/
  * similarity query, print the expensive-kernel tokens appearing
  * inside Filter or scan-DataFilters lines of the executed plan;
  * repeated tokenizers inside one filter line are the signature.
  * Run per round after adding any text-derived filter (the
  * length-axis sweep catches O(L²), not this class's constant
  * factor).
  *
  * Usage: runMain graft.KernelFilterAudit [sfDir=/root/testdata/sf0.001]
  */
object KernelFilterAudit {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.001"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val kernels = Seq("split(", "sentences(", "transform(", "zip_with(",
      "aggregate(", "regexp_extract_all", "word_grams", "char_grams",
      "winnow_fps", "metaphone", "porter_stem")
    val names = SparkEntry.queries.keys.toSeq.sorted.filter(n =>
      n.matches("^(t|f|d|ch|m|x0|er|s)[0-9].*") || n.startsWith("fz"))
    for (n <- names) {
      try {
        val df = SparkEntry.queries(n)(spark, dir)
        df.queryExecution.toRdd.count() // settle AQE
        val p = df.queryExecution.executedPlan.toString
        def occ(l: String, k: String): Int =
          l.split(java.util.regex.Pattern.quote(k), -1).length - 1
        // the signature is repeated kernels in ONE filter line (the
        // substitution duplicates the expression inside a single
        // condition) — so report the per-line MAX per kernel, not a
        // sum across unrelated filters
        val bad = p.linesIterator.filter(l =>
          l.contains("Filter") || l.contains("DataFilters")).flatMap { l =>
          kernels.map(k => k -> occ(l, k)).filter(_._2 >= 1)
        }.toSeq
        val worst = bad.groupBy(_._1).view.mapValues(_.map(_._2).max).toSeq
          .sortBy(-_._2).take(3)
        if (worst.nonEmpty)
          println(s"[audit] $n: " +
            worst.map { case (k, c) => s"$k=$c/line" }.mkString(" ") +
            (if (worst.head._2 >= 2) "  <-- substitution signature" else ""))
      } catch { case e: Throwable =>
        println(s"[audit] $n SKIP: ${e.getMessage.take(80)}")
      }
    }
    spark.stop()
  }
}
