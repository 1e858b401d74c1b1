package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** pg_hint_plan front-end (`gpcontrib/pg_hint_plan/pg_hint_plan.c:142`
  * HintKeyword inventory: scan methods, NestLoop/MergeJoin/HashJoin,
  * Leading, Set, Rows, Parallel) — planner hints embedded in a leading
  * leading hint comment (slash-star-plus … star-slash), parsed before
  * planning and applied to the
  * matching join levels; inapplicable hints are reported and IGNORED,
  * never an error (the extension's own contract).
  *
  * Spark-first translation, hint by hint:
  *  - `Leading(((a b) c))`  → the join TREE: the builder constructs the
  *    DataFrame joins in exactly the hinted shape (Catalyst keeps
  *    logical join order unless CBO reorder is enabled, so construction
  *    order IS plan order — the same lever the reference hint pulls);
  *  - `HashJoin(a b)`       → `.hint("shuffle_hash")` on the join level
  *    whose inputs span the listed relations;
  *  - `MergeJoin(a b)`      → `.hint("merge")` likewise;
  *  - `Parallel(t n)`       → `repartition(n)` on the relation — the
  *    degree-of-parallelism motion, GP's per-slice width knob;
  *  - `Rows`, `Set`, scan-method and `NestLoop` hints have no Spark
  *    analogue that preserves semantics (Catalyst picks scans from the
  *    format, NL exists only as broadcast-NL on non-equi joins) → the
  *    IGNORED ledger, exactly how pg_hint_plan reports unusable hints.
  *
  * Hints never change results — ph01's oracle is the plain SQL of the
  * hinted query; the plan-shape contract (hash join where hinted, merge
  * join where hinted, hinted join order, the repartition motion) is
  * asserted in PlanShapeSpec.
  */
object Hints {

  // ---- hint comment scanning (balanced parens: Leading nests) ----

  sealed trait JTree
  final case class Leaf(t: String) extends JTree
  final case class Node(l: JTree, r: JTree) extends JTree

  /** Extract (keyword, body) pairs from the first slash-star-plus hint block. */
  def parseHints(sql: String): Seq[(String, String)] = {
    val block = """(?s)/\*\+(.*?)\*/""".r.findFirstMatchIn(sql)
      .map(_.group(1)).getOrElse("")
    val out = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    var i = 0
    while (i < block.length) {
      while (i < block.length && block(i).isWhitespace) i += 1
      val ks = i
      while (i < block.length && (block(i).isLetterOrDigit || block(i) == '_')) i += 1
      val kw = block.substring(ks, i)
      while (i < block.length && block(i).isWhitespace) i += 1
      if (kw.nonEmpty && i < block.length && block(i) == '(') {
        var depth = 0
        val bs = i + 1
        var done = false
        while (!done && i < block.length) {
          if (block(i) == '(') depth += 1
          else if (block(i) == ')') { depth -= 1; if (depth == 0) done = true }
          i += 1
        }
        require(done, s"pg_hint_plan: unbalanced parens in hint '$kw'")
        out += ((kw.toLowerCase, block.substring(bs, i - 1).trim))
      } else if (kw.nonEmpty) {
        throw new IllegalArgumentException(
          s"pg_hint_plan: hint '$kw' has no argument list")
      } else if (i < block.length) {
        throw new IllegalArgumentException(
          s"pg_hint_plan: unparsable hint text at '${block.substring(i).take(20)}'")
      }
    }
    out.toSeq
  }

  /** Parse a Leading body — `((a b) c)` — into a join tree. */
  def parseLeading(body: String): JTree = {
    var i = 0
    def skipWs(): Unit = while (i < body.length && body(i).isWhitespace) i += 1
    def elem(): JTree = {
      skipWs()
      require(i < body.length, s"Leading: truncated body '$body'")
      if (body(i) == '(') {
        i += 1
        val l = elem()
        val r = elem()
        skipWs()
        require(i < body.length && body(i) == ')', s"Leading: expected ')' at $i in '$body'")
        i += 1
        Node(l, r)
      } else {
        val s = i
        while (i < body.length && (body(i).isLetterOrDigit || body(i) == '_')) i += 1
        require(i > s, s"Leading: expected relation name at $i in '$body'")
        Leaf(body.substring(s, i).toLowerCase)
      }
    }
    val t = elem()
    skipWs()
    require(i == body.length, s"Leading: trailing text in '$body'")
    t
  }

  private val Applicable = Set("leading", "hashjoin", "mergejoin", "parallel")

  /** Build the hinted join: relations by alias, equi-join predicates as
    * (spanned aliases, condition), hint text. Returns the joined frame
    * plus the (applied, ignored) hint counts — the pg_hint_plan ledger. */
  def run(sql: String, rels: Map[String, DataFrame],
      conds: Seq[(Set[String], Column)]): (DataFrame, Int, Int) = {
    val hints = parseHints(sql)
    val (app, ign) = hints.partition(h => Applicable(h._1))
    val leading = app.collectFirst { case ("leading", b) => parseLeading(b) }
      .getOrElse(sys.error("pg_hint_plan front-end: needs a Leading hint"))
    val methods = app.collect { case (k @ ("hashjoin" | "mergejoin"), b) =>
      (k, b.toLowerCase.split("\\s+").toSet)
    }
    val parallel = app.collect { case ("parallel", b) =>
      val parts = b.toLowerCase.split("\\s+")
      (parts(0), parts(1).toInt)
    }.toMap

    // pg_hint_plan keeps a used/unused ledger: a recognized hint that
    // never binds to a join level or relation is reported as unused.
    val consumed = scala.collection.mutable.Set.empty[Any]
    def leafDf(name: String): DataFrame = {
      val base = rels.getOrElse(name,
        sys.error(s"pg_hint_plan: unknown relation '$name'"))
      parallel.get(name) match {
        case Some(n) => consumed += (("parallel", name)); base.repartition(n)
        case None => base
      }
    }
    def build(t: JTree): (DataFrame, Set[String]) = t match {
      case Leaf(n) => (leafDf(n), Set(n))
      case Node(l, r) =>
        val (ld, ls) = build(l)
        val (rd, rs) = build(r)
        val all = ls ++ rs
        val cond = conds
          .filter { case (span, _) =>
            span.subsetOf(all) && span.intersect(ls).nonEmpty && span.intersect(rs).nonEmpty }
          .map(_._2)
          .reduceOption(_ && _)
          .getOrElse(sys.error(s"pg_hint_plan: no join predicate spans $ls × $rs"))
        val hinted = methods.collectFirst {
          case h @ ("hashjoin", ts) if ts.subsetOf(all) &&
            ts.intersect(ls).nonEmpty && ts.intersect(rs).nonEmpty =>
            consumed += h; rd.hint("shuffle_hash")
          case h @ ("mergejoin", ts) if ts.subsetOf(all) &&
            ts.intersect(ls).nonEmpty && ts.intersect(rs).nonEmpty =>
            consumed += h; rd.hint("merge")
        }.getOrElse(rd)
        (ld.join(hinted, cond), all)
    }
    val joined = build(leading)._1
    val nApplied = 1 + consumed.size // Leading itself + bound method/parallel hints
    (joined, nApplied, hints.size - nApplied)
  }

  /** The ph01 hinted query text — every hint class exercised once. */
  val Ph01Sql: String =
    """/*+ Leading((((region nation) customer) orders))
          HashJoin(region nation)
          MergeJoin(customer nation)
          Parallel(orders 16 hard)
          Rows(customer orders #999)
          Set(enable_nestloop off) */
       SELECT r_name, n_name, count(*), sum(o_totalprice)
       FROM region JOIN nation ... GROUP BY r_name, n_name"""

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // -- ph01: the hinted 4-way star join. Leading forces right-deep
    //    ((region ⋈ nation) ⋈ customer) ⋈ orders; the region–nation
    //    level is hinted to a shuffled hash join, the customer level to
    //    a sort-merge join, orders gets a Parallel(16) repartition
    //    motion, and Rows/Set land in the ignored ledger. The unhinted
    //    top level is left to AQE. Results are hint-invariant (the
    //    pg_hint_plan contract) — the oracle is the plain join --
    "ph01_hint_plan" -> { (s, dir) =>
      val rels = Map(
        "region" -> Tables.df(s, dir, "region"),
        "nation" -> Tables.df(s, dir, "nation"),
        "customer" -> Tables.df(s, dir, "customer"),
        "orders" -> Tables.df(s, dir, "orders"))
      val conds = Seq(
        (Set("region", "nation"), col("r_regionkey") === col("n_regionkey")),
        (Set("nation", "customer"), col("n_nationkey") === col("c_nationkey")),
        (Set("customer", "orders"), col("c_custkey") === col("o_custkey")))
      val (joined, nApp, nIgn) = run(Ph01Sql, rels, conds)
      joined.groupBy(col("r_name"), col("n_name"))
        .agg(count(lit(1)).as("n_orders"),
          expr("CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)")
            .as("cents"))
        .withColumn("n_hints_applied", lit(nApp))
        .withColumn("n_hints_ignored", lit(nIgn))
        .orderBy(col("r_name"), col("n_name"))
    }
  )

  def oracle: Map[String, String] = Map(
    // 4 applied (Leading, HashJoin, MergeJoin, Parallel), 2 ignored
    // (Rows, Set) — the ledger the front-end must report.
    "ph01_hint_plan" -> """
      SELECT r_name, n_name,
        CAST(count(*) AS BIGINT) AS n_orders,
        CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS cents,
        4 AS n_hints_applied, 2 AS n_hints_ignored
      FROM region
        JOIN nation ON r_regionkey = n_regionkey
        JOIN customer ON n_nationkey = c_nationkey
        JOIN orders ON c_custkey = o_custkey
      GROUP BY r_name, n_name
      ORDER BY r_name, n_name"""
  )
}
