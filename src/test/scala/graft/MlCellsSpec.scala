package graft

import org.scalatest.funsuite.AnyFunSuite

/** r19: ml08/ml09 execute over the weighted contingency table (cells
  * carrying n = count, pos = Σy) instead of row-level relations — valid
  * because both features are static and routing is a pure function of
  * (node, price_bin, cust_bin), so a cell never splits across paths.
  * These tests pin the equivalence INSIDE Spark: the cell execution
  * must produce row-for-row the same result as the row-level spec
  * chain (the oracle text) run directly on Spark, including the Gini
  * doubles and every census count. (The DuckDB oracle check proves the
  * same thing cross-engine; this pins it per `sbt test` run.)
  */
class MlCellsSpec extends AnyFunSuite {

  private def rows(name: String) = {
    val s = SparkSuite.spark
    operators.Ml.queries(name)(s, SparkSuite.Sf).collect().toSeq
  }

  private def specRows(name: String) = {
    val s = SparkSuite.spark
    Tables.register(s, SparkSuite.Sf)
    s.sql(operators.Ml.oracle(name)).collect().toSeq
  }

  test("ml08: cell-based tree == row-level spec chain (same engine)") {
    assert(rows("ml08_decision_tree") == specRows("ml08_decision_tree"))
  }

  test("ml09: cell-based confusion == row-level spec chain (same engine)") {
    assert(rows("ml09_tree_confusion") == specRows("ml09_tree_confusion"))
  }
}
