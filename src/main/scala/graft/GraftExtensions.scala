package graft

import org.apache.spark.sql.SparkSessionExtensions

/** Library entry point for `SparkSession.builder().withExtensions(new
  * GraftExtensions)`: installs the PG function-compat layer and the
  * AQUMV optimizer rule into every session built from the builder —
  * the `CbSession` wiring SURVEY.md §7.1 describes.
  *
  * (Sessions created without extensions can call
  * `PgFunctions.register(spark)` / `AqumvRule.install(spark)`
  * imperatively — the query entries do exactly that, so the driver's
  * plain session works too.)
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectOptimizerRule(session => new rules.AqumvRule(session))
    ext.injectOptimizerRule(session => new rules.EagerAggRule(session))
    ext.injectOptimizerRule(_ => rules.BindExpensiveFilterRule)
    // function registration needs only the registry, not the session:
    // reuse the same builders the imperative path uses
    functions.PgFunctions.builders.foreach { case (name, builder) =>
      ext.injectFunction((
        new org.apache.spark.sql.catalyst.FunctionIdentifier(name),
        new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
          "graft.functions.PgFunctions", name),
        builder))
    }
  }
}
