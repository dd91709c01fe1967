package graft.plans

import org.apache.spark.sql.SparkSessionExtensions

/** SparkSessionExtensions entry point so deployments can enable the
  * graft planner strategies declaratively:
  *
  * {{{
  * spark.sql.extensions=graft.plans.GraftExtensions
  * // or: SparkSession.builder().withExtensions(new GraftExtensions)
  * }}}
  *
  * (TopK.perKey also self-registers via experimental strategies for
  * ad-hoc sessions.)
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectPlannerStrategy(_ => TopKStrategy)
    e.injectOptimizerRule(_ => TopKRewriteRule)
  }
}
