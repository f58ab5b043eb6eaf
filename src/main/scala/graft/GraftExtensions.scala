package graft

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}

import graft.functions.{TextExpressions, VectorExpressions}

/** Library extension point, installable two ways:
  *
  *   - `SparkSession.builder().withExtensions(new GraftExtensions)` —
  *     or `spark.sql.extensions=graft.GraftExtensions` on a cluster —
  *     registers everything before the session exists;
  *   - [[GraftExtensions.register]] retrofits an already-running
  *     session (idempotent), which `Tables.session`/`Tables.configure`
  *     call so `getOrCreate` reuse can never hand back a session
  *     missing the functions.
  *
  * Registered functions resolve by name through the session's
  * FunctionRegistry, so they are callable from SQL text
  * (`SELECT graft_cosine(a, b)`) as well as via `call_function`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    GraftExtensions.allFunctions.foreach(ext.injectFunction)
    ext.injectOptimizerRule(_ => graft.plans.LevenshteinLengthGuard)
  }
}

object GraftExtensions {
  private def allFunctions =
    VectorExpressions.functions ++ TextExpressions.functions

  /** Register the library's functions and optimizer rules on an
    * existing session (idempotent). */
  def register(spark: SparkSession): Unit = {
    allFunctions.foreach { case (ident, info, builder) =>
      spark.sessionState.functionRegistry.registerFunction(ident, info, builder)
    }
    if (!spark.experimental.extraOptimizations
        .contains(graft.plans.LevenshteinLengthGuard))
      spark.experimental.extraOptimizations ++=
        Seq(graft.plans.LevenshteinLengthGuard)
  }
}
