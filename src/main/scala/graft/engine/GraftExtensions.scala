package graft.engine

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

/** The `spark.sql.extensions` entry point — the standard way a THIRD-PARTY
  * deployment plugs this library into a cluster it does not bootstrap
  * (Databricks/EMR/K8s images set the conf; no application code runs
  * before the session exists):
  *
  * {{{
  *   spark-submit --conf spark.sql.extensions=graft.engine.GraftExtensions ...
  * }}}
  *
  * Injects the same native codegen'd expression catalog
  * [[GraftSession.registerFunctions]] registers per-session
  * (`minhash_signature`, `dot_product`, `rolling_minhash`, `simhash`,
  * `unit_norm`, `match_fraction`) — but as BUILT-IN functions available
  * to every session derived from the config, including `newSession()`
  * clones and SQL-only clients (JDBC/Thrift), which the temp-function
  * path cannot reach.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftSession.nativeFunctions.foreach { case (name, builder) =>
      ext.injectFunction((FunctionIdentifier(name),
        new ExpressionInfo("graft.functions", name), builder))
    }
}
