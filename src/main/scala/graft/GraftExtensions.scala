package graft

import org.apache.spark.sql.SparkSessionExtensions

/** Session extensions exposing the engine's native expressions to SQL users:
  *
  * {{{
  * spark-submit --conf spark.sql.extensions=graft.GraftExtensions ...
  * // or
  * SparkSession.builder().withExtensions(new GraftExtensions()) ...
  * }}}
  *
  * after which `SELECT hash60(col)` is available in Spark SQL. The
  * DataFrame-API operators do not require this — they build the expressions
  * directly (graft.ops.Hashing).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction(graft.plans.Hash60.registryEntry)
  }
}
