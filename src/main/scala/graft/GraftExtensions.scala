package graft

import org.apache.spark.sql.SparkSessionExtensions

/** Session-extension entry point: registers graft's custom expressions
  * for SQL users. Enable with
  * `spark.sql.extensions=graft.GraftExtensions` (or programmatically via
  * `SparkSession.builder.withExtensions(new GraftExtensions)`).
  *
  * Delegates to [[graft.functions.GraftFunctions.descriptors]] — the ONE
  * registration surface (this class and
  * `graft.functions.GraftExtensions` are interchangeable config values),
  * so the function set, arity validation, and behavior cannot diverge
  * between the two advertised entry points.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    graft.functions.GraftFunctions.descriptors.foreach(ext.injectFunction)
}
