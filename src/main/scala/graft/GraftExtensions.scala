package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo
import graft.functions.CosineSimilarity

/** Session-extension entry point: registers graft's custom expressions for
  * SQL users. Enable with
  * `spark.sql.extensions=graft.GraftExtensions` (or programmatically via
  * `SparkSession.builder.withExtensions(new GraftExtensions)`).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      new FunctionIdentifier("graft_cosine"),
      new ExpressionInfo(
        classOf[CosineSimilarity].getName, "graft_cosine",
        "graft_cosine(a, b) - fused cosine similarity over float/double arrays"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        CosineSimilarity(exprs(0), exprs(1))))
  }
}
