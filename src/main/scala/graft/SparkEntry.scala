package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7.
  *
  * `queries` enumerates the engine's declared operator surface (one entry
  * per implemented operator family from SURVEY.md §2); `oracleSql` gives
  * the DuckDB-equivalent SQL for the driver's hash compare. Non-SQL-
  * expressible operators (MinHash/SimHash/LSH — seeded-hash dependent)
  * appear in `queries` only → rows-only check + dedicated ScalaTest specs.
  */
object SparkEntry {

  /** All declared query definitions, grouped by operator family. */
  def allDefs: Seq[QueryDef] =
    operators.Relational.defs ++ operators.Scalars.defs ++
      operators.Dedup.defs ++ operators.Similarity.defs ++
      operators.TextAnalysis.defs ++ operators.Multimodal.defs ++
      operators.PipelineOps.defs ++ operators.Extended.defs ++
      operators.Scale.defs ++ operators.TimeJoins.defs ++
      operators.Sampling.defs ++ operators.Curation.defs ++
      operators.Layout.defs ++ operators.Entity.defs ++ operators.Graph.defs ++
      operators.StreamingCatalog.defs

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * Uses the 6-way join + grouped aggregation (q08) — exercises scan,
    * broadcast, shuffle, and exact-decimal agg in one plan.
    */
  def entry(spark: SparkSession): DataFrame =
    operators.Relational.q08.fn(spark, "/root/testdata/sf0.001")

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    allDefs.map(q => q.name -> q.fn).toMap

  def oracleSql: Map[String, String] =
    allDefs.flatMap(q => q.oracle.map(q.name -> _)).toMap
}
