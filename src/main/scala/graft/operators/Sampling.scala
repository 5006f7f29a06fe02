package graft.operators

import graft.{QueryDef, Tables}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Corpus-curation operators a training-data pipeline runs constantly:
  * stratified subsampling (cap docs per stratum) and distribution
  * profiling (token-length histogram). Both deterministic and
  * oracle-checked — sampling uses md5 order (stable in any engine), not
  * rand().
  */
object Sampling {

  def defs: Seq[QueryDef] = Seq(q53, q54)

  /** Stratified sample: at most K documents per (lang, source) stratum,
    * selected by md5(text) order — deterministic, uniform-ish, and
    * reproducible across engines/runs (rand() is none of those). At
    * 100 TB this is one shuffle on the stratum key; the window top-k
    * never global-sorts.
    */
  val q53: QueryDef = QueryDef.checked(
    "q53_stratified_sample",
    """WITH ranked AS (
      |  SELECT doc_id, lang, source, md5(text) AS h,
      |         row_number() OVER (PARTITION BY lang, source ORDER BY md5(text), doc_id) AS rn
      |  FROM documents)
      |SELECT lang, source, doc_id, rn
      |FROM ranked WHERE rn <= 5 ORDER BY lang, source, rn""".stripMargin) { (s, d) =>
    val w = Window.partitionBy(col("lang"), col("source"))
      .orderBy(col("h"), col("doc_id"))
    Tables.documents(s, d)
      .select(col("doc_id"), col("lang"), col("source"),
        md5(col("text").cast("binary")).as("h"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 5)
      .select(col("lang"), col("source"), col("doc_id"), col("rn"))
      .orderBy(col("lang"), col("source"), col("rn"))
  }

  /** Token-length histogram: corpus length distribution in fixed-width
    * buckets (the profile every data-quality pass reads first). Single
    * scan, map-side partial agg, ~20 output rows — the shape that works
    * at any corpus size.
    */
  val q54: QueryDef = QueryDef.checked(
    "q54_token_histogram",
    """SELECT CAST(floor(len(string_split(text, ' ')) / 20) AS BIGINT) AS bucket,
      | COUNT(*) AS n_docs,
      | CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS n_tokens,
      | MIN(len(string_split(text, ' '))) AS min_len,
      | MAX(len(string_split(text, ' '))) AS max_len
      |FROM documents GROUP BY 1 ORDER BY bucket""".stripMargin) { (s, d) =>
    val nTok = size(split(col("text"), " "))
    Tables.documents(s, d)
      // floor (not a bare cast): DuckDB CAST(double AS BIGINT) ROUNDS
      // while Spark's cast truncates — floor makes both sides identical
      .select(floor(nTok.cast("long") / 20).cast("long").as("bucket"), nTok.as("len"))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("len")).cast("long").as("n_tokens"),
        min(col("len")).as("min_len"),
        max(col("len")).as("max_len"))
      .orderBy(col("bucket"))
  }
}
