package graft.operators

import graft.{QueryDef, Tables}
import graft.functions.{TextFunctions => TF}
import org.apache.spark.sql.functions._

/** Text-analysis operators over `documents`: language ID (stopword-profile
  * heuristic), quality scoring, token counting (whitespace + BPE-ish
  * regex), and content fingerprinting. All row-local codegen'd
  * projections — embarrassingly parallel, no shuffle (except the final
  * ORDER BY for the deterministic compare, which a production run drops).
  */
object TextAnalysis {

  def defs: Seq[QueryDef] = Seq(q34, q35, q36, q37, q49)

  private val stopList = TF.StopWords.map(w => s"'$w'").mkString(", ")

  /** Language-ID heuristic: stopword-hit ratio (the corpus vocabulary is
    * English-ish, so the honest heuristic output is en/unknown; the point
    * is the deterministic, oracle-checkable scoring pipeline).
    */
  val q34: QueryDef = QueryDef.checked(
    "q34_langid",
    s"""SELECT doc_id,
       | len(list_filter(string_split(text, ' '), t -> t IN ($stopList))) AS stop_hits,
       | len(string_split(text, ' ')) AS n_tokens,
       | CASE WHEN len(list_filter(string_split(text, ' '), t -> t IN ($stopList))) * 1.0
       |           / len(string_split(text, ' ')) >= 0.05
       |      THEN 'en' ELSE 'unknown' END AS pred_lang
       |FROM documents ORDER BY doc_id""".stripMargin) { (s, d) =>
    val toks = TF.tokens(col("text"))
    val hits = TF.stopwordHits(toks)
    Tables.documents(s, d)
      .select(col("doc_id"),
        hits.as("stop_hits"),
        size(toks).as("n_tokens"),
        when(hits.cast("double") / size(toks) >= 0.05, "en")
          .otherwise("unknown").as("pred_lang"))
      .orderBy(col("doc_id"))
  }

  /** Quality scoring: token/char stats and a bounded composite score.
    * All ratios are int/int double divisions on identical operands →
    * bit-deterministic in both engines.
    */
  val q35: QueryDef = QueryDef.checked(
    "q35_text_quality",
    """SELECT doc_id,
      | length(text) AS n_chars,
      | len(string_split(text, ' ')) AS n_tokens,
      | len(list_distinct(string_split(text, ' '))) AS n_uniq,
      | length(replace(text, ' ', '')) * 1.0 / len(string_split(text, ' ')) AS avg_tok_len,
      | len(list_distinct(string_split(text, ' '))) * 1.0
      |   / len(string_split(text, ' ')) AS uniq_ratio,
      | ROUND(0.5 * least(1.0, len(string_split(text, ' ')) / 100.0)
      |     + 0.5 * (len(list_distinct(string_split(text, ' '))) * 1.0
      |              / len(string_split(text, ' '))), 6) AS quality
      |FROM documents ORDER BY doc_id""".stripMargin) { (s, d) =>
    val toks = TF.tokens(col("text"))
    val nTok = size(toks)
    val nUniq = size(array_distinct(toks))
    Tables.documents(s, d)
      .select(col("doc_id"),
        length(col("text")).as("n_chars"),
        nTok.as("n_tokens"),
        nUniq.as("n_uniq"),
        (length(regexp_replace(col("text"), " ", "")).cast("double") / nTok)
          .as("avg_tok_len"),
        (nUniq.cast("double") / nTok).as("uniq_ratio"),
        round(lit(0.5) * least(lit(1.0), nTok / lit(100.0))
          + lit(0.5) * (nUniq.cast("double") / nTok), 6).as("quality"))
      .orderBy(col("doc_id"))
  }

  /** Token counting: whitespace tokens vs BPE-ish piece tokens (regex
    * alternation over word/digit/punct runs) vs distinct counts.
    */
  val q36: QueryDef = QueryDef.checked(
    "q36_token_count",
    s"""SELECT doc_id,
       | len(string_split(text, ' ')) AS ws_tokens,
       | len(regexp_extract_all(text, '${TF.PieceTokenPattern}')) AS piece_tokens,
       | len(list_distinct(string_split(text, ' '))) AS uniq_tokens
       |FROM documents ORDER BY doc_id""".stripMargin) { (s, d) =>
    Tables.documents(s, d)
      .select(col("doc_id"),
        size(TF.tokens(col("text"))).as("ws_tokens"),
        TF.pieceTokenCount(col("text")).as("piece_tokens"),
        size(array_distinct(TF.tokens(col("text")))).as("uniq_tokens"))
      .orderBy(col("doc_id"))
  }

  /** Content fingerprint (md5 of normalized text) + 256-way bucket — the
    * partition-friendly form used to shard exact dedup at scale.
    */
  val q37: QueryDef = QueryDef.checked(
    "q37_fingerprint",
    """SELECT doc_id,
      | md5(regexp_replace(trim(lower(text)), ' +', ' ', 'g')) AS fp,
      | substring(md5(regexp_replace(trim(lower(text)), ' +', ' ', 'g')), 1, 2) AS bucket
      |FROM documents ORDER BY doc_id""".stripMargin) { (s, d) =>
    val fp = TF.fingerprint(col("text"))
    Tables.documents(s, d)
      .select(col("doc_id"), fp.as("fp"), substring(fp, 1, 2).as("bucket"))
      .orderBy(col("doc_id"))
  }

  /** Rolling-hash fingerprints via the custom PolyHash codegen expression:
    * whole-document 61-bit fingerprint plus first-token-chunk hash (the
    * building block for content-defined chunk dedup). Rows-only — the
    * polynomial is engine-specific; PolyHashSpec pins reference values
    * computed independently with BigInt arithmetic.
    */
  val q49: QueryDef = QueryDef.rowsOnly("q49_rolling_fingerprint") { (s, d) =>
    import graft.functions.PolyHash.polyhash
    Tables.documents(s, d)
      .select(col("doc_id"),
        polyhash(TF.normalize(col("text"))).as("fp64"),
        polyhash(substring(col("text"), 1, 32)).as("head_fp"),
        pmod(polyhash(TF.normalize(col("text"))), lit(256)).as("bucket"))
      .orderBy(col("doc_id"))
  }
}
