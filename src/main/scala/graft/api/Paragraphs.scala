package graft.api

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Public paragraph-granularity curation surface over any (id, text)
  * relation — the library form of the graded q_text_dedup_para /
  * q_text_para_keep_best / q_text_trim_para pipeline (graft.ops.Text
  * holds the kernels, their oracles and scale notes).
  *
  * Shape at 100 TB (all inherited from the kernels): the paragraph
  * views are per-row maps riding the scan; [[dedup]] pays ONE exchange
  * keyed on the 128-bit paragraph digest plus ONE doc-keyed
  * reconstruction exchange; [[trim]] pays dedupTrim's digest-keyed
  * positions exchange (string work only on candidate positions) plus
  * the reconstruction — nothing O(pairs), nothing collected. */
object Paragraphs {

  private def normalized(docs: DataFrame, idCol: String, textCol: String) =
    docs.select(col(idCol).as("doc_id"), col(textCol).as("text"))

  /** Separator-token paragraph view: one row per (doc_id, para_idx,
    * ptext); the separator is a whitespace-delimited TOKEN by contract
    * and is consumed. Empty paragraphs (adjacent separators) drop. */
  def view(docs: DataFrame, idCol: String, textCol: String,
      sep: String): DataFrame =
    graft.ops.Text.paragraphViewSep(normalized(docs, idCol, textCol), sep)

  /** Fixed-width paragraph view for corpora without explicit structure:
    * paragraph k = tokens [k·paraTokens, (k+1)·paraTokens). */
  def viewFixed(docs: DataFrame, idCol: String, textCol: String,
      paraTokens: Int): DataFrame =
    graft.ops.Text.paragraphView(normalized(docs, idCol, textCol), paraTokens)

  /** Paragraph dedup with document reconstruction over a separator
    * corpus: every non-first occurrence of a duplicated paragraph is
    * excised (exact strings decide; digests only key the exchange) and
    * each doc re-emits its surviving paragraphs joined with the same
    * separator — IDEMPOTENT on the surviving docs (spec-pinned, and
    * proven at 1M docs); fully-repeated docs emit text = ''.
    * Output: (doc_id, text, n_kept, n_dropped). */
  def dedup(docs: DataFrame, idCol: String, textCol: String,
      sep: String): DataFrame =
    graft.ops.Text.dedupParagraphsSep(normalized(docs, idCol, textCol), sep)

  /** [[dedup]] with a caller-chosen survivor policy over a prepared
    * (doc_id, para_idx, ptext, ...) paragraph relation — e.g. the
    * graded keep-best policy ranks by a document-quality column
    * carried on the rows: `keepOrder = Seq($"quality".desc, $"doc_id",
    * $"para_idx")`. The order must end in a unique tiebreak. */
  def dedupWithPolicy(paras: DataFrame, joiner: String,
      keepOrder: Seq[Column]): DataFrame =
    graft.ops.Text.dedupParagraphs(paras, joiner, keepOrder)

  /** Paragraph-level decontamination over a separator corpus: excise
    * every paragraph containing any probe phrase verbatim, reconstruct
    * docs with the separator. Probes spanning a paragraph boundary are
    * out of scope by construction (run a doc-level scan for those).
    * Output: (doc_id, text, n_kept, n_dropped). */
  def decontaminate(docs: DataFrame, idCol: String, textCol: String,
      sep: String, probes: Seq[String]): DataFrame =
    graft.ops.Text.decontamParagraphs(
      view(docs, idCol, textCol, sep), probes, s" $sep ")

  /** Paragraph-granularity NEAR-duplicate dedup over a separator
    * corpus: every paragraph whose 64-bit SimHash sits within
    * hamming ≤ 3 of an earlier one is excised (canonical = the
    * cluster's minimum (doc, paragraph); exact duplicates are the
    * hamming-0 case, so this subsumes [[dedup]] on paragraphs with
    * ≥ 3 tokens — shorter ones have no shingles and are always kept).
    * `maxHamming` tunes the tolerance (default 3): the candidate
    * generator's occupancy-capped mask ladder re-derives itself with
    * maxHamming + 1 parts per level (Dedup.simhashPairsRefined —
    * pigeonhole-complete for any bound, components pinned vs
    * union-find for h ∈ {2, 3, 4}). Requires a non-negative integer
    * id column and < 10⁶ paragraphs per document. Output: (doc_id,
    * text, n_kept). */
  def dedupNear(docs: DataFrame, idCol: String, textCol: String,
      sep: String, maxHamming: Int = 3): DataFrame =
    graft.ops.Text.dedupParagraphsNear(view(docs, idCol, textCol, sep),
      s" $sep ", maxHamming = maxHamming)

  /** Paragraph-granularity substring TRIM over a separator corpus:
    * every occurrence-beyond-the-first of every duplicated
    * `windowTokens`-token window is excised INSIDE paragraphs (windows
    * never span seams), and docs reconstruct with the separator
    * between surviving segments — IDEMPOTENT on the surviving docs.
    * Output: (doc_id, text, n_segments). */
  def trim(docs: DataFrame, idCol: String, textCol: String, sep: String,
      windowTokens: Int = 8): DataFrame =
    graft.ops.Text.dedupTrimParagraphsSep(
      normalized(docs, idCol, textCol), windowTokens, sep)
}
