package graft.api

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Public BPE tokenizer-training surface over any (id, text) relation —
  * the library form of the graded q_text_bpe_train / q_text_bpe_tokens
  * pipeline (graft.ops.Text holds the kernels and their scale notes).
  *
  * Shape at 100 TB: [[train]]'s only corpus-sized stage is the initial
  * word-frequency aggregate (words are the partial-agg key, so each
  * task collapses to its distinct words before the exchange); every
  * training superstep then runs on the |vocab|-row relation — one
  * bounded shuffle plus one 1-row argmax collect per merge.
  * [[segmentation]] is the vocab-bounded (word → subtokens) artifact;
  * apply it to a corpus with a broadcast join against exploded words
  * (the q_text_bpe_tokens pattern) — never row-at-a-time. */
object Bpe {

  /** One learned merge rule; `step` is 1-based and order matters. */
  final case class Merge(step: Int, lhs: String, rhs: String,
    merged: String, pair_count: Long)

  /** Train `nMerges` byte-pair merges on the whitespace words of
    * `textCol`. Deterministic: integer pair counts, (count DESC, lhs,
    * rhs) tie-break. Runs the merge-batched DELTA trainer — the
    * identical merge table as classic sequential BPE (spec-pinned
    * equivalence; see graft.ops.Text.bpeTrainBatched's admission proof
    * and bpeTrainDelta's maintenance argument) in ~batch× fewer driver
    * supersteps, each costing O(affected words) rather than O(corpus)
    * — the difference between a production 32k-merge vocabulary and
    * an intractable one. */
  def train(docs: DataFrame, textCol: String, nMerges: Int): Seq[Merge] =
    graft.ops.Text.bpeTrainDelta(
      graft.ops.Text.bpeWords(docs.select(col(textCol).as("text"))), nMerges)._1
      .map(m => Merge(m.step, m.lhs, m.rhs, m.merged, m.pair_count))

  /** The trained tokenizer as a relation: one row per distinct word
    * with its subtoken array under `merges`. Vocab-bounded — broadcast
    * it onto the corpus to tokenize. */
  def segmentation(docs: DataFrame, textCol: String, merges: Seq[Merge]): DataFrame = {
    val words = graft.ops.Text.bpeWords(docs.select(col(textCol).as("text")))
    graft.ops.Text.bpeApply(words,
        merges.map(m => graft.ops.Text.BpeMerge(m.step, m.lhs, m.rhs, m.merged, m.pair_count)))
      .select(col("w").as("word"), col("freq"),
        graft.ops.Text.bpeSymArray(col("syms")).as("subtokens"))
  }
}
