package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Incremental materialization — recompute a per-document derivation only
  * for documents that are NEW or CHANGED since the previous corpus
  * snapshot, and carry the previous run's results forward for everything
  * untouched. This is how a production pipeline actually runs its
  * expensive per-doc stages (boilerplate extraction, tokenization,
  * feature scoring) on a refreshed crawl: the delta is typically a few
  * percent of the corpus, so the stage costs delta-sized compute instead
  * of corpus-sized (the view-maintenance counterpart of the append-only
  * index operators, `Dedup.appendToMinHashIndex` /
  * `Similarity.appendToIvfIndex`).
  *
  * CONTRACT: `compute` must be a PURE per-document derivation — each
  * output row a function of its own input row only (readability, quality
  * rules, boilerplate, fingerprints...). Corpus-dependent stages (LM
  * scores trained on the corpus, TF-IDF, MinHash-vs-corpus) must NOT be
  * carried forward this way — their old results are stale the moment any
  * document changes; route those through the index-append operators
  * instead.
  *
  * ENGINE SHAPE: change detection joins md5(change-key) pairs on doc_id —
  * two slim (doc_id, hash) shuffles, text stays out of both; the delta
  * anti-join then feeds `compute` only the added/changed rows, and
  * carried results join on the unchanged id set. At 100 TB the old
  * results and hashes are persisted tables (the caller's side of the
  * contract); everything here is one lazy plan over them. */
object Incremental {

  /** Results of `compute` over `newDocs`, built as
    * compute(added ∪ changed) ∪ oldResults[unchanged].
    * `keyCol` is the change-detection payload (text, html, ...);
    * `oldResults` must be compute's output for `oldDocs` and share
    * compute's output schema. Removed documents drop out naturally
    * (their ids are absent from `newDocs`). */
  def materialize(oldDocs: DataFrame, oldResults: DataFrame,
      newDocs: DataFrame, compute: DataFrame => DataFrame,
      keyCol: String = "text"): DataFrame = {
    val oh = oldDocs.select(col("doc_id"), md5(col(keyCol)).as("__oh"))
    val nh = newDocs.select(col("doc_id"), md5(col(keyCol)).as("__nh"))
    val unchangedIds = nh.join(oh, Seq("doc_id"))
      .filter(col("__oh") === col("__nh")).select("doc_id")
    compute(newDocs.join(unchangedIds, Seq("doc_id"), "left_anti"))
      .unionByName(oldResults.join(unchangedIds, "doc_id"))
  }
}
