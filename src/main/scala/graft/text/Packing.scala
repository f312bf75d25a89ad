package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence-packing and context-window chunking — the operators that
  * turn a curated corpus into fixed-token-budget training sequences.
  *
  * Both are deterministic and engine-reproducible (pure window/array
  * arithmetic over an explicit ordering — no RNG, no hash seeds), which
  * is the property a training pipeline actually needs: re-running the
  * pack over the same corpus must yield byte-identical batches.
  */
object Packing {

  /** Contiguous concat-then-split packing: within each group, documents
    * are laid end-to-end in `orderCol` order and the token stream is cut
    * into windows of `budget` tokens (the standard LLM-pretraining pack,
    * where document boundaries do not align with window boundaries).
    * Emits, per document: `bin` (the window its first token falls into),
    * `bin_offset` (position of that token within the window) and
    * `spans_boundary` (whether the document crosses into the next
    * window — the fraction of such docs is the usual packing-efficiency
    * diagnostic).
    *
    * Scale shape: ONE shuffle — a window partitioned by `groupCols`.
    * The group key must therefore be a SHARD key, not a whole-corpus
    * key: pack per (source, hash-shard) so no single window partition
    * sees more than a shard's rows. A global pack (empty `groupCols`)
    * would serialize the corpus through one partition — callers that
    * want it get it by passing an explicit constant column, not by
    * default. */
  def packContiguous(df: DataFrame, groupCols: Seq[Column], orderCol: Column,
                     sizeCol: Column, budget: Long): DataFrame = {
    require(groupCols.nonEmpty,
      "packContiguous needs a shard key: a global pack is one partition's sort at any scale")
    require(budget > 0, "budget must be positive")
    val w = Window.partitionBy(groupCols: _*).orderBy(orderCol)
    val startOff = sum(sizeCol).over(w) - sizeCol
    df.withColumn("bin", floor(startOff / budget).cast("long"))
      .withColumn("bin_offset", startOff % budget)
      .withColumn("spans_boundary", startOff % budget + sizeCol > budget)
  }

  /** Overlapping token-window chunking (context-window prep): slide a
    * `window`-token window by `stride` over each document's token
    * stream and emit one row per chunk. Tail chunks may be shorter than
    * `window` (their `n_chunk_tokens` says so); every token is covered
    * when stride <= window. Null-text documents emit NO chunk rows
    * (without the filter, the `sequence` side of the explode is
    * non-null even when the token array is null, so a null doc would
    * emit one garbage chunk with null text — poisoning token-budget
    * accounting downstream). Pure projection + explode: the token
    * array, the chunk starts (a `sequence`), and the chunk slices are
    * all computed inside the scan stage — ZERO shuffle at any scale. */
  def chunkTokenWindows(df: DataFrame, idCol: String, textCol: String,
                        window: Int, stride: Int): DataFrame = {
    require(window > 0 && stride > 0, "window and stride must be positive")
    val toks = col("__toks")
    // starts: 0, stride, 2*stride, ... while < size (>= 1 chunk per doc)
    val starts = sequence(lit(0), greatest(size(toks) - 1, lit(0)), lit(stride))
    df.filter(col(textCol).isNotNull)
      .select(col(idCol), TextOps.tokens(col(textCol)).as("__toks"))
      .select(col(idCol), posexplode(transform(starts, s => slice(toks, s + lit(1), lit(window)))))
      .select(col(idCol), col("pos").cast("long").as("chunk_idx"),
        array_join(col("col"), " ").as("chunk_text"),
        size(col("col")).cast("long").as("n_chunk_tokens"))
  }
}
