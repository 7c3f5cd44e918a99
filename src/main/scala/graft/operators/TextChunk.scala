package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Overlapping token-window chunking — the standard pre-tokenization
  * step of an LLM training pipeline: long documents become fixed-size
  * windows (`chunkSize` tokens) advanced by `stride` tokens, so
  * consecutive chunks overlap by `chunkSize - stride` tokens and no
  * token span longer than the window is ever lost at a boundary.
  *
  * Scale shape: a pure narrow transform — one `split`, one generator
  * (`posexplode` over the start offsets), one `slice` per row; no
  * shuffle, no state, fully whole-stage-codegen'd. Output row count is
  * ~`n_tokens / stride` per document, each chunk carrying its ordinal
  * and true token count (the final window is short when the document
  * length is not stride-aligned — standard chunking semantics).
  */
object TextChunk {

  /** Chunk `textCol` (single-space-tokenized) into overlapping
    * windows. Output: the id column, `chunk_idx` (0-based ordinal),
    * `chunk_tokens` (actual tokens in this window, = chunkSize except
    * possibly the last), `chunk_text` (space-rejoined window).
    *
    * NULL text yields NO chunk rows (filtered before the generator):
    * without the filter, `greatest(size(NULL)-1, 0)` = 0 emits one
    * start offset and `least(chunkSize, NULL)` evaluates to chunkSize,
    * producing a phantom (0, chunkSize, NULL) row that inflates token
    * counts downstream in [[TextPack]].
    */
  def transform(df: DataFrame, idCol: String, textCol: String,
                chunkSize: Int, stride: Int): DataFrame = {
    require(chunkSize > 0, s"chunkSize must be positive, got $chunkSize")
    require(stride > 0 && stride <= chunkSize,
      s"stride must be in [1, chunkSize]: got stride=$stride size=$chunkSize")
    val toks: Column = split(col(textCol), " ")
    df.where(col(textCol).isNotNull)
      .select(col(idCol), toks.as("__toks"))
      .select(col(idCol), col("__toks"),
        posexplode(sequence(lit(0),
          greatest(size(col("__toks")) - 1, lit(0)), lit(stride)))
          .as(Seq("chunk_idx", "__start")))
      .select(col(idCol),
        col("chunk_idx").cast("long").as("chunk_idx"),
        least(lit(chunkSize), size(col("__toks")) - col("__start"))
          .cast("long").as("chunk_tokens"),
        array_join(slice(col("__toks"), col("__start") + 1, lit(chunkSize)), " ")
          .as("chunk_text"))
  }
}
