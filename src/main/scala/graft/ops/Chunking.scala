package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Document chunking for training-data pipelines: split each document into
  * fixed-size token windows with configurable overlap (the shape LLM
  * pretraining / RAG-indexing jobs feed downstream).
  *
  * Pure `Column` expressions — the token array is built once per row and the
  * chunk starts are a generated `sequence`, so the whole op is one
  * narrow-stage `posexplode` fused into the scan: zero shuffles, linear in
  * output size, no driver involvement. At 100 TB chunking is embarrassingly
  * parallel; output row count is ~n_tokens/stride per document, so the only
  * scale knob is the downstream shuffle (if any) — this op itself adds none.
  */
object Chunking {

  /** Explode `textCol` into overlapping chunks of `chunkSize` whitespace
    * tokens advancing by `chunkSize - overlap` per step. The final chunk may
    * be shorter; a trailing window that would add no new tokens (start >
    * n_tokens - overlap) is not emitted. Documents with zero tokens produce
    * no rows.
    *
    * Output: (idCol, chunk_idx, chunk_text, n_tokens) — chunk_idx 0-based.
    */
  def tokenChunks(df: DataFrame, idCol: String, textCol: String,
      chunkSize: Int, overlap: Int = 0): DataFrame = {
    require(chunkSize > 0, "chunkSize must be positive")
    require(overlap >= 0 && overlap < chunkSize,
      "overlap must be in [0, chunkSize)")
    val stride = chunkSize - overlap
    df.select(col(idCol), TextFunctions.tokens(col(textCol)).as("__toks"))
      .where(size(col("__toks")) > 0)
      .select(col(idCol), col("__toks"),
        posexplode(sequence(lit(1),
          greatest(size(col("__toks")) - overlap, lit(1)), lit(stride)))
          .as(Seq("chunk_idx", "__start")))
      .select(col(idCol),
        col("chunk_idx").cast("long").as("chunk_idx"),
        concat_ws(" ", slice(col("__toks"), col("__start"), lit(chunkSize)))
          .as("chunk_text"),
        least(lit(chunkSize), size(col("__toks")) - col("__start") + 1)
          .cast("long").as("n_tokens"))
  }
}
