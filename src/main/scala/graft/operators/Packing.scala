package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.Text

/** Sequence packing: assign documents to training bins of ≈ `maxTokens`
  * tokens — the step that turns a curated corpus into dense context-window
  * batches (padding waste ∝ how badly you pack).
  *
  * Distributed shape: a GLOBAL greedy first-fit is inherently sequential,
  * so packing is per-shard — documents are sharded by a deterministic hash
  * of their id (stable across reruns, like [[Sampling]]), and each shard
  * packs independently with a running token sum over a window PARTITIONED
  * by shard (never a single global window: that is one task sorting the
  * world). Bin id = floor(exclusive-cumsum / maxTokens) — the standard
  * streaming-fill approximation: a document straddling a boundary joins
  * the bin its first token lands in, so bins overflow by at most one
  * document and never split one.
  *
  * Scale: one shuffle on the shard key; window state is a running sum.
  * nShards sizes the parallelism — at 100 TB it is thousands, here it is
  * small so tests can reason about exact bins.
  */
object Packing {

  /** Per-document bin assignment: adds `shard`, `n_tokens`, `bin`. */
  def assignBins(df: DataFrame, textCol: String, idCol: String,
      maxTokens: Long, nShards: Int = 8): DataFrame = {
    require(nShards > 0, "nShards must be positive")
    // hash DIRECTLY to the shard domain — a second modulo over the sampling
    // buckets would bias shards whenever nShards ∤ BUCKETS and cap the
    // shard count at BUCKETS, which "thousands of shards at 100 TB" can hit
    assignBinsOrdered(
      df.withColumn("shard", Sampling.hashMod(col(idCol), nShards.toLong)),
      textCol, "shard", idCol, maxTokens)
  }

  /** Bin assignment over a CALLER-supplied shard/order — the composition
    * point for [[Sampling.deterministicShuffle]]: packing the SHUFFLED
    * order (`shard`, `pos`) gives bins that are random document mixes,
    * which is what training batches want, instead of the id-adjacent runs
    * [[assignBins]]'s id order produces. Same streaming-fill rule: bin =
    * floor(exclusive-cumsum / maxTokens) within each shard; same window
    * shape (partitioned, never global). Adds `n_tokens`, `bin`. */
  def assignBinsOrdered(df: DataFrame, textCol: String,
      shardCol: String, orderCol: String, maxTokens: Long): DataFrame = {
    require(maxTokens > 0, "maxTokens must be positive")
    val w = Window.partitionBy(col(shardCol)).orderBy(col(orderCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn("n_tokens", Text.tokenCount(col(textCol)).cast("long"))
      .withColumn("__cum", sum(col("n_tokens")).over(w))
      // explicit floor: values are nonnegative, but floor (not a bare
      // cast) keeps the rounding rule identical in any SQL re-derivation
      .withColumn("bin",
        floor((col("__cum") - col("n_tokens")) / maxTokens).cast("long"))
      .drop("__cum")
  }

  /** Bin-level packing report: how full the bins actually are. */
  def binStats(assigned: DataFrame): DataFrame =
    assigned.groupBy(col("shard"), col("bin"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tokens")).as("sum_tokens"))

  /** Split documents into context-window chunks of ≤ `maxTokens` whitespace
    * tokens, consecutive chunks sharing `overlap` tokens of left context —
    * the chunker that turns curated documents into training windows (and
    * retrieval passages). Emits one row per chunk: (idCol, chunk_no,
    * chunk_text, n_chunk_tokens); an empty/whitespace-only document yields
    * chunk 0 with empty text (row accounting preserved, same rule as
    * lineDedup); NULL text yields a NULL chunk.
    *
    * The chunk text is built from the ORIGINAL tokens — casing and
    * punctuation survive verbatim (Text.normalize is a fingerprinting
    * canonicalization, never an output transform); the one inherent loss
    * of token-window chunking is that intra-document whitespace RUNS
    * (including newlines) collapse to single spaces at the re-join.
    *
    * Scale shape: pure map-side explode — token array staged ONCE as a
    * column so the transform lambda touches only its attribute (an inline
    * tokenization inside the lambda would re-tokenize per element — the
    * re-evaluation trap Text.shingles documents); no shuffle, no state. */
  def chunk(df: DataFrame, textCol: String, idCol: String,
      maxTokens: Int, overlap: Int = 0): DataFrame = {
    require(maxTokens > 0 && overlap >= 0 && overlap < maxTokens,
      s"need 0 <= overlap ($overlap) < maxTokens ($maxTokens)")
    val stride = maxTokens - overlap
    val nChunks = when(col("__ntok") <= overlap, lit(1L)).otherwise(
      ceil((col("__ntok") - overlap).cast("double") / stride).cast("long"))
    val chunksArr = when(col(textCol).isNull,
        lit(null).cast("array<string>"))
      .otherwise(transform(sequence(lit(0L), nChunks - 1),
        i => array_join(
          slice(col("__toks"), (i * stride + 1).cast("int"), lit(maxTokens)),
          " ")))
    // explicit [ \t\n\r] class (not \s) on both engines: Java's \s
    // includes \x0B, RE2's does not — the parity footgun piiPatterns
    // documents
    val trimmed = trim(col(textCol), " \t\n\r")
    df.withColumn("__toks", split(trimmed, "[ \t\n\r]+"))
      .withColumn("__ntok",
        when(length(trimmed) === 0, 0L).otherwise(size(col("__toks")).cast("long")))
      .select(col(idCol), posexplode_outer(chunksArr))
      .toDF(idCol, "chunk_no", "chunk_text")
      .withColumn("n_chunk_tokens",
        when(col("chunk_text").isNull || length(col("chunk_text")) === 0, 0L)
          .otherwise(size(split(col("chunk_text"), " ")).cast("long")))
  }
}
