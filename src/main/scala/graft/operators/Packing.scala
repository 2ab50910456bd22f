package graft.operators

import graft.QueryDef
import graft.sources.Tables.table
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence packing — the concat-and-chunk step a pre-training data
  * pipeline runs after filtering/dedup: documents are concatenated in
  * a deterministic order (an EOD separator token after each) and the
  * token stream is cut into fixed-capacity training sequences; each
  * document is assigned the span of sequences its tokens land in.
  *
  * Scale shape: the corpus is hash-sharded (`doc_id % nShards`) and
  * packing runs INDEPENDENTLY per shard — one window sort per shard,
  * no global order, no shuffle beyond the window's hash partitioning.
  * At 100 TB the shard count is the parallelism dial (10k shards →
  * 10k independent sorts of ~10 GB each); sequences never cross
  * shards, so downstream readers consume shards as self-contained
  * packed files. All the math is integer window arithmetic —
  * whole-stage codegen'd, exactly replayable by any SQL engine.
  *
  * Token counting mirrors TextAnalysis (whitespace split), so the
  * packed offsets agree with `q_token_count`/`q_chunk_docs`.
  */
object Packing {

  /** Per-document packing assignment over shard-local concatenation.
    *
    * Emits one row per document: its shard, token count, start offset
    * in the shard's concatenated token stream (documents ordered by
    * `idCol` within the shard, `eodTokens` separator tokens appended
    * after each document), and the first/last sequence index of the
    * capacity-`seqTokens` windows its own tokens occupy (the EOD may
    * spill into the next sequence; it belongs to no document).
    */
  def packSequences(docs: DataFrame, idCol: String, textCol: String,
      seqTokens: Int = 256, nShards: Int = 8,
      eodTokens: Int = 1): DataFrame = {
    val nToks = size(split(trim(col(textCol)), "\\s+"))
    val shard = col(idCol) % nShards
    val w = Window.partitionBy("shard").orderBy(idCol)
      .rowsBetween(Window.unboundedPreceding, -1)
    docs
      .select(col(idCol), shard.as("shard"), nToks.as("n_toks"))
      .withColumn("start_off",
        coalesce(sum(col("n_toks") + eodTokens).over(w), lit(0L)))
      .select(col(idCol), col("shard"), col("n_toks").cast("long").as("n_toks"),
        col("start_off"),
        (col("start_off") / seqTokens).cast("long").as("first_seq"),
        ((col("start_off") + col("n_toks") - 1) / seqTokens)
          .cast("long").as("last_seq"))
  }

  /** Per-shard packing efficiency: documents, payload+EOD tokens, the
    * number of capacity-`seqTokens` sequences the shard fills, and the
    * fill ratio (1.0 = zero padding in every sequence but the last is
    * impossible; the tail sequence's padding is the only loss in
    * concat-and-chunk packing).
    */
  def packFill(docs: DataFrame, idCol: String, textCol: String,
      seqTokens: Int = 256, nShards: Int = 8,
      eodTokens: Int = 1): DataFrame = {
    val nToks = size(split(trim(col(textCol)), "\\s+"))
    docs
      .select((col(idCol) % nShards).as("shard"),
        (nToks + eodTokens).cast("long").as("__t"))
      .groupBy("shard")
      .agg(count(lit(1)).as("n_docs"), sum("__t").as("total_toks"))
      .select(col("shard"), col("n_docs"), col("total_toks"),
        ceil(col("total_toks") / lit(seqTokens.toDouble)).as("n_seqs"))
      .withColumn("fill_pct",
        round(col("total_toks") / (col("n_seqs") * seqTokens), 4))
  }

  def defs: Map[String, QueryDef] = Map(
    // Packing assignment at capacity 256 over 8 shards. The oracle
    // rebuilds the shard-local running offsets and both sequence
    // indexes with the same window math — a changed doc order, EOD
    // count, or an off-by-one in the span ends hash-mismatches.
    "q_pack_sequences" -> QueryDef(
      (s, dir) => packSequences(table(s, dir, "documents"),
        "doc_id", "text", seqTokens = 256, nShards = 8)
        .orderBy("doc_id"),
      """WITH t AS (
        |  SELECT doc_id, doc_id % 8 AS shard,
        |    CAST(len(regexp_split_to_array(trim(text), '\s+')) AS BIGINT)
        |      AS n_toks
        |  FROM documents),
        |o AS (
        |  SELECT doc_id, shard, n_toks,
        |    CAST(coalesce(sum(n_toks + 1) OVER (PARTITION BY shard
        |      ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING
        |      AND 1 PRECEDING), 0) AS BIGINT) AS start_off
        |  FROM t)
        |SELECT doc_id, shard, n_toks, start_off,
        |  start_off // 256 AS first_seq,
        |  (start_off + n_toks - 1) // 256 AS last_seq
        |FROM o ORDER BY doc_id""".stripMargin),

    // Shard-level fill accounting for the same packing run: one
    // narrow aggregate (map-side partial), the shape a 100 TB job
    // would use to size its output files.
    "q_pack_fill" -> QueryDef(
      (s, dir) => packFill(table(s, dir, "documents"),
        "doc_id", "text", seqTokens = 256, nShards = 8)
        .orderBy("shard"),
      """WITH t AS (
        |  SELECT doc_id % 8 AS shard,
        |    CAST(len(regexp_split_to_array(trim(text), '\s+')) + 1 AS BIGINT)
        |      AS toks
        |  FROM documents),
        |g AS (
        |  SELECT shard, count(*) AS n_docs,
        |    CAST(sum(toks) AS BIGINT) AS total_toks
        |  FROM t GROUP BY shard)
        |SELECT shard, n_docs, total_toks,
        |  CAST(ceil(total_toks / 256.0) AS BIGINT) AS n_seqs,
        |  round(total_toks / (n_seqs * 256.0), 4) AS fill_pct
        |FROM g ORDER BY shard""".stripMargin))
}
