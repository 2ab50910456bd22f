package graft.operators

import graft.QueryDef
import graft.sources.Tables.table
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Training-export layout: deterministic global shuffle into shards,
  * and equi-depth binning for feature discretization. The reference
  * pipeline's export step writes one unordered dump
  * (etl-pipeline-old/flow/save_data.py:24); a training pipeline
  * additionally needs the corpus in a SEEDED pseudo-random order,
  * split into fixed shards, so every epoch and every re-run reads the
  * same bytes in the same sequence. Keyed off content hashes, never
  * `rand()` — same guarantees as [[Sampling]]: re-ingestion cannot
  * migrate rows between shards.
  */
object Sharding {

  /** Deterministic shuffle + shard assignment: each row gets a shard
    * (32-bit md5-prefix mod `numShards`) and a position within that
    * shard (rank of the full md5, ties broken by key). Reading shards
    * 0..N-1 each ordered by `pos` replays one fixed global
    * pseudo-random permutation of the corpus; changing `salt` is the
    * "reshuffle between epochs" knob.
    *
    * Scale shape: NO global sort — the only wide exchange is the
    * hash-partition on `shard`, and each shard sorts independently
    * (window per shard). At 100 TB with numShards sized so a shard
    * fits an executor (e.g. 100k shards of ~1 GB), this is one
    * shuffle followed by embarrassingly-parallel per-shard sorts;
    * `df.repartition(numShards, $"shard").sortWithinPartitions("pos")
    * .write` then emits exactly one ordered file per shard.
    */
  def shuffleShard(df: DataFrame, keyCol: String, numShards: Int,
      salt: String = "shard"): DataFrame = {
    require(numShards > 0, s"numShards must be positive: $numShards")
    val ord = md5(concat(col(keyCol).cast("string"), lit("|" + salt)))
    val w = Window.partitionBy("shard").orderBy(col("__ord"), col(keyCol))
    df.withColumn("__ord", ord)
      .withColumn("shard",
        (conv(substring(col("__ord"), 1, 8), 16, 10).cast("long")
          % numShards).cast("int"))
      .withColumn("pos", row_number().over(w))
      .drop("__ord")
  }

  /** Equi-depth (equal-count) bins per group: `ntile(numBins)` over
    * the value, ties broken by the key columns so the bin boundary is
    * deterministic — the discretization step of feature
    * engineering (quantile binning of a score before bucketed
    * training-mix decisions).
    *
    * Exactness costs a per-group sort (one shuffle on the group
    * column, same shape as `q_percentile`). At 100 TB swap the exact
    * window for broadcast cut-points from [[Sketches.gridQuantiles]]
    * (fixed-state mergeable histogram) and assign bins by comparing
    * against the broadcast boundaries — narrow, no sort; the window
    * form here is the oracle-replayable contract.
    */
  def equiDepthBins(df: DataFrame, groupCol: String, valueCol: String,
      numBins: Int, tieCols: Seq[String]): DataFrame = {
    val w = Window.partitionBy(groupCol)
      .orderBy(col(valueCol) +: tieCols.map(col): _*)
    df.withColumn("bin", ntile(numBins).over(w))
  }

  def defs: Map[String, QueryDef] = Map(
    // Seeded shuffle of the documents corpus into 8 shards — the
    // oracle replays the md5 order and the prefix-mod shard per row,
    // so a drifted salt, mod base, or tie-break mismatches.
    "q_shuffle_shard" -> QueryDef(
      (s, dir) => shuffleShard(table(s, dir, "documents"), "doc_id", 8)
        .select(col("doc_id"), col("shard"), col("pos"))
        .orderBy("doc_id"),
      """SELECT doc_id, shard, row_number() OVER (
        |    PARTITION BY shard ORDER BY ord, doc_id) AS pos
        |FROM (SELECT doc_id,
        |    md5(CAST(doc_id AS VARCHAR) || '|shard') AS ord,
        |    CAST(CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR) || '|shard'), 1, 8))
        |      AS UINT32) AS BIGINT) % 8 AS shard
        |  FROM documents)
        |ORDER BY doc_id""".stripMargin),

    // Shard integrity manifest: per shard, the row count and an
    // ORDER-FREE content checksum (sum of 32-bit md5 prefixes of each
    // row's canonical `doc_id:text-fingerprint` string — integer sum,
    // so any partitioning/task order yields the same bits). This is
    // the manifest a training job validates shards against after an
    // export: a dropped, duplicated, or bit-flipped row moves count
    // or checksum. One map-side-combined groupBy; 8 rows out at any
    // corpus size.
    "q_shard_manifest" -> QueryDef(
      (s, dir) => {
        // the same shard key as shuffleShard, WITHOUT its position
        // window — a manifest needs membership, not order, and the
        // per-shard sort would be pure waste here
        val shard = (conv(substring(md5(concat(
          col("doc_id").cast("string"), lit("|shard"))), 1, 8), 16, 10)
          .cast("long") % 8).cast("int")
        graft.functions.Functions.spreadScan(table(s, dir, "documents"))
          .select(shard.as("shard"),
            conv(substring(md5(concat(col("doc_id").cast("string"),
              lit(":"), md5(col("text")))), 1, 8), 16, 10)
              .cast("long").as("__h"))
          .groupBy("shard")
          .agg(count(lit(1)).as("n"), sum("__h").as("checksum"))
          .orderBy("shard")
      },
      """SELECT CAST(CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR) || '|shard'), 1, 8))
        |    AS UINT32) AS BIGINT) % 8 AS shard,
        |  count(*) AS n,
        |  CAST(sum(CAST(CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':' || md5(text)), 1, 8))
        |    AS UINT32) AS BIGINT)) AS BIGINT) AS checksum
        |FROM documents GROUP BY 1 ORDER BY shard""".stripMargin),

    // Decile binning of lineitem prices within each return flag,
    // summarized per bin — equal counts (±1) with deterministic
    // boundaries; the oracle replays the exact ntile tie-break.
    "q_bin_equidepth" -> QueryDef(
      (s, dir) => equiDepthBins(table(s, dir, "lineitem"),
        "l_returnflag", "l_extendedprice", 10,
        Seq("l_orderkey", "l_linenumber"))
        .groupBy(col("l_returnflag"), col("bin"))
        .agg(count(lit(1)).as("n"),
          round(min("l_extendedprice"), 2).as("lo"),
          round(max("l_extendedprice"), 2).as("hi"))
        .orderBy("l_returnflag", "bin"),
      """SELECT l_returnflag, bin, count(*) AS n,
        |  round(min(l_extendedprice), 2) AS lo,
        |  round(max(l_extendedprice), 2) AS hi
        |FROM (SELECT l_returnflag, l_extendedprice, ntile(10) OVER (
        |    PARTITION BY l_returnflag
        |    ORDER BY l_extendedprice, l_orderkey, l_linenumber) AS bin
        |  FROM lineitem)
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin)
  )
}
