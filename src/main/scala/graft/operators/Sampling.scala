package graft.operators

import graft.QueryDef
import graft.sources.Tables.table
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic sampling and split assignment for training-data
  * pipelines. Everything keys off a content hash, never `rand()`:
  * the same row lands in the same split on every run, every engine,
  * and every cluster size — re-ingesting a 100 TB corpus cannot
  * migrate documents between train and test, and a downstream join
  * against yesterday's split assignment is a no-op by construction.
  * Narrow per-row math; no shuffle, no state.
  */
object Sampling {

  /** Uniform-ish fraction in [0,1) from the md5 of a key: the first 8
    * hex digits as a 32-bit integer over 2^32. md5 (not xxhash64) so
    * any engine can reproduce the mapping bit-for-bit.
    */
  def hashFraction(key: Column): Column =
    conv(substring(md5(key.cast("string")), 1, 8), 16, 10)
      .cast("long") / lit(4294967296.0)

  /** Stable split label from a key hash. Fractions are cumulative
    * cutoffs: train < trainFrac ≤ val < trainFrac+valFrac ≤ test.
    */
  def assignSplit(key: Column, trainFrac: Double = 0.8,
      valFrac: Double = 0.1): Column = {
    val f = hashFraction(key)
    when(f < trainFrac, "train")
      .when(f < trainFrac + valFrac, "val")
      .otherwise("test")
  }

  /** Deterministic p-fraction sample by key hash. */
  def hashSample(df: DataFrame, keyCol: String, p: Double): DataFrame =
    df.filter(hashFraction(col(keyCol)) < p)

  /** Deterministic EXACT-k uniform sample: the k rows with the
    * smallest key-md5 — the fixed-size counterpart of [[hashSample]]
    * (an eval panel, a labeling batch, k-shot exemplars). One
    * TakeOrderedAndProject job: per-partition top-k, driver merge of
    * k·P rows — no count() pre-pass, no full sort, no dense-id
    * assumption; any engine replays it as ORDER BY md5(key) LIMIT k.
    * (The same md5-rank trick seeds the ANN coarse quantizers.)
    */
  def hashSampleK(df: DataFrame, keyCol: String, k: Int): DataFrame =
    df.withColumn("__rk", md5(col(keyCol).cast("string")))
      .orderBy("__rk").limit(k).drop("__rk")

  /** Deterministic EXACT-k sample PER GROUP (a balanced eval panel:
    * k docs from every source/language regardless of how lopsided the
    * corpus is). One shuffle on the group column, per-partition sort,
    * row_number ≤ k — the same WindowGroupLimit pushdown as
    * `q_topk_group` keeps each partition's sort bounded at k rows per
    * group, so group cardinality (not corpus size) drives the cost.
    */
  def stratifiedSampleK(df: DataFrame, keyCol: String, groupCol: String,
      k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(groupCol)
      .orderBy(md5(col(keyCol).cast("string")), col(keyCol))
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= k).drop("__rn")
  }

  /** Deterministic weighted exact-k sample: rank by `hash/weight` so a
    * row with twice the weight is (about) twice as likely to make the
    * cut — the data-mixing counterpart of [[hashSampleK]] for "prefer
    * long/curated documents" selection. The rank key is computed in
    * INTEGER space, `(h * 1e6) div max(w,1)` with h the 32-bit md5
    * prefix: A-ES exponential keys (`-ln(u)/w`) would give exact
    * inclusion probabilities, but transcendental math is not
    * bit-portable across engines — the integer formulation trades
    * exactness of the inclusion distribution for a rank every engine
    * reproduces bit-for-bit (ties broken by key). Same
    * TakeOrderedAndProject shape as [[hashSampleK]]: per-partition
    * top-k, k·P driver merge, no full sort.
    */
  def weightedSampleK(df: DataFrame, keyCol: String, weightCol: String,
      k: Int): DataFrame =
    df.withColumn("__h",
        conv(substring(md5(col(keyCol).cast("string")), 1, 8), 16, 10)
          .cast("long"))
      .withColumn("__wk",
        expr(s"(__h * 1000000) div greatest($weightCol, 1)"))
      .orderBy(col("__wk"), col(keyCol)).limit(k)
      .drop("__h", "__wk")

  /** Weighted mixture sampling — the data-mixing primitive of a
    * training pipeline: each source keeps a deterministic
    * hash-fraction of its rows at that source's target rate
    * (up-weighting curated sources, down-weighting crawl). Same
    * hash-cutoff mechanics as `hashSample`, so re-running with a
    * RAISED rate strictly grows the kept set (the previous sample is
    * a prefix by construction) — a rate change never reshuffles which
    * rows survive, only how many. Narrow per-row math, no shuffle.
    *
    * The cutoff hashes `key|salt`, NOT the bare key: `assignSplit` and
    * `hashSample` cut on the bare-key hash, so an unsalted mixture at
    * rates ≤ 0.9 would leave the post-mix corpus with an exactly-empty
    * test split (every survivor has bare-hash < 0.9 by construction).
    * The salt decorrelates the two cutoffs; change it only in lockstep
    * with any external replay.
    */
  def mixtureSample(df: DataFrame, keyCol: String, sourceCol: String,
      rates: Map[String, Double], defaultRate: Double = 0.0,
      salt: String = "mix"): DataFrame = {
    val rate = rates.toSeq.sortBy(_._1).foldLeft(lit(defaultRate)) {
      case (acc, (s, r)) => when(col(sourceCol) === s, lit(r)).otherwise(acc)
    }
    df.filter(hashFraction(concat(col(keyCol).cast("string"), lit("|" + salt))) < rate)
  }

  /** Corpus mixing to a per-source COST budget — the token-budget
    * counterpart of [[mixtureSample]]'s rate cut: each source
    * contributes its docs in deterministic md5 order until that
    * source's budget is exhausted ("give me 2B tokens of crawl, 500M
    * of curated"). Keeps exactly the maximal prefix whose inclusive
    * running cost fits (the first overflowing doc and everything after
    * it drop — the cumulative sum is over ALL docs in rank order, so
    * a later small doc can never jump a dropped big one; re-running
    * with a RAISED budget strictly grows the kept set).
    *
    * Scale shape: a naive per-source window is ONE unsplittable
    * partition per source (a crawl source at 100 TB = one task). The
    * running cost instead computes as a two-level prefix sum: the md5
    * rank key's leading 2 hex chars form 256 buckets that are
    * ORDER-ALIGNED with the rank itself (a prefix of the sort key), so
    * per-(source, bucket) local window sums + a tiny
    * (sources × 256)-row bucket-offset window + a broadcast join
    * reassemble the exact global running sum with bounded partitions.
    * Bucket totals re-aggregate from the narrow scan (map-side
    * partial) rather than self-joining the windowed frame — the
    * second scan reads 3 pruned columns; the alternative shuffles the
    * full corpus twice.
    */
  def tokenBudgetMix(df: DataFrame, keyCol: String, sourceCol: String,
      costCol: String, budgets: Map[String, Long],
      defaultBudget: Long = 0L): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val ranked = df
      .withColumn("__rk", md5(col(keyCol).cast("string")))
      .withColumn("__b", substring(col("__rk"), 1, 2))
      .withColumn("__c", col(costCol).cast("long"))
    val local = Window.partitionBy(sourceCol, "__b")
      .orderBy(col("__rk"), col(keyCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val offsets = ranked
      .groupBy(sourceCol, "__b").agg(sum("__c").as("__bt"))
      .withColumn("__off",
        coalesce(sum("__bt").over(Window.partitionBy(sourceCol)
          .orderBy("__b").rowsBetween(Window.unboundedPreceding, -1)),
          lit(0L)))
      .select(col(sourceCol), col("__b"), col("__off"))
    val budget = budgets.toSeq.sortBy(_._1).foldLeft(lit(defaultBudget)) {
      case (acc, (s, b)) => when(col(sourceCol) === s, lit(b)).otherwise(acc)
    }
    ranked
      .withColumn("__lc", sum("__c").over(local))
      .join(broadcast(offsets), Seq(sourceCol, "__b"))
      .withColumn("cum_cost", col("__off") + col("__lc"))
      .filter(col("cum_cost") <= budget)
      .drop("__rk", "__b", "__c", "__lc", "__off")
  }

  def defs: Map[String, QueryDef] = Map(
    // Mixture sampling over the documents corpus: per-source target
    // rates (src0 kept whole, src1 half, src2 a quarter, the rest at
    // a 10% floor), keyed by the doc_id hash — the oracle replays the
    // exact cutoff per row, so a drifted rate or hash mismatches.
    "q_mixture" -> QueryDef(
      (s, dir) => mixtureSample(table(s, dir, "documents"),
        "doc_id", "source",
        Map("src0" -> 1.0, "src1" -> 0.5, "src2" -> 0.25),
        defaultRate = 0.1)
        .select(col("doc_id"), col("source"))
        .orderBy("doc_id"),
      """SELECT doc_id, source FROM (
        |  SELECT doc_id, source,
        |    CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR) || '|mix'), 1, 8))
        |      AS UINT32) / 4294967296.0 AS frac
        |  FROM documents)
        |WHERE frac < CASE source
        |  WHEN 'src0' THEN 1.0 WHEN 'src1' THEN 0.5
        |  WHEN 'src2' THEN 0.25 ELSE 0.1 END
        |ORDER BY doc_id""".stripMargin),
    "q_split_assign" -> QueryDef(
      (s, dir) => table(s, dir, "documents")
        .select(col("doc_id"), assignSplit(col("doc_id")).as("split"))
        .orderBy("doc_id"),
      Some("""SELECT doc_id, CASE
        |  WHEN frac < 0.8 THEN 'train'
        |  WHEN frac < 0.9 THEN 'val'
        |  ELSE 'test' END AS split
        |FROM (SELECT doc_id,
        |  CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS UINT32)
        |    / 4294967296.0 AS frac
        |  FROM documents)
        |ORDER BY doc_id""".stripMargin)),

    // Exact-k deterministic sample (k=50 of the documents table) —
    // the oracle replays the md5 ranking, so the SAME 50 docs must
    // surface in any engine; the plan is one TakeOrderedAndProject
    // (plan-asserted in SamplingRangeSpec).
    "q_sample_k" -> QueryDef(
      (s, dir) => hashSampleK(table(s, dir, "documents"), "doc_id", 50)
        .select(col("doc_id"), col("source"))
        .orderBy("doc_id"),
      """SELECT doc_id, source FROM (
        |  SELECT doc_id, source FROM documents
        |  ORDER BY md5(CAST(doc_id AS VARCHAR)) LIMIT 50)
        |ORDER BY doc_id""".stripMargin),

    // Balanced panel: exactly 10 docs per source, chosen by the same
    // md5 rank — the oracle replays the per-group row_number, so a
    // drifted rank order or an off-by-one in the cut mismatches.
    "q_sample_stratified" -> QueryDef(
      (s, dir) => stratifiedSampleK(table(s, dir, "documents"),
        "doc_id", "source", 10)
        .select(col("doc_id"), col("source"))
        .orderBy("source", "doc_id"),
      """SELECT doc_id, source FROM (
        |  SELECT doc_id, source, row_number() OVER (
        |    PARTITION BY source
        |    ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rn
        |  FROM documents)
        |WHERE rn <= 10 ORDER BY source, doc_id""".stripMargin),

    // Token-budget corpus mix: src0's budget keeps the whole source,
    // src1's truncates mid-source, everyone else cuts at the 2000-char
    // floor. The oracle replays the per-source running sum in md5 rank
    // order as ONE window (the two-level bucket decomposition must be
    // exactly invisible in the result — that IS the contract), so a
    // bucket-boundary off-by-one or a drifted rank order mismatches.
    "q_corpus_mix" -> QueryDef(
      (s, dir) => tokenBudgetMix(table(s, dir, "documents"),
        "doc_id", "source", "n_chars",
        Map("src0" -> 100000L, "src1" -> 4000L), defaultBudget = 2000L)
        .select(col("doc_id"), col("source"), col("n_chars"),
          col("cum_cost"))
        .orderBy("doc_id"),
      """SELECT doc_id, source, n_chars, CAST(cum_cost AS BIGINT) AS cum_cost
        |FROM (
        |  SELECT doc_id, source, n_chars,
        |    sum(n_chars) OVER (PARTITION BY source
        |      ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
        |      ROWS UNBOUNDED PRECEDING) AS cum_cost
        |  FROM documents)
        |WHERE cum_cost <= CASE source
        |  WHEN 'src0' THEN 100000 WHEN 'src1' THEN 4000 ELSE 2000 END
        |ORDER BY doc_id""".stripMargin),

    // Length-weighted 50-doc sample: long documents preferentially
    // survive. The oracle recomputes the integer rank key per row —
    // hash prefix, scale, integer division — so any drift in the
    // weight column, the scale factor, or the tie-break mismatches.
    "q_sample_weighted" -> QueryDef(
      (s, dir) => weightedSampleK(table(s, dir, "documents"),
        "doc_id", "n_chars", 50)
        .select(col("doc_id"), col("source"), col("n_chars"))
        .orderBy("doc_id"),
      """SELECT doc_id, source, n_chars FROM (
        |  SELECT doc_id, source, n_chars FROM documents
        |  ORDER BY (CAST(CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))
        |      AS UINT32) AS BIGINT) * 1000000) // greatest(n_chars, 1),
        |    doc_id
        |  LIMIT 50)
        |ORDER BY doc_id""".stripMargin)
  )
}
