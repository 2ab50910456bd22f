package graft.streaming

import graft.operators.TextAnalysis
import graft.pipelines.Corpus
import graft.streaming.BatchDirs.{batchPartitions, deleteOlderThan}
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, StreamingQuery, Trigger}

/** Streaming corpus ETL: documents arrive as a stream and leave as
  * training-ready chunk rows — quality gate → EXACT dedup (batch-
  * internal min-id, then against every previously-admitted document's
  * fingerprint) → optional benchmark decontamination ([[DocGate]]:
  * [[BenchmarkGate]] exact copies via a bloom-prefiltered anti-join
  * on the same fingerprint, or [[WinnowGate]] edit-drifted copies
  * via shared winnow fingerprints) → optional per-source BUDGET gate
  * ([[SourceBudgets]]: strict-prefix token spend against persisted
  * per-source counters under `<indexDir>/spent` — requires a `source`
  * column) → optional NEAR-DUP admission
  * (`nearDupJaccard`: the `CorpusStream` band/shingle admission core
  * over a sibling index under `<indexDir>/neardup`, run after every
  * cheaper gate) → sliding-window chunking — with the same
  * replay-safety mechanics as `CorpusStream` (the near-dup sibling):
  *
  *  - every write goes to `<dir>/batch=<id>` with Overwrite, so a
  *    replayed micro-batch rewrites its own partition instead of
  *    double-appending chunks or fingerprints;
  *  - the fingerprint probe anti-joins out the current batch's own
  *    doc_ids, so a crashed attempt's leftovers cannot drop the very
  *    docs that wrote them (doc_id must be unique stream-wide — the
  *    `CorpusStream` contract);
  *  - every `compactEvery` batches the fingerprint partitions fold
  *    (distinct()ed) into the current one and the old directories are
  *    deleted — index files stay O(compactEvery); a crash between fold
  *    and delete re-collapses on replay;
  *  - operator-internal caches are scoped to the batch.
  *
  * State is one (doc_id, fp) row per ADMITTED document — bounded by
  * the corpus, keyed nowhere (the probe is a fp equi-join, and at
  * 100 TB the index would bucket by fp); chunks never re-enter the
  * pipeline.
  */
object CorpusEtlStream {

  /** One micro-batch step — public so the spec (and a backfill job)
    * can drive it with deterministic batch boundaries. Idempotent in
    * `batchId`.
    */
  def prepareBatchStep(batch: DataFrame, batchId: Long, indexDir: String,
      sinkDir: String, cfg: Corpus.Config = Corpus.Config(),
      chunkTokens: Int = 128, stride: Int = 96,
      compactEvery: Int = 8,
      benchmark: Option[DocGate] = None,
      nearDupJaccard: Option[Double] = None,
      budgets: Option[SourceBudgets] = None,
      afterWrite: String => Unit = _ => ()): Unit =
    graft.InternalCaches.scoped {
      val spark = batch.sparkSession
      if (!batch.isEmpty) {
        prepareBatchBody(batch, batchId, indexDir, sinkDir, cfg,
          chunkTokens, stride, compactEvery, benchmark, nearDupJaccard,
          budgets, spark, afterWrite)
      }
    }

  private def prepareBatchBody(batch: DataFrame, batchId: Long,
      indexDir: String, sinkDir: String, cfg: Corpus.Config,
      chunkTokens: Int, stride: Int, compactEvery: Int,
      benchmark: Option[DocGate], nearDupJaccard: Option[Double],
      budgets: Option[SourceBudgets], spark: SparkSession,
      // crash-matrix seam: invoked after each durable publish inside
      // the batch ("spent", "neardup", "chunks", "fps") so a spec can
      // simulate a process death at EVERY boundary by throwing from
      // here — production callers leave it a no-op
      afterWrite: String => Unit = _ => ()): Unit = {
    val fpPath = s"$indexDir/fps"
    val batchDocIds = batch.select("doc_id")
    // ONE filesystem listing per batch decides both the probe and the
    // compaction branch (each listing is a remote LIST on an
    // object-store index)
    val havePrior = batchPartitions(spark, fpPath).nonEmpty
    // quality gate, then batch-internal exact dedup — the fingerprint
    // is computed ONCE and drives the min-id keep directly (running
    // Corpus.exactDedup here would md5-normalize every doc a second
    // time for the same key)
    val gated = Corpus.qualityFilter(batch, cfg)
      .withColumn("__fp", TextAnalysis.fingerprint(col("text")))
    val keepIds = gated.groupBy(col("__fp"))
      .agg(min(col("doc_id")).as("doc_id")).select("doc_id")
    val deduped = gated.join(keepIds, Seq("doc_id"), "left_semi")
    // benchmark decontamination: the exact gate rides the SAME
    // fingerprint column the dedup already computed (zero extra text
    // passes); a winnow gate scores the text instead
    val clean = benchmark.fold(deduped)(_.scrubWithFp(deduped, "__fp"))
    // drop docs whose fingerprint is already ADMITTED — excluding this
    // batch's own ids (the replay shield)
    val survivors =
      if (havePrior) {
        val priorFps = spark.read.parquet(fpPath)
          .select(col("doc_id").as("idx_id"), col("fp").as("__fp"))
          .join(batchDocIds.select(col("doc_id").as("idx_id")),
            Seq("idx_id"), "left_anti")
          .select("__fp").distinct()
        clean.join(priorFps, Seq("__fp"), "left_anti")
      } else clean
    // optional per-source budget gate: runs after the cheap gates (so
    // only docs that could land spend budget) and BEFORE the near-dup
    // stage (so a budget-dropped doc never lands bands that would
    // later shadow a real admission). Strict-prefix semantics shared
    // with BudgetStream/tokenBudgetMix: every doc OFFERED at this
    // stage spends its cost, admitted or not.
    val inBudget = budgets.fold(survivors) { b =>
      val kept = applyBudgetGate(survivors, batchId, s"$indexDir/spent", b,
        compactEvery, spark)
      afterWrite("spent")
      kept
    }
    // optional near-dup stage: the CorpusStream admission core over a
    // sibling band/shingle index — probe the admitted corpus, exact-
    // verify, batch-internal near-dedup, land the survivors' bands.
    // Runs AFTER exact dedup + decontam + the prior-fp drop, so the
    // near-dup index only ever holds docs every cheaper gate admitted.
    // admitNearDups localCheckpoints its result; the no-near-dup path
    // checkpoints here — either way the frame below is materialized.
    val (admitted, ckpt) = nearDupJaccard match {
      case Some(j) =>
        val a = CorpusStream.admitNearDups(
          inBudget.select("doc_id", "text", "__fp"),
          batchDocIds, batchId, s"$indexDir/neardup", j, compactEvery)
        afterWrite("neardup")
        (a, Seq.empty: graft.InternalCaches.Handle)
      case None =>
        graft.InternalCaches.localCheckpointHandle(
          inBudget.select("doc_id", "text", "__fp"))
    }
    graft.InternalCaches.trackRdds(ckpt)
    TextAnalysis.chunkDocs(admitted, "doc_id", "text", chunkTokens, stride)
      .write.mode(SaveMode.Overwrite).parquet(s"$sinkDir/batch=$batchId")
    afterWrite("chunks")
    val newFps = admitted.select(col("doc_id"), col("__fp").as("fp"))
    val compact = compactEvery > 0 && batchId % compactEvery == 0 && havePrior
    if (compact) {
      val priorFps = spark.read.parquet(fpPath).select("doc_id", "fp")
        .join(batchDocIds, Seq("doc_id"), "left_anti")
      val (fold, foldCkpt) = graft.InternalCaches.localCheckpointHandle(
        priorFps.union(newFps).distinct().coalesce(2))
      graft.InternalCaches.trackRdds(foldCkpt)
      fold.write.mode(SaveMode.Overwrite).parquet(s"$fpPath/batch=$batchId")
      deleteOlderThan(spark, fpPath, batchId)
    } else {
      newFps.coalesce(1).write.mode(SaveMode.Overwrite)
        .parquet(s"$fpPath/batch=$batchId")
    }
    afterWrite("fps")
  }

  /** Per-source cost budgets for the optional ingest budget gate. */
  case class SourceBudgets(perSource: Map[String, Long],
      default: Long = 0L)

  /** The budget gate's batch half. Spend state is a tiny parquet of
    * (source, spent, folded) rows under `spentPath/batch=<id>` — the
    * same partition-overwrite replay shield as the fingerprint index
    * (a replayed batch recomputes the identical delta into its own
    * partition). Within the batch, admission replays the
    * tokenBudgetMix contract: per-source md5-rank order, inclusive
    * running cost offset by the prior spend, keep iff ≤ budget; the
    * window is micro-batch-sized, so no bucket decomposition is
    * needed here. Every `compactEvery` batches the delta partitions
    * fold into one (summed per source, `folded=true`) and older
    * directories drop — listing stays O(compactEvery), state is
    * |sources| longs.
    *
    * REPLAY of a compaction batch needs care the fp index doesn't:
    * fps are a membership SET (a fold that still coexists with the
    * dirs it absorbed is harmless), but spend is a SUM. Once a first
    * attempt has folded `batch=N` and deleted the older dirs, a
    * replay that merely excluded `batch=N` would see zero prior
    * spend and re-admit budget-dropped docs. So when `batch=N` holds
    * a fold, prior is reconstructed as `fold − delta` (the delta is
    * deterministic on replay) and the older dirs — absorbed, possibly
    * not yet deleted — are ignored entirely; both the crash-between-
    * fold-and-delete and the crash-after-delete windows replay to the
    * identical admission.
    *
    * Docs a cheaper gate already dropped never reach this stage and
    * spend nothing; a budget-dropped doc RE-OFFERED in a later batch
    * spends again (only landed docs enter the fingerprint index) —
    * offer-time spend is the contract, dedupe-before-offer is the
    * caller's lever.
    */
  private def applyBudgetGate(offered: DataFrame, batchId: Long,
      spentPath: String, budgets: SourceBudgets, compactEvery: Int,
      spark: SparkSession): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // pin the gate input: the delta write and the admitted frame both
    // read it, and without the checkpoint each would re-run the whole
    // upstream gate pipeline
    val (withCost, h) = graft.InternalCaches.localCheckpointHandle(
      offered.withColumn("__cost",
        size(TextAnalysis.tokens(col("text"))).cast("long")))
    graft.InternalCaches.trackRdds(h)
    // delta covers every OFFERED doc (strict prefix), admitted or not
    val delta = withCost.groupBy("source").agg(sum("__cost").as("spent"))
    val havePrior = batchPartitions(spark, spentPath).nonEmpty
    val state = if (havePrior) Some(spark.read.parquet(spentPath)) else None
    // a fold already at batch=N means this is a replay past the
    // compaction point — the state frame is tiny (≤ compactEvery ×
    // |sources| rows), so the probe is a driver-side head(1)
    val replayingFold = state.exists(_
      .filter(col("batch") === batchId && col("folded")).head(1).nonEmpty)
    val prior = (state, replayingFold) match {
      case (Some(s), true) =>
        s.filter(col("batch") === batchId)
          .groupBy("source").agg(sum("spent").as("__fold"))
          .join(delta.withColumnRenamed("spent", "__d"), Seq("source"), "left")
          .select(col("source"),
            (col("__fold") - coalesce(col("__d"), lit(0L))).as("__prior"))
      case (Some(s), false) =>
        s.filter(col("batch") =!= batchId)
          .groupBy("source").agg(sum("spent").as("__prior"))
      case (None, _) => spark.emptyDataFrame
        .withColumn("source", lit("")).withColumn("__prior", lit(0L))
    }
    // pin prior (|sources| rows) BEFORE the writes below: `kept` is
    // consumed after this method overwrites batch=N / deletes the
    // folded-away dirs, so a lazy re-scan would hit missing files
    val (priorPinned, hp) = graft.InternalCaches.localCheckpointHandle(prior)
    graft.InternalCaches.trackRdds(hp)
    val budgetCol = budgets.perSource.toSeq.sortBy(_._1)
      .foldLeft(lit(budgets.default)) { case (acc, (s, b)) =>
        when(col("source") === s, lit(b)).otherwise(acc)
      }
    val w = Window.partitionBy("source")
      .orderBy(md5(col("doc_id").cast("string")), col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val kept = withCost
      .withColumn("__cum", sum("__cost").over(w))
      .join(broadcast(priorPinned), Seq("source"), "left")
      .filter(coalesce(col("__prior"), lit(0L)) + col("__cum") <= budgetCol)
      .drop("__cost", "__cum", "__prior")
    val compact = compactEvery > 0 && batchId % compactEvery == 0 && havePrior
    if (compact) {
      // fold = prior + delta via the SAME replay-aware prior as the
      // admission above, so re-folding on replay is a fixed point
      val fold = priorPinned.select(col("source"), col("__prior").as("spent"))
        .union(delta).groupBy("source").agg(sum("spent").as("spent"))
        .withColumn("folded", lit(true))
      fold.coalesce(1).write.mode(SaveMode.Overwrite)
        .parquet(s"$spentPath/batch=$batchId")
      deleteOlderThan(spark, spentPath, batchId)
    } else {
      delta.withColumn("folded", lit(false)).coalesce(1)
        .write.mode(SaveMode.Overwrite)
        .parquet(s"$spentPath/batch=$batchId")
    }
    kept
  }

  /** Wire the step into a checkpointed AvailableNow/continuous stream. */
  def prepareStream(docs: DataFrame, indexDir: String, sinkDir: String,
      checkpointDir: String, cfg: Corpus.Config = Corpus.Config(),
      chunkTokens: Int = 128, stride: Int = 96, compactEvery: Int = 8,
      benchmark: Option[DocGate] = None,
      nearDupJaccard: Option[Double] = None,
      budgets: Option[SourceBudgets] = None,
      trigger: Trigger = Trigger.AvailableNow()): StreamingQuery =
    docs.writeStream
      .outputMode(OutputMode.Update())
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        prepareBatchStep(batch, batchId, indexDir, sinkDir, cfg,
          chunkTokens, stride, compactEvery, benchmark, nearDupJaccard,
          budgets)
      }
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .start()
}
