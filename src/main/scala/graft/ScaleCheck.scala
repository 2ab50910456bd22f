package graft

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Scale checkpoint (VERDICT r6 #3): run the heaviest dedup/ANN
  * queries at 1× and `factor`× the source corpus and print the
  * time ratios — the measured data point behind SCALING.md's
  * design-scales claims. A near-linear ratio (≈ factor for linear
  * operators) confirms the plan shapes hold as data grows; a
  * superlinear one flags the query for profiling.
  *
  * The scaled corpus is `factor` disjoint replicas of the source:
  * doc_ids/vec_ids offset per replica, every token prefixed with the
  * replica tag so no shingle/gram matches across replicas — per-shard
  * duplicate structure is preserved, volume multiplies, which is
  * exactly how a sharded corpus grows. Embeddings replicate with
  * offset ids (dot-product cost is content-independent). 1× and N×
  * runs interleave per query so host-contention drift hits both
  * sides of each ratio equally.
  */
object ScaleCheck {

  val DefaultQueries: Seq[String] = Seq(
    "q_dedup_clusters", "q_dedup_keep_best", "q_dedup_simhash",
    "q_dedup_minhash", "q_ngram_jaccard", "q_dedup_editdist",
    "q_dedup_editdist_lsh", "q_ann_pq", "q_dup_passages",
    // round 8: the state-∝ / churn-∝ claims get their own ratios —
    // these read orders/lineitem, so buildScaled replicates those too
    "q_incr_agg", "q_cdc_upsert", "q_snapshot_diff",
    // round 8: the events family (replicated as disjoint user
    // populations) and the new dedup flavors
    "q_funnel", "q_sessionize_batch", "q_asof_join", "q_range_attrib",
    "q_window_running", "q_cohort_retention",
    "q_semdedup", "q_dedup_winnow",
    // round 8: the data-selection family
    "q_dsir_weights", "q_ppl_buckets", "q_mixture_alpha",
    "q_select_corpus", "q_curriculum",
    // round 10: artifact-backed since ensureLmModel — warm/cold split
    // (its family mates above get the same treatment via WarmSecondRun)
    "q_lm_score",
    // round 8 (late): retrieval, graph analytics, collocations, layout
    "q_hard_negatives", "q_mmr_select", "q_recall_at_k",
    "q_bitext_margin", "q_bm25", "q_rrf_fuse", "q_pagerank",
    "q_triangle_count", "q_kcore", "q_pmi_pairs", "q_phrase_hits",
    "q_zorder_layout", "q_dedup_incremental", "q_containment",
    "q_join_estimate", "q_hard_negatives_ivf",
    // round 8 (close): reports, contracts, graph components, native
    // sessionization, the dedup-index recall metric
    "q_quality_calibration", "q_corpus_map", "q_shard_manifest",
    "q_psi_drift", "q_sessionize_window", "q_components",
    "q_langid_eval", "q_minhash_recall", "q_corpus_expectations",
    "q_embedding_expectations", "q_split_leakage", "q_distinct_ngrams",
    // round 10: the third WarmSecondRun member actually runs by
    // default now (it was dead — only reachable via explicit args)
    "q_dsir_weights_indexed",
    // round 11: incremental-IVF maintenance (cold = append-built
    // index + probe, warm = probe-only; the append-vs-rebuild cost
    // asymmetry itself is IvfMaintenanceCheck's row)
    "q_ann_ivf_incremental", "q_ann_ivf_delete", "q_ann_ivf_upsert",
    "q_ann_pq_delete", "q_ann_pq_incremental", "q_ann_pq_upsert",
    // round 11 (late): embedding-space decontamination — broadcast
    // eval panel, map-side tau filter, churn-sized argmax shuffle
    "q_decontaminate_semantic",
    // round 11 (late): index-health monitors over the maintained index
    "q_index_stats", "q_recall_churn", "q_recall_pq",
    // round 12: lakehouse maintenance — copy-on-write merge (rewrite ∝
    // churn-touched files), retractable rollup (fold ∝ churn), bloom
    // point lookup (opens ~1 file however many the snapshot holds)
    "q_merge_upsert", "q_incr_agg_cdc", "q_read_bloom",
    "q_optimize_cluster",
    // round 13: the string/UUID-keyed merge (guid derives from the
    // replicated orderkey, so churn structure survives scaling) and
    // the composed maintenance loop
    "q_merge_upsert_str", "q_maintain_cdc", "q_read_pruned_str",
    "q_merge_scd2",
    // round 13 (late): retractable extremes/distinct (fold ∝ churned
    // groups' rows / pair-state) and the manifest-diff change feed
    // (priced by the diffed files)
    "q_incr_agg_minmax", "q_incr_agg_distinct", "q_change_feed",
    "q_optimize_zorder", "q_merge_deferred", "q_rollup_sync",
    // round 14: the string-dim z-order (table-sized by design, like
    // its integral twin), the linear-counting sketch distinct (state
    // bounded at m per group), and incremental small-file compaction
    // (priced by the small-file debt, never the table)
    "q_optimize_zorder_str", "q_incr_agg_distinct_approx",
    "q_optimize_small", "q_distinct_sync")

  def buildScaled(spark: SparkSession, srcDir: String, outDir: String,
      factor: Int): Unit = {
    val docs = sources.Tables.table(spark, srcDir, "documents")
    val emb = sources.Tables.table(spark, srcDir, "embeddings")
    val orders = sources.Tables.table(spark, srcDir, "orders")
    val li = sources.Tables.table(spark, srcDir, "lineitem")
    val ev = sources.Tables.table(spark, srcDir, "events")
    // the replica offset must clear every replicated key or replica
    // ranges silently overlap (keys stop growing ×N and the printed
    // ratios measure a different workload); grow by powers of ten so
    // offset % {10, 100} == 0 keeps the %-derived CDC feed structure
    val offset = {
      val mx = Seq(
        docs.agg(max("doc_id")).head().getLong(0),
        emb.agg(max("vec_id")).head().getLong(0),
        orders.agg(max("o_orderkey")).head().getLong(0),
        li.agg(max("l_orderkey")).head().getLong(0),
        ev.agg(greatest(max("event_id"), max("user_id"))).head().getLong(0)
      ).max
      var o = 100000000L
      while (o <= mx) o *= 10
      o
    }
    val scaledDocs = (0 until factor).map { r =>
      docs.select(
        (col("doc_id") + lit(r * offset)).as("doc_id"),
        // tag every token: replicas share no shingles, so dup
        // structure stays per-shard instead of exploding 10-fold
        concat_ws(" ", transform(split(trim(col("text")), "\\s+"),
          t => concat(lit(s"r$r"), t))).as("text"),
        col("lang"), col("source"), col("n_chars"))
    }.reduce(_.unionByName(_))
    val scaledEmb = (0 until factor).map { r =>
      emb.select((col("vec_id") + lit(r * offset)).as("vec_id"),
        col("embedding"), col("label"))
    }.reduce(_.unionByName(_))
    scaledDocs.repartition(spark.sparkContext.defaultParallelism)
      .write.mode(SaveMode.Overwrite).parquet(s"$outDir/documents.parquet")
    scaledEmb.repartition(8)
      .write.mode(SaveMode.Overwrite).parquet(s"$outDir/embeddings.parquet")
    // orders/lineitem replicate with offset orderkeys — FK structure
    // (l_orderkey→o_orderkey) and the %-based feed/churn derivations
    // survive because offset % {10,100} == 0, so every replica carries
    // the same per-shard update/delete mix the 1× leg has. That is the
    // honest growth model for q_cdc_upsert (keys ×N), q_snapshot_diff
    // (churn ×N) and q_incr_agg (increment volume ×N, state fixed at
    // |group keys|).
    // ENTITY keys (custkey, partkey, suppkey) offset per replica too:
    // the graph queries project lineitem/orders onto those entities,
    // and without the offset N replicas would pile N× the edges onto
    // the SAME nodes — a densifying graph (triangles ∝ N³ on shared
    // vertices), not a growing one. Disjoint entity populations per
    // replica is the honest growth model (a bigger catalog, more
    // customers), and none of the CDC/incremental scale queries read
    // these columns (they key on o_orderkey and its % feeds).
    (0 until factor).map(r => orders
        .withColumn("o_orderkey", col("o_orderkey") + lit(r * offset))
        .withColumn("o_custkey", col("o_custkey") + lit(r * offset)))
      .reduce(_.unionByName(_))
      .repartition(spark.sparkContext.defaultParallelism)
      .write.mode(SaveMode.Overwrite).parquet(s"$outDir/orders.parquet")
    (0 until factor).map(r => li
        .withColumn("l_orderkey", col("l_orderkey") + lit(r * offset))
        .withColumn("l_partkey", col("l_partkey") + lit(r * offset))
        .withColumn("l_suppkey", col("l_suppkey") + lit(r * offset)))
      .reduce(_.unionByName(_))
      .repartition(spark.sparkContext.defaultParallelism)
      .write.mode(SaveMode.Overwrite).parquet(s"$outDir/lineitem.parquet")
    // events replicate with offset user_id/event_id and UNSHIFTED ts:
    // each replica is a disjoint user population living on the same
    // timeline, so per-user event density, session gaps, and funnel
    // stage mixes are preserved while user count (the shuffle key
    // cardinality of the whole family) grows ×N — how an event stream
    // actually scales. ts must not shift: windows/sessions/as-of are
    // time-local, and stretching time would thin the windows instead
    // of multiplying them.
    (0 until factor).map(r => ev
        .withColumn("event_id", col("event_id") + lit(r * offset))
        .withColumn("user_id", col("user_id") + lit(r * offset)))
      .reduce(_.unionByName(_))
      .repartition(spark.sparkContext.defaultParallelism)
      .write.mode(SaveMode.Overwrite).parquet(s"$outDir/events.parquet")
  }

  private def timeOne(spark: SparkSession, name: String, dir: String): Double = {
    val t0 = System.nanoTime()
    SparkEntry.queries(name)(spark, dir)
      .write.mode(SaveMode.Overwrite).format("noop").save()
    val sec = (System.nanoTime() - t0) / 1e9
    InternalCaches.drain()
    spark.catalog.clearCache()
    spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
    sec
  }

  def main(args: Array[String]): Unit = {
    val srcDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val factor = args.drop(1).headOption.map(_.toInt).getOrElse(10)
    val queries = if (args.length > 2) args.drop(2).toSeq else DefaultQueries
    val spark = GraftSession.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val scaledDir = java.nio.file.Files
      .createTempDirectory("graft_scale").toString
    println(s"[scale] building ${factor}x corpus at $scaledDir")
    buildScaled(spark, srcDir, scaledDir, factor)
    // warm the JIT/codegen paths of every SELECTED query (untimed, at
    // the small SF): without this the 1× leg absorbs first-run codegen
    // and the printed ratio flatters the 10× side
    val warmDir = "/root/testdata/sf0.001"
    if (new java.io.File(warmDir).isDirectory) queries.foreach { name =>
      try SparkEntry.queries(name)(spark, warmDir)
        .write.mode(SaveMode.Overwrite).format("noop").save()
      catch { case _: Throwable => () }
    }
    SparkEntry.queries("q_max_scalar")(spark, srcDir).count()
    queries.foreach { name =>
      if (WarmSecondRun(name)) {
        // artifact-backed queries: the cold number includes the
        // one-time index build, so evict the content-keyed cache
        // first (a leftover artifact from a previous run would make
        // "cold" silently warm), then time a SECOND run against the
        // now-published artifact — the steady-state cost the
        // "sublinear once built" claim is actually about. Evict ONLY
        // this query's own artifact kinds: a full vacuum(Set.empty)
        // would also delete artifacts earlier queries built and later
        // queries in this same pass reuse (q_containment reads the
        // shingle memo) — those would silently pay rebuilds inside
        // their single timed run — plus any concurrent process's dirs.
        val kinds = ArtifactKinds(name)
        sources.DerivedCache.vacuumKinds(spark, kinds)
        val c1 = timeOne(spark, name, srcDir)
        val w1 = timeOne(spark, name, srcDir)
        sources.DerivedCache.vacuumKinds(spark, kinds)
        val cN = timeOne(spark, name, scaledDir)
        val wN = timeOne(spark, name, scaledDir)
        println(f"[scale] $name%-22s 1x=$c1%7.2fs ${factor}x=$cN%7.2fs " +
          f"ratio=${cN / c1}%5.2f (cold)")
        println(f"[scale] $name%-22s 1x=$w1%7.2fs ${factor}x=$wN%7.2fs " +
          f"ratio=${wN / w1}%5.2f (warm)")
      } else {
        val t1 = timeOne(spark, name, srcDir)
        val tN = timeOne(spark, name, scaledDir)
        println(f"[scale] $name%-22s 1x=$t1%7.2fs ${factor}x=$tN%7.2fs " +
          f"ratio=${tN / t1}%5.2f")
      }
    }
    // the scaled corpus is gigabytes at high factors: reclaim it (a
    // session that ran several checks used to strand one per run)
    org.apache.commons.io.FileUtils.deleteDirectory(
      new java.io.File(scaledDir))
  }

  /** Queries whose 10× cold ratio is dominated by a one-time
    * DerivedCache artifact build — each gets a cold AND a warm row.
    */
  val WarmSecondRun: Set[String] =
    Set("q_dedup_incremental", "q_minhash_recall", "q_dsir_weights_indexed",
      // round 10: the bigram-LM family rides the ensureLmModel
      // artifact, so its cold number now includes the one-time fit
      "q_lm_score", "q_ppl_buckets", "q_curriculum",
      // round 11: the incremental indexes (shared kmeans-cents
      // quantizer deliberately NOT evicted — it belongs to the
      // cross-query family, same as postings)
      "q_ann_ivf_incremental", "q_ann_ivf_delete", "q_ann_ivf_upsert",
      "q_ann_pq_delete", "q_ann_pq_incremental", "q_ann_pq_upsert",
      "q_index_stats", "q_recall_churn", "q_recall_pq")

  /** The DerivedCache kinds each WarmSecondRun query builds — the
    * scope of its pre-cold eviction. Queries sharing a kind (the
    * shingle/band memos) unavoidably rebuild after the other's cold
    * leg; kinds NOT listed here (postings, trade-adjacency, index-pq,
    * clusters, dsir-model for the others …) survive untouched.
    */
  val ArtifactKinds: Map[String, Set[String]] = Map(
    "q_dedup_incremental" -> Set("shingles", "bands"),
    "q_minhash_recall" -> Set("shingles", "bands"),
    "q_dsir_weights_indexed" -> Set("dsir-model"),
    "q_lm_score" -> Set("bigram-lm"),
    "q_ppl_buckets" -> Set("bigram-lm"),
    "q_curriculum" -> Set("bigram-lm"),
    "q_ann_ivf_incremental" -> Set("index-ivf-inc"),
    "q_ann_ivf_delete" -> Set("index-ivf-del"),
    "q_ann_ivf_upsert" -> Set("index-ivf-ups"),
    "q_ann_pq_delete" -> Set("index-pq-del"),
    "q_ann_pq_incremental" -> Set("index-pq-inc"),
    "q_ann_pq_upsert" -> Set("index-pq-ups"),
    "q_index_stats" -> Set("index-ivf-inc"),
    "q_recall_churn" -> Set("index-ivf-ups"),
    "q_recall_pq" -> Set("index-pq"))
}

/** Incremental-IVF maintenance cost measurement (round 11): the
  * design claim behind `q_ann_ivf_incremental`/`q_ann_ivf_delete` is
  * that an APPEND costs ∝ its batch regardless of index size (one
  * map-only assign pass over the new vectors), while REBUILD and
  * COMPACTION cost ∝ the whole corpus — that asymmetry is the entire
  * reason a 100 TB index absorbs increments instead of rebuilding per
  * ingest. Measures all three ops through the incremental API at 1×
  * and `factor`× disjoint id-offset replicas, with the SAME
  * fixed-size increment batch appended to both indexes: a flat append
  * row across the scales is the claim, ≈factor rows for
  * build/compact are the expected linear costs. Fresh index dir per
  * rep; legs interleave so host drift prices every cell equally.
  */
object IvfMaintenanceCheck {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val factor = args.drop(1).headOption.map(_.toInt).getOrElse(8)
    val reps = args.drop(2).headOption.map(_.toInt).getOrElse(3)
    // 4th arg "pq" measures the same lifecycle on the compressed-code
    // layout (appendPqIncrement / compactPqIncremental)
    val layout = args.drop(3).headOption.getOrElse("ivf")
    val spark = GraftSession.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val e1 = sources.Tables.table(spark, dir, "embeddings")
    val mx = e1.agg(max("vec_id")).head().getLong(0)
    var offset = 100000000L
    while (offset <= mx) offset *= 10
    val tmp = java.nio.file.Files.createTempDirectory("graft_ivfmaint").toString
    (0 until factor).map(r => e1.select(
        (col("vec_id") + lit(r * offset)).as("vec_id"), col("embedding")))
      .reduce(_.unionByName(_))
      .repartition(spark.sparkContext.defaultParallelism)
      .write.mode(SaveMode.Overwrite).parquet(s"$tmp/embN.parquet")
    val eN = spark.read.parquet(s"$tmp/embN.parquet")
    // the fixed increment: 1/8 of the 1× corpus, ids past every replica
    val inc = e1.filter(pmod(col("vec_id"), lit(8)) === 0)
      .select((col("vec_id") + lit(factor * offset)).as("vec_id"),
        col("embedding"))
    val cents = operators.Similarity.ensureKmeansQuantizer(spark, dir)
    def time(body: => Unit): Double = {
      val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9
    }
    def cycle(corpus: org.apache.spark.sql.DataFrame): (Double, Double, Double) = {
      val idx = java.nio.file.Files.createTempDirectory("graft_ivfidx").toString
      val (b, a, c) =
        if (layout == "pq") (
          time(operators.Similarity
            .appendPqIncrement(spark, idx, corpus, cents, 0L)),
          time(operators.Similarity
            .appendPqIncrement(spark, idx, inc, cents, 1L)),
          time(operators.Similarity.compactPqIncremental(spark, idx)))
        else (
          time(operators.Similarity
            .appendIvfIncrement(spark, idx, corpus, cents, 0L)),
          time(operators.Similarity
            .appendIvfIncrement(spark, idx, inc, cents, 1L)),
          time(operators.Similarity.compactIvfIncremental(spark, idx)))
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(idx))
      (b, a, c)
    }
    cycle(e1.limit(256)) // JIT/codegen warm, untimed
    val cells = scala.collection.mutable.Map[(String, String),
      List[Double]]().withDefaultValue(Nil)
    (1 to reps).foreach { _ =>
      val (b1, a1, c1) = cycle(e1)
      val (bN, aN, cN) = cycle(eN)
      cells(("build", "1x")) ::= b1; cells(("build", s"${factor}x")) ::= bN
      cells(("append", "1x")) ::= a1; cells(("append", s"${factor}x")) ::= aN
      cells(("compact", "1x")) ::= c1; cells(("compact", s"${factor}x")) ::= cN
    }
    for (op <- Seq("build", "append", "compact")) {
      val x1 = cells((op, "1x")).min; val xN = cells((op, s"${factor}x")).min
      println(f"[ivfmaint:$layout] $op%-8s 1x=$x1%6.2fs ${factor}x=$xN%6.2fs " +
        f"ratio=${xN / x1}%5.2f")
    }
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(tmp))
  }
}

/** Checkpoint-cadence measurement for q_kcore, the PageRankTune
  * discipline applied to the peel loop: every-round checkpointing
  * bounds lineage but costs one materialization job per peel; a
  * 2-round gap halves the jobs at the price of one 3²-way subtree
  * duplication per segment (each round references the previous edge
  * set three times) and HALVES the fixpoint-detection granularity
  * (converged is only checkable at a checkpoint). Cold/warm legs as
  * in PageRankTune (the coorder-edges artifact).
  */
object KCoreTune {
  private def run(spark: SparkSession, dir: String, every: Int): Double = {
    val t0 = System.nanoTime()
    operators.Graph.kCore(operators.Graph.memoCoOrderEdges(spark, dir),
        k = 18, rounds = 8, checkpointEvery = every)
      .write.mode(SaveMode.Overwrite).format("noop").save()
    val sec = (System.nanoTime() - t0) / 1e9
    InternalCaches.drain()
    spark.catalog.clearCache()
    spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
    sec
  }

  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val reps = args.drop(1).headOption.map(_.toInt).getOrElse(3)
    val spark = GraftSession.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    run(spark, "/root/testdata/sf0.001", 1) // JIT warm, untimed
    val cells = scala.collection.mutable.Map[(Int, String),
      List[Double]]().withDefaultValue(Nil)
    (1 to reps).foreach { _ =>
      Seq(1, 2).foreach { every =>
        sources.DerivedCache.vacuumKinds(spark, Set("coorder-edges"))
        cells((every, "cold")) ::= run(spark, dir, every)
        cells((every, "warm")) ::= run(spark, dir, every)
      }
    }
    for (every <- Seq(1, 2); leg <- Seq("cold", "warm")) {
      val xs = cells((every, leg))
      println(f"[kctune] every=$every $leg%-4s best=${xs.min}%6.2fs " +
        f"all=${xs.sorted.map(x => f"$x%.2f").mkString(",")}")
    }
  }
}

/** Decode-throughput measurement for the multimodal operators: the
  * scale question for image/audio at 100 TB is per-payload codec cost
  * (the pipelines are mapPartitions — no shuffle, no driver state, so
  * wall time is payloads × per-payload cost ÷ cores, and the measured
  * µs/payload IS the capacity-planning number). Renders `n` and
  * `10·n` deterministic PNGs/WAVs executor-side (ids spread across
  * the fixture pattern space), then times decode→feature end-to-end
  * (image: ImageIO → luma → aHash; audio: WAV → integer acoustics).
  * Linear ratio ≈ 10 is EXPECTED here, unlike the query harness —
  * per-payload work has no sublinear term once overhead amortizes.
  */
object MediaScaleCheck {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toInt).getOrElse(2000)
    val spark = GraftSession.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    def corpus(count: Int, wav: Boolean) =
      spark.range(count).select(org.apache.spark.sql.functions.col("id"))
        .as[Long]
        .repartition(spark.sparkContext.defaultParallelism)
        .mapPartitions(_.map(id => (id,
          if (wav) operators.Multimodal.renderFixtureWav(id)
          else operators.Multimodal.renderFixturePng(id))))
        .toDF("doc_id", "payload")
    def time(body: => Unit): Double = {
      val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9
    }
    def imgRun(count: Int): Double = time {
      operators.Multimodal.aHash64(operators.Multimodal.decodeImageBatch(
          corpus(count, wav = false), "doc_id", "payload"))
        .toDF().write.mode(SaveMode.Overwrite).format("noop").save()
    }
    def audRun(count: Int): Double = time {
      operators.Multimodal.audioFeatures(operators.Multimodal.decodeAudioBatch(
          corpus(count, wav = true), "doc_id", "payload"))
        .toDF().write.mode(SaveMode.Overwrite).format("noop").save()
    }
    imgRun(256); audRun(256) // JIT/codegen warm, untimed
    val i1 = imgRun(n); val i10 = imgRun(10 * n)
    val a1 = audRun(n); val a10 = audRun(10 * n)
    println(f"[media] image 1x($n)=$i1%6.2fs 10x=${i10}%6.2fs " +
      f"ratio=${i10 / i1}%5.2f  us/img=${i10 * 1e6 / (10 * n)}%7.1f")
    println(f"[media] audio 1x($n)=$a1%6.2fs 10x=${a10}%6.2fs " +
      f"ratio=${a10 / a1}%5.2f  us/clip=${a10 * 1e6 / (10 * n)}%7.1f")
  }
}

/** Checkpoint-cadence measurement for q_pagerank (VERDICT r9 #2): the
  * in-code cadence claim ("every-other ≈ every-round within noise")
  * was contradicted by the r9 bench (9.26 s vs the claimed ~4 s), so
  * measure instead of assert. Times checkpointEvery ∈ {1, 2} × {cold,
  * warm trade-graph artifact} at the given SF, best-of-`reps` per
  * cell, interleaved so host drift hits every cell equally. The
  * winning cadence gets pinned in the q_pagerank QueryDef with these
  * numbers in the comment.
  */
object PageRankTune {
  private val GraphKinds = Set("trade-adjacency", "trade-nodes", "trade-edges")

  private def run(spark: SparkSession, dir: String, every: Int): Double = {
    val t0 = System.nanoTime()
    val (adj, nodes) = operators.Graph.memoTradeGraph(spark, dir)
    operators.Graph.pageRankPrepared(adj, nodes, iters = 10,
      checkpointEvery = every)
      .write.mode(SaveMode.Overwrite).format("noop").save()
    val sec = (System.nanoTime() - t0) / 1e9
    InternalCaches.drain()
    spark.catalog.clearCache()
    spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
    sec
  }

  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val reps = args.drop(1).headOption.map(_.toInt).getOrElse(3)
    val spark = GraftSession.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // JIT/codegen warm at the small SF, untimed
    run(spark, "/root/testdata/sf0.001", 1)
    val cells = scala.collection.mutable.Map[(Int, String),
      List[Double]]().withDefaultValue(Nil)
    (1 to reps).foreach { _ =>
      Seq(1, 2).foreach { every =>
        sources.DerivedCache.vacuumKinds(spark, GraphKinds)
        cells((every, "cold")) ::= run(spark, dir, every)
        cells((every, "warm")) ::= run(spark, dir, every)
      }
    }
    for (every <- Seq(1, 2); leg <- Seq("cold", "warm")) {
      val xs = cells((every, leg))
      println(f"[prtune] every=$every $leg%-4s best=${xs.min}%6.2fs " +
        f"all=${xs.sorted.map(x => f"$x%.2f").mkString(",")}")
    }
  }
}

/** Broadcast-vs-fallback timing for pageRankPrepared's node-count
  * gate (VERDICT r10 #2): the past-ceiling sort-merge path
  * (`Graph.scala` pageRankPrepared) was plan-locked but never timed —
  * the declared 100 TB graph path had zero measured runs. This forces
  * the gate BOTH ways on the same graph (ceiling=Long.MaxValue →
  * broadcast ranks; ceiling=0 → pre-partitioned sort-merge) at 1× and
  * `factor`× disjoint node-tagged replicas, best-of-`reps` with legs
  * interleaved so host drift prices every cell equally. SCALING.md
  * records the rows. The gate's default ceiling stays at 4 M nodes —
  * the fallback exists for MEMORY (a broadcast of 4 M (node, pr)
  * rows is a few hundred MB on every executor; past it the driver
  * dies, latency is moot); these rows price the latency the fallback
  * costs when it engages.
  */
object PageRankFallbackCheck {

  private def replicateGraph(adj: DataFrame, nodes: DataFrame,
      factor: Int): (DataFrame, DataFrame) = {
    // disjoint replicas: tag both endpoints per replica — subgraph
    // structure (degrees, ranks within a replica) is preserved, node
    // count multiplies, no cross-replica edges appear
    def tag(df: DataFrame, cols: Seq[String]): DataFrame =
      (0 until factor).map { r =>
        cols.foldLeft(df)((d, c) =>
          d.withColumn(c, concat(lit(s"r$r#"), col(c))))
      }.reduce(_.unionByName(_))
    (tag(adj, Seq("src", "dst")), tag(nodes, Seq("node")))
  }

  private def run(spark: SparkSession, adj: DataFrame, nodes: DataFrame,
      ceiling: Long): Double = {
    val t0 = System.nanoTime()
    operators.Graph.pageRankPrepared(adj, nodes, iters = 10,
      checkpointEvery = 1, maxBroadcastNodes = ceiling)
      .write.mode(SaveMode.Overwrite).format("noop").save()
    val sec = (System.nanoTime() - t0) / 1e9
    InternalCaches.drain()
    spark.catalog.clearCache()
    spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
    sec
  }

  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val factor = args.drop(1).headOption.map(_.toInt).getOrElse(8)
    val reps = args.drop(2).headOption.map(_.toInt).getOrElse(3)
    val spark = GraftSession.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val (adj1, nodes1) = operators.Graph.memoTradeGraph(spark, dir)
    val (adjN, nodesN) = replicateGraph(adj1, nodes1, factor)
    val n1 = nodes1.count(); val nN = n1 * factor
    // JIT warm both code paths, untimed
    run(spark, adj1, nodes1, Long.MaxValue)
    run(spark, adj1, nodes1, 0L)
    val cells = scala.collection.mutable.Map[(String, String),
      List[Double]]().withDefaultValue(Nil)
    (1 to reps).foreach { _ =>
      cells(("1x", "broadcast")) ::= run(spark, adj1, nodes1, Long.MaxValue)
      cells(("1x", "fallback")) ::= run(spark, adj1, nodes1, 0L)
      cells((s"${factor}x", "broadcast")) ::= run(spark, adjN, nodesN, Long.MaxValue)
      cells((s"${factor}x", "fallback")) ::= run(spark, adjN, nodesN, 0L)
    }
    for (scale <- Seq("1x", s"${factor}x"); leg <- Seq("broadcast", "fallback")) {
      val xs = cells((scale, leg))
      val nodes = if (scale == "1x") n1 else nN
      println(f"[prfallback] $scale%-4s ($nodes%9d nodes) $leg%-9s " +
        f"best=${xs.min}%6.2fs all=${xs.sorted.map(x => f"$x%.2f").mkString(",")}")
    }
  }
}

/** Skew stress for the hot-key join path (VERDICT r8 #1): the scaled
  * replicas ScaleCheck builds are deliberately disjoint/uniform, so
  * the skew machinery never engages there — `q_join_salted` equals the
  * plain join on uniform keys by construction. This harness builds the
  * OPPOSITE corpus: `factor`× lineitem/orders replicas where one order
  * key holds `hotPct`% of all lineitem rows (the viral-entity shape),
  * then measures the same join+agg three ways with the build side
  * forced past broadcast range (at 100 TB the dim side isn't small):
  *
  *   plain/skew-off — sort-merge, AQE skew split disabled: the one hot
  *     reducer serializes the stage (the failure mode);
  *   plain/aqe-skew — AQE skew split on, thresholds scaled to the test
  *     volume (the production defaults are sized for 256 MB cluster
  *     partitions): the runtime mitigation;
  *   salted — `Skew.saltedEquiJoin`, AQE skew split off: the
  *     declarative mitigation, working even where AQE can't see the
  *     skew (e.g. a skewed aggregation feeding the join).
  *
  * Prints one row per variant; the SCALING.md skew section records
  * them. PlanShapeSpec separately locks that the AQE variant's final
  * plan actually contains the skew-split marker.
  */
object SkewCheck {

  /** `factor`× replicas with ONE hot order key: each lineitem row is
    * remapped to the hot key with probability `hotPct`/100 by a
    * deterministic row hash (task retries must pick the same rows).
    * Orders replicate normally, so the hot key matches exactly one
    * build row — pure probe-side skew, the shape AQE's split handles.
    * Returns the hot key.
    */
  def buildSkewedJoin(spark: SparkSession, srcDir: String, outDir: String,
      factor: Int, hotPct: Int): Long = {
    val orders = sources.Tables.table(spark, srcDir, "orders")
    val li = sources.Tables.table(spark, srcDir, "lineitem")
    val mx = orders.agg(max("o_orderkey")).head().getLong(0)
    var offset = 100000000L
    while (offset <= mx) offset *= 10
    val hotKey = orders.agg(min("o_orderkey")).head().getLong(0)
    (0 until factor).map(r => orders
        .withColumn("o_orderkey", col("o_orderkey") + lit(r * offset)))
      .reduce(_.unionByName(_))
      .repartition(spark.sparkContext.defaultParallelism)
      .write.mode(SaveMode.Overwrite).parquet(s"$outDir/orders.parquet")
    (0 until factor).map { r =>
      val key = col("l_orderkey") + lit(r * offset)
      li.withColumn("l_orderkey",
        when(pmod(xxhash64(key, col("l_partkey"), col("l_linenumber")),
          lit(100)) < hotPct, lit(hotKey)).otherwise(key))
    }.reduce(_.unionByName(_))
      .repartition(spark.sparkContext.defaultParallelism)
      .write.mode(SaveMode.Overwrite).parquet(s"$outDir/lineitem.parquet")
    hotKey
  }

  /** The measured join+agg — q_join_salted's aggregate over the plain
    * equi-join (or the salted one when `salt`).
    */
  def joinAgg(spark: SparkSession, dir: String, salt: Boolean): DataFrame = {
    val li = sources.Tables.table(spark, dir, "lineitem")
      .select(col("l_orderkey"), col("l_quantity"))
    val ord = sources.Tables.table(spark, dir, "orders")
      .select(col("o_orderkey").as("l_orderkey"), col("o_orderpriority"))
    val joined =
      if (salt) operators.Skew.saltedEquiJoin(li, ord, "l_orderkey")
      else li.join(ord, Seq("l_orderkey"))
    joined.groupBy("o_orderpriority")
      .agg(count(lit(1)).as("n"), round(sum("l_quantity"), 2).as("sum_qty"))
  }

  def main(args: Array[String]): Unit = {
    val srcDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val factor = args.drop(1).headOption.map(_.toInt).getOrElse(10)
    val hotPct = args.drop(2).headOption.map(_.toInt).getOrElse(30)
    val spark = GraftSession.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = java.nio.file.Files.createTempDirectory("graft_skew").toString
    println(s"[skew] building ${factor}x corpus with a $hotPct%-hot key at $dir")
    buildSkewedJoin(spark, srcDir, dir, factor, hotPct)
    // force the sort-merge path: at the target scale the orders side is
    // far past broadcast range, and a broadcast would hide the skew
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    def setSkewSplit(on: Boolean): Unit = {
      spark.conf.set("spark.sql.adaptive.skewJoin.enabled", on.toString)
      // production defaults target 256 MB cluster partitions; scale
      // them to this corpus so "would the split fire" is testable at
      // harness volume (the ratio, not the absolute, is the contract)
      spark.conf.set(
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "4m")
      spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "4m")
      spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2.0")
    }
    def time(label: String, salt: Boolean, skewSplit: Boolean): Double = {
      setSkewSplit(skewSplit)
      // best-of-2, interleaving handled by the caller ordering
      val samples = (1 to 2).map { _ =>
        val t0 = System.nanoTime()
        joinAgg(spark, dir, salt)
          .write.mode(SaveMode.Overwrite).format("noop").save()
        (System.nanoTime() - t0) / 1e9
      }
      val sec = samples.min
      println(f"[skew] $label%-16s ${factor}x=$sec%7.2fs")
      sec
    }
    val plainOff = time("plain/skew-off", salt = false, skewSplit = false)
    val plainAqe = time("plain/aqe-skew", salt = false, skewSplit = true)
    val salted = time("salted", salt = true, skewSplit = false)
    println(f"[skew] degradation plain/skew-off vs salted = ${plainOff / salted}%5.2fx, " +
      f"vs aqe-skew = ${plainOff / plainAqe}%5.2fx")
  }
}

/** Bloom sidecar cost measurement (round 13): the design claims behind
  * the distributed `ensureSidecars` are (a) the BUILD is one job whose
  * cost tracks DATA VOLUME, ≈flat in file count at fixed volume — the
  * r12 shape was one sequential job per file with a driver collect of
  * its hashes, O(files) wall-clock; and (b) the point LOOKUP's sidecar
  * probes run in parallel, so a fine-sliced table doesn't pay
  * O(files) serial FS round trips. Same events rows load once as
  * `filesLo` and once as `filesHi` range files; build and lookup time
  * at both counts, interleaved per rep; ratios ≈1 confirm both claims
  * (the lookup also pays a schema pass over the manifest's file list —
  * included honestly in the number).
  */
object BloomBuildCheck {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val filesLo = args.drop(1).headOption.map(_.toInt).getOrElse(4)
    val filesHi = args.drop(2).headOption.map(_.toInt).getOrElse(32)
    val reps = args.drop(3).headOption.map(_.toInt).getOrElse(3)
    val spark = GraftSession.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import operators.{AtomicIncrement, BloomSkip}
    val ev = sources.Tables.table(spark, dir, "events")
      .select(col("event_id"), unix_micros(col("ts")).as("tsu"),
        col("user_id"))
    val target = ev.agg(max("event_id")).head().getLong(0)
    def load(files: Int): String = {
      val sink = java.nio.file.Files
        .createTempDirectory("graft_bloomscale").resolve("t").toString
      AtomicIncrement.appendIncrementAtomic(
        ev.repartitionByRange(files, col("tsu")), sink, "tsu")
      sink
    }
    def timed(body: => Unit): Double = {
      val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9
    }
    // JIT/codegen warm
    { val s = load(2); BloomSkip.ensureSidecars(spark, s, "event_id")
      BloomSkip.pointLookup(spark, s, "event_id", lit(target)).count()
      org.apache.commons.io.FileUtils.deleteDirectory(
        new java.io.File(new java.io.File(s).getParent)) }
    val cells = scala.collection.mutable.Map[(Int, String), List[Double]]()
      .withDefaultValue(Nil)
    (1 to reps).foreach { _ =>
      for (files <- Seq(filesLo, filesHi)) {
        val sink = load(files)
        val nFiles = AtomicIncrement.committedFiles(spark, sink).size
        cells((files, "build")) ::= timed {
          val built = BloomSkip.ensureSidecars(spark, sink, "event_id")
          require(built == nFiles, s"expected $nFiles built, got $built")
        }
        cells((files, "lookup")) ::= timed {
          val narrowed = BloomSkip.pointLookup(spark, sink, "event_id",
            lit(target))
          require(narrowed.inputFiles.length < nFiles, "never pruned")
          require(narrowed.filter(col("event_id") === target).count() >= 1)
        }
        InternalCaches.drain(); spark.catalog.clearCache()
        org.apache.commons.io.FileUtils.deleteDirectory(
          new java.io.File(new java.io.File(sink).getParent))
      }
    }
    for (kind <- Seq("build", "lookup")) {
      val lo = cells((filesLo, kind)).min
      val hi = cells((filesHi, kind)).min
      println(f"[bloomscale] $kind%-7s ${filesLo}f=$lo%6.2fs " +
        f"${filesHi}f=$hi%6.2fs ratio=${hi / lo}%5.2f " +
        f"(files x${filesHi.toDouble / filesLo}%.0f at fixed volume)")
    }
  }
}

/** Distributed sidecar-probe measurement (round 15 — closes the r14
  * verdict's "driver-side O(files) probe loop"): past the threshold
  * (default 256 surviving files) [[operators.BloomSkip]]'s
  * may-contain probes run as ONE Spark job over the parallelized file
  * list instead of the driver's 32-thread pool — at 10⁵–10⁶ files on
  * object storage the pool is minutes of driver-bound round trips
  * while the cluster idles, and the job is the shape that scales with
  * executors. Fixture: the documents corpus at FIXED volume sliced
  * into `filesLo` (driver-pool path) vs `filesHi` (distributed path,
  * default 16× more) files plus one needle file; the row asserts the
  * distributed path actually engaged (probe-shape counter), the
  * needle pruning held at both scales, and reports the probe
  * wall-clock ratio. Locally both paths saturate the same 32 cores so
  * the honest expectation is ratio ≪ file ratio (the reads are
  * per-file constant work), not exact flatness — the architectural
  * win (probe parallelism = cluster width, driver ships bits) only
  * shows on a real cluster.
  */
object ProbeScaleCheck {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val filesLo = args.drop(1).headOption.map(_.toInt).getOrElse(64)
    val filesHi = args.drop(2).headOption.map(_.toInt).getOrElse(1024)
    val reps = args.drop(3).headOption.map(_.toInt).getOrElse(3)
    val spark = GraftSession.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import operators.{AtomicIncrement, BloomSkip}
    val d = sources.Tables.table(spark, dir, "documents")
      .select(col("doc_id"), col("text"))
    val dmx = d.agg(max("doc_id")).head().getLong(0)
    def load(files: Int): String = {
      val sink = java.nio.file.Files
        .createTempDirectory("graft_probescale").resolve("t").toString
      AtomicIncrement.appendIncrementAtomic(
        d.repartitionByRange(files, col("doc_id")), sink, "doc_id")
      AtomicIncrement.appendIncrementAtomic(
        spark.range(1).select(lit(dmx + 1).as("doc_id"),
          lit("the xyzzy needle").as("text")), sink, "doc_id")
      BloomSkip.ensureTokenSidecars(spark, sink, "text")
      sink
    }
    def timed(body: => Unit): Double = {
      val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9
    }
    val cells = scala.collection.mutable.Map[Int, List[Double]]()
      .withDefaultValue(Nil)
    var engagedHi = false
    for (files <- Seq(filesLo, filesHi)) {
      val sink = load(files)
      val committed = AtomicIncrement.committedFiles(spark, sink).size
      (1 to reps).foreach { _ =>
        val before = BloomSkip.distributedProbes.get()
        cells(files) ::= timed {
          val narrowed = BloomSkip.readContainingTokens(spark, sink,
            "text", Seq("xyzzy"))
          // needle + a small Bloom fp margin, at EITHER file count
          require(narrowed.inputFiles.length >= 1 &&
              narrowed.inputFiles.length <= math.max(3, committed / 50),
            s"probe kept ${narrowed.inputFiles.length} of $committed")
        }
        if (files == filesHi && committed > 256)
          engagedHi = engagedHi ||
            BloomSkip.distributedProbes.get() > before
      }
      org.apache.commons.io.FileUtils.deleteDirectory(
        new java.io.File(new java.io.File(sink).getParent))
    }
    require(engagedHi || filesHi <= 256,
      "the distributed probe path never engaged at the high file count")
    val lo = cells(filesLo).min
    val hi = cells(filesHi).min
    println(f"[probescale] grepprobe ${filesLo}f=$lo%6.2fs " +
      f"${filesHi}f=$hi%6.2fs ratio=${hi / lo}%5.2f " +
      f"(files x${filesHi.toDouble / filesLo}%.0f at fixed volume; " +
      s"distributed path engaged=$engagedHi)")
  }
}

/** Copy-on-write merge cost measurement (round 12): the design claim
  * behind `q_merge_upsert` is that a MERGE rewrites ∝ churn-TOUCHED
  * files, never ∝ table size — on a key-clustered table, a change
  * batch confined to one key region must cost the same whether the
  * table is 1× or `factor`×, while the SAME-SIZED batch spread across
  * every region is the honest linear contrast (every file intersects
  * the churn, so every file rewrites — the workload where clustering,
  * not the merge, is what's missing). Tables load as fixed-width
  * orderkey ranges (one file each), so file count grows ×factor with
  * the data; churn row counts are equal across all four cells. Fresh
  * sink per measurement (a merge mutates its table); legs interleave
  * inside each rep so host drift prices every cell equally.
  */
/** Round-14 continuation scale rows: the metadata/maintenance faces
  * added after the main r14 drop —
  *
  *  - `statsagg`: [[operators.AtomicIncrement.statsAggregate]] at 1×
  *    and N× the table — MUST be ≈flat (it reads one manifest and
  *    launches ZERO jobs; a ratio tracking table size means a scan
  *    snuck in);
  *  - `grepbuild`: [[operators.BloomSkip.ensureTokenSidecars]] over a
  *    corpus ×N — expected ≈linear (one distributed job over the new
  *    files: building an index costs the data, once);
  *  - `grepprobe`: the needle token probe — O(files) SMALL sidecar
  *    reads fanned out, then ONE data file opened at either scale
  *    (the pin: opened files stay 1 while the corpus grows N×);
  *  - `quantfold`: a FIXED-SIZE CDC batch into
  *    [[operators.IncrementalAgg.mergeCdcQuantile]] state built from
  *    1× vs N× history — MUST be ≈flat (cost ∝ batch + occupied
  *    buckets, never the history).
  */
object MetaScaleCheck {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val factor = args.drop(1).headOption.map(_.toInt).getOrElse(8)
    val reps = args.drop(2).headOption.map(_.toInt).getOrElse(3)
    val spark = GraftSession.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import operators.{AtomicIncrement, BloomSkip, IncrementalAgg}
    def sinkDir(): String = java.nio.file.Files
      .createTempDirectory("graft_meta").resolve("t").toString
    def drop(sink: String): Unit =
      org.apache.commons.io.FileUtils.deleteDirectory(
        new java.io.File(new java.io.File(sink).getParent))
    def timed[A](f: => A): (Double, A) = {
      val t0 = System.nanoTime()
      val a = f
      ((System.nanoTime() - t0) / 1e9, a)
    }
    val cells = scala.collection.mutable.Map[(String, String),
      List[Double]]().withDefaultValue(Nil)
    var evolveN = 0

    // ---- statsagg + quantfold share the orders fixture ----
    val o1 = sources.Tables.table(spark, dir, "orders")
      .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"))
    val mx = o1.agg(max("o_orderkey")).head().getLong(0)
    var offset = 100000000L
    while (offset <= mx) offset *= 10
    def ordersLoad(replicas: Int): String = {
      val sink = sinkDir()
      for (r <- 0 until replicas)
        AtomicIncrement.appendIncrementAtomic(
          o1.withColumn("o_orderkey", col("o_orderkey") + lit(r * offset))
            .repartition(4), sink, "o_orderkey",
          Seq("o_totalprice", "o_orderstatus"))
      sink
    }
    val (s1, sN) = (ordersLoad(1), ordersLoad(factor))
    // SQL face: a WHERE-pruned aggregate over the graft-atomic view —
    // the predicate selects replica 0's upper half at BOTH scales, so
    // the work the prune leaves behind is constant and the ratio
    // isolates the per-file verdict cost (manifest-sized)
    def sqlAgg(sink: String, view: String): Double = {
      spark.sql(s"""CREATE OR REPLACE TEMPORARY VIEW $view
        USING `graft-atomic` OPTIONS (path '$sink')""")
      timed(spark.sql(
        s"""SELECT count(*) c, round(sum(o_totalprice), 2) t
           |FROM $view
           |WHERE o_orderkey > ${mx / 2} AND o_orderkey <= $mx"""
          .stripMargin).collect())._1
    }
    // exactness pinned once against the scan before timing
    val meta = AtomicIncrement.statsAggregate(spark, s1,
      Seq("o_orderkey", "o_totalprice")).get.head()
    val scan = AtomicIncrement.readCommitted(spark, s1).agg(
      count(lit(1)), min("o_orderkey"), max("o_orderkey"),
      min("o_totalprice"), max("o_totalprice")).head()
    require((0 to 4).forall(i => meta.get(i) == scan.get(i)),
      s"statsAggregate disagrees with the scan: $meta vs $scan")
    val batch = o1.filter(col("o_orderkey") % 100 === 7).cache()
    batch.count()
    (1 to reps).foreach { _ =>
      cells(("statsagg", "1x")) ::= timed(
        AtomicIncrement.statsAggregate(spark, s1,
          Seq("o_orderkey", "o_totalprice")).get.head())._1
      cells(("statsagg", s"${factor}x")) ::= timed(
        AtomicIncrement.statsAggregate(spark, sN,
          Seq("o_orderkey", "o_totalprice")).get.head())._1
      cells(("sqlprune", "1x")) ::= sqlAgg(s1, "graft_ms_v1")
      cells(("sqlprune", s"${factor}x")) ::= sqlAgg(sN, "graft_ms_vN")
      // quantile: bootstrap ∝ history (untimed), folds ∝ batch
      for ((label, src) <- Seq("1x" -> s1, s"${factor}x" -> sN)) {
        val st = sinkDir()
        IncrementalAgg.mergeCdcQuantile(
          AtomicIncrement.readCommitted(spark, src),
          batch.limit(0), st, Seq("o_orderstatus"), "o_totalprice",
          0.0, 640000.0, 6400, 0L)
        cells(("quantfold", label)) ::= timed(
          IncrementalAgg.mergeCdcQuantile(batch, batch, st,
            Seq("o_orderstatus"), "o_totalprice",
            0.0, 640000.0, 6400, 1L))._1
        drop(st)
      }
      // round 17 — ALTER ADD COLUMN: the evolution commit is
      // manifest-priced (snapshot parse + one zero-row driver-written
      // file + publish) — flat across table size is the claim
      spark.conf.set("spark.sql.catalog.graft",
        "graft.sources.GraftCatalog")
      for ((label, src) <- Seq("1x" -> s1, s"${factor}x" -> sN)) {
        evolveN += 1
        cells(("evolve", label)) ::= timed(spark.sql(
          s"ALTER TABLE graft.`$src` ADD COLUMN ev_$evolveN DOUBLE"))._1
      }
    }
    drop(s1); drop(sN)

    // ---- token grep: corpus ×N, needle probe ----
    val d1 = sources.Tables.table(spark, dir, "documents")
      .select(col("doc_id"), col("text"))
    val dmx = d1.agg(max("doc_id")).head().getLong(0)
    var doff = 100000000L
    while (doff <= dmx) doff *= 10
    def corpusLoad(replicas: Int): String = {
      val sink = sinkDir()
      for (r <- 0 until replicas; q <- 0 until 4)
        AtomicIncrement.appendIncrementAtomic(
          d1.filter(col("doc_id") % 4 === q)
            .withColumn("doc_id", col("doc_id") + lit(r * doff))
            .repartition(1), sink, "doc_id")
      AtomicIncrement.appendIncrementAtomic(
        spark.range(1).select(
          lit(replicas.toLong * doff * 2).as("doc_id"),
          lit("the xyzzy needle").as("text")), sink, "doc_id")
      sink
    }
    for ((label, replicas) <- Seq("1x" -> 1, s"${factor}x" -> factor)) {
      val sink = corpusLoad(replicas)
      (1 to reps).foreach { r =>
        if (r == 1) {
          cells(("grepbuild", label)) ::= timed(
            BloomSkip.ensureTokenSidecars(spark, sink, "text"))._1
          cells(("idxbuild", label)) ::= timed(
            BloomSkip.ensureTokenIndex(spark, sink, "text"))._1
        }
        val (t, narrowed) = timed(
          BloomSkip.readContainingTokens(spark, sink, "text",
            Seq("xyzzy")))
        // the needle file plus a small Bloom false-positive margin
        // (~1% per distinct filter at 10 bits/token — an exact ==1
        // would fail deterministically on an unlucky corpus)
        require(narrowed.inputFiles.length >= 1 &&
            narrowed.inputFiles.length <= 3,
          s"needle probe opened ${narrowed.inputFiles.length} files")
        cells(("grepprobe", label)) ::= t
        // the DISTRIBUTED sidecar probe (threshold forced to 1 so the
        // one-job path engages at both scales — the r14 verdict item 2
        // row): verdict bits return to the driver, reads run as tasks
        val dp0 = BloomSkip.distributedProbes.get()
        spark.conf.set(BloomSkip.ProbeThresholdConf, "1")
        val (td, viaDist) = try timed(
          BloomSkip.readContainingTokens(spark, sink, "text",
            Seq("xyzzy")))
          finally spark.conf.unset(BloomSkip.ProbeThresholdConf)
        require(BloomSkip.distributedProbes.get() > dp0,
          "the distributed probe path did not engage")
        require(viaDist.inputFiles.length >= 1 &&
          viaDist.inputFiles.length <= 3,
          s"dist probe opened ${viaDist.inputFiles.length} files")
        cells(("distprobe", label)) ::= td
        // the inverted-index probe: ONE pushdown-pruned postings read
        // however many files the corpus has — the row whose ratio the
        // r14 verdict's item 7 asks for (probe ≈flat in file count)
        val (ti, viaIdx) = timed(
          BloomSkip.readContainingTokensIndexed(spark, sink, "text",
            Seq("xyzzy")))
        require(viaIdx.inputFiles.length == 1,
          s"indexed probe opened ${viaIdx.inputFiles.length} files")
        cells(("idxprobe", label)) ::= ti
      }
      drop(sink)
    }

    // ---- streaming source: per-WINDOW cost vs table size — the
    // bootstrap (∝ table) drains untimed through a first AvailableNow
    // run; the timed run subscribes from that checkpoint and consumes
    // ONE constant-churn append window, so the ratio isolates the
    // per-batch manifest + window-file cost ----
    for ((label, replicas) <- Seq("1x" -> 1, s"${factor}x" -> factor)) {
      val sink = ordersLoad(replicas)
      val ckptRoot = sinkDir()
      def drain(): Unit = {
        val q = spark.readStream.format("graft-atomic")
          .option("path", sink).load()
          .writeStream.option("checkpointLocation", s"$ckptRoot/ckpt")
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .foreachBatch((df: DataFrame, _: Long) => { df.count(); () })
          .start()
        q.awaitTermination()
      }
      drain() // bootstrap, untimed
      (1 to reps).foreach { r =>
        AtomicIncrement.appendIncrementAtomic(
          o1.filter(col("o_orderkey") % 100 === r)
            .withColumn("o_orderkey",
              col("o_orderkey") + lit((replicas + 10 * r) * offset))
            .repartition(2), sink, "o_orderkey")
        cells(("streamwin", label)) ::= timed(drain())._1
      }
      drop(sink); drop(ckptRoot)
    }

    // ---- SQL DELETE: priced by the files the predicate may touch —
    // the WHERE hits replica 0's upper half at BOTH scales, so the
    // rewrite work is constant and the ratio isolates the manifest
    // verdict + publish cost ----
    spark.conf.set("spark.sql.catalog.graft", "graft.sources.GraftCatalog")
    for ((label, replicas) <- Seq("1x" -> 1, s"${factor}x" -> factor)) {
      (1 to reps).foreach { _ =>
        val sink = ordersLoad(replicas)
        val before = AtomicIncrement.committedFiles(spark, sink).size
        val (t, _) = timed(spark.sql(
          s"DELETE FROM graft.`$sink` WHERE o_orderkey > ${mx / 2} " +
            s"AND o_orderkey <= $mx AND o_totalprice < 100000"))
        val after = AtomicIncrement.committedFiles(spark, sink)
        require(after.size >= before - 4,
          s"delete rewrote ${before - after.size} of $before files — " +
            "the predicate prune regressed")
        cells(("sqldelete", label)) ::= t
        drop(sink)
      }
    }
    // ---- SQL UPDATE through the native row-level DSv2 path (round
    // 16): same constant-touch fixture as the delete — the WHERE may
    // touch only replica 0's upper-half files at both scales, so the
    // ratio isolates the group-scan planning + manifest verdict +
    // publish cost of the SupportsRowLevelOperations machinery ----
    for ((label, replicas) <- Seq("1x" -> 1, s"${factor}x" -> factor)) {
      (1 to reps).foreach { _ =>
        val sink = ordersLoad(replicas)
        val before = AtomicIncrement.committedFiles(spark, sink).size
        val (t, _) = timed(spark.sql(
          s"UPDATE graft.`$sink` SET o_totalprice = o_totalprice + 1 " +
            s"WHERE o_orderkey > ${mx / 2} AND o_orderkey <= $mx " +
            "AND o_totalprice < 100000"))
        val after = AtomicIncrement.committedFiles(spark, sink)
        require(after.size >= before - 4,
          s"update rewrote ${before - after.size} of $before files — " +
            "the row-level group prune regressed")
        cells(("sqlupdate", label)) ::= t
        drop(sink)
      }
    }
    batch.unpersist()
    for (kind <- Seq("statsagg", "sqlprune", "quantfold", "evolve",
        "grepbuild", "grepprobe", "distprobe", "idxbuild", "idxprobe",
        "streamwin", "sqldelete", "sqlupdate")) {
      val t1 = cells((kind, "1x")).min
      val tN = cells((kind, s"${factor}x")).min
      println(f"[metascale] $kind%-9s 1x=$t1%7.3fs ${factor}x=$tN%7.3fs " +
        f"ratio=${tN / t1}%5.2f")
    }
  }
}

object MergeScaleCheck {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val factor = args.drop(1).headOption.map(_.toInt).getOrElse(8)
    val reps = args.drop(2).headOption.map(_.toInt).getOrElse(2)
    val spark = GraftSession.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import operators.AtomicIncrement
    val o1 = sources.Tables.table(spark, dir, "orders")
      .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"))
    val mx = o1.agg(max("o_orderkey")).head().getLong(0)
    var offset = 100000000L
    while (offset <= mx) offset *= 10
    val tmp = java.nio.file.Files.createTempDirectory("graft_mscale").toString
    (0 until factor).map(r => o1.withColumn("o_orderkey",
        col("o_orderkey") + lit(r * offset)))
      .reduce(_.unionByName(_))
      .repartition(spark.sparkContext.defaultParallelism)
      .write.mode(SaveMode.Overwrite).parquet(s"$tmp/ordersN.parquet")
    val oN = spark.read.parquet(s"$tmp/ordersN.parquet")
    // one file per quarter-replica range: 4 files at 1×, 4·factor at
    // N× — cuts are replica-aware (r·offset + q·mx/4) because replica
    // key islands are sparse in the offset space and uniform global
    // cuts would collapse each replica into one file
    def load(o: org.apache.spark.sql.DataFrame, replicas: Int): String = {
      val sink = java.nio.file.Files
        .createTempDirectory("graft_msink").resolve("t").toString
      val cuts = for (r <- 0 until replicas; q <- 1 to 4)
        yield r * offset + (if (q == 4) mx else q * (mx / 4))
      var lo = Long.MinValue
      for (hi <- cuts) {
        AtomicIncrement.appendIncrementAtomic(
          o.filter(col("o_orderkey") > lo && col("o_orderkey") <= hi)
            .repartition(1), sink, "o_orderkey")
        lo = hi
      }
      sink
    }
    // CONFINED churn: the first quarter-replica's keys, %10 == 0 —
    // identical batch for both scales (replica 0 exists in both).
    // SPREAD churn: the same ROW COUNT scattered over every region
    // (k % (10·factor) == 0 at N× ≡ k % 10 == 0 per tenth replica).
    def confined(o: org.apache.spark.sql.DataFrame) =
      o.filter(col("o_orderkey") <= mx / 4 &&
        col("o_orderkey") % 10 === 0)
    def spread(o: org.apache.spark.sql.DataFrame, m: Int) =
      o.filter(col("o_orderkey") % m === 0)
    def asChanges(df: org.apache.spark.sql.DataFrame) =
      df.select(col("o_orderkey"), lit("X").as("o_orderstatus"),
        (col("o_totalprice") + 1).as("o_totalprice"),
        lit(false).as("del"))
    def timeMerge(o: org.apache.spark.sql.DataFrame, replicas: Int,
        ch: org.apache.spark.sql.DataFrame, defer: Boolean = false)
        : (Double, Int, Int) = {
      val sink = load(o, replicas)
      val t0 = System.nanoTime()
      val res =
        if (defer) AtomicIncrement.mergeOnReadAtomic(asChanges(ch), sink,
          "o_orderkey", "del")
        else AtomicIncrement.mergeAtomic(asChanges(ch), sink,
          "o_orderkey", "del")
      val sec = (System.nanoTime() - t0) / 1e9
      InternalCaches.drain(); spark.catalog.clearCache()
      org.apache.commons.io.FileUtils.deleteDirectory(
        new java.io.File(new java.io.File(sink).getParent))
      (sec, res.rewritten, res.carried)
    }
    timeMerge(o1.limit(4000), 1, confined(o1).limit(50)) // JIT warm
    val cells = scala.collection.mutable.Map[(String, String),
      List[(Double, Int, Int)]]().withDefaultValue(Nil)
    (1 to reps).foreach { _ =>
      cells(("confined", "1x")) ::= timeMerge(o1, 1, confined(o1))
      cells(("confined", s"${factor}x")) ::=
        timeMerge(oN, factor, confined(oN))
      cells(("spread", "1x")) ::= timeMerge(o1, 1, spread(o1, 10))
      cells(("spread", s"${factor}x")) ::=
        timeMerge(oN, factor, spread(oN, 10 * factor))
      // merge-on-read: the same spread churn that forces copy-on-write
      // to rewrite EVERY file commits as after-images + one tombstone
      // file — cost ∝ the batch, however many files the table holds
      cells(("defer-spread", "1x")) ::=
        timeMerge(o1, 1, spread(o1, 10), defer = true)
      cells(("defer-spread", s"${factor}x")) ::=
        timeMerge(oN, factor, spread(oN, 10 * factor), defer = true)
      // round 14 — TARGETED dv fold: after a confined merge-on-read
      // batch, foldDvsTargeted must rewrite the churn's file locality
      // (the same 1 masked file at both scales), never the table —
      // the r13 policy's full rewrite here scaled with the snapshot
      def timeFold(o: org.apache.spark.sql.DataFrame, replicas: Int,
          ch: org.apache.spark.sql.DataFrame): (Double, Int, Int) = {
        val sink = load(o, replicas)
        AtomicIncrement.mergeOnReadAtomic(asChanges(ch), sink,
          "o_orderkey", "del")
        val t0 = System.nanoTime()
        val (masked, staged) =
          AtomicIncrement.foldDvsTargeted(spark, sink)
        val sec = (System.nanoTime() - t0) / 1e9
        require(masked >= 1 && masked <= 2,
          s"confined dv fold masked $masked files — locality broke")
        InternalCaches.drain(); spark.catalog.clearCache()
        org.apache.commons.io.FileUtils.deleteDirectory(
          new java.io.File(new java.io.File(sink).getParent))
        (sec, masked, staged)
      }
      cells(("dvfold-conf", "1x")) ::= timeFold(o1, 1, confined(o1))
      cells(("dvfold-conf", s"${factor}x")) ::=
        timeFold(oN, factor, confined(oN))
      // round 14 — INCREMENTAL small-file compaction: the SAME four
      // single-row appends land on the 1× and the Nx table, and
      // compactSmall must price the pack at that fixed debt — flat
      // across table size (the full-snapshot OPTIMIZE is ×N here)
      def timeSmall(o: org.apache.spark.sql.DataFrame,
          replicas: Int): (Double, Int, Int) = {
        val sink = load(o, replicas)
        for (i <- 1L to 4L)
          AtomicIncrement.appendIncrementAtomic(
            spark.range(1).select(
              (lit(factor.toLong * offset * 2 + i)).as("o_orderkey"),
              lit("S").as("o_orderstatus"),
              lit(1.0).as("o_totalprice")).repartition(1),
            sink, "o_orderkey")
        val t0 = System.nanoTime()
        val (packed, staged) = AtomicIncrement.compactSmall(spark, sink,
          smallBytes = 16384L, targetFiles = 1,
          keyCol = Some("o_orderkey"))
        val sec = (System.nanoTime() - t0) / 1e9
        require(packed == 4,
          s"small-file pack touched $packed files — threshold broke")
        InternalCaches.drain(); spark.catalog.clearCache()
        org.apache.commons.io.FileUtils.deleteDirectory(
          new java.io.File(new java.io.File(sink).getParent))
        (sec, packed, staged)
      }
      cells(("smallpack", "1x")) ::= timeSmall(o1, 1)
      cells(("smallpack", s"${factor}x")) ::= timeSmall(oN, factor)
    }
    for (kind <- Seq("confined", "spread", "defer-spread",
        "dvfold-conf", "smallpack")) {
      val c1 = cells((kind, "1x")); val cN = cells((kind, s"${factor}x"))
      val t1 = c1.map(_._1).min; val tN = cN.map(_._1).min
      println(f"[mergescale] $kind%-9s 1x=$t1%6.2fs " +
        f"(rw=${c1.head._2}/${c1.head._2 + c1.head._3}) " +
        f"${factor}x=$tN%6.2fs " +
        f"(rw=${cN.head._2}/${cN.head._2 + cN.head._3}) " +
        f"ratio=${tN / t1}%5.2f")
    }
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(tmp))
  }
}

/** Round-17 measurement for the dyadic fold's radix trade: the SAME
  * sf0.1 CDC batch folds at radix-16 (16 levels × depth cells/row)
  * and radix-256 (8 levels — half the cell constant, 16× beam
  * fan-out on the read). Prints fold and read times (min of reps)
  * plus the top-3 parity check; the SCALING.md row comes from here.
  */
object DyadicRadixCheck {
  def main(args: Array[String]): Unit = {
    import org.apache.spark.sql.functions._
    import operators.IncrementalAgg
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val reps = args.drop(1).headOption.map(_.toInt).getOrElse(3)
    val spark = GraftSession.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val o = sources.Tables.table(spark, dir, "orders").select(
      col("o_orderkey"), col("o_orderstatus"),
      (col("o_custkey").bitwiseAND(-col("o_custkey"))).as("hh")).cache()
    o.count()
    val minus = o.filter(col("o_orderkey") % 10 === 7).cache()
    val plus = o.filter(col("o_orderkey") % 10 === 3)
      .withColumn("o_orderstatus", lit("X")).cache()
    minus.count(); plus.count()
    def sinkDir(): String = java.nio.file.Files
      .createTempDirectory("graft_radix").resolve("t").toString
    def timed(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    val cells = scala.collection.mutable.Map[(Int, String), List[Double]]()
      .withDefaultValue(Nil)
    var parity: Option[(Seq[Any], Seq[Any])] = None
    (1 to reps).foreach { _ =>
      val tops = (for (bits <- Seq(4, 8)) yield {
        val s = sinkDir()
        cells((bits, "boot")) ::= timed {
          IncrementalAgg.mergeCdcTopKDyadic(o, o.limit(0), s,
            Seq("o_orderstatus"), "hh", 0L, radixBits = bits); ()
        }
        cells((bits, "fold")) ::= timed {
          IncrementalAgg.mergeCdcTopKDyadic(plus, minus, s,
            Seq("o_orderstatus"), "hh", 1L, radixBits = bits); ()
        }
        var top: Seq[Any] = Nil
        cells((bits, "read")) ::= timed {
          top = IncrementalAgg.readTopKDyadic(spark, s,
            Seq("o_orderstatus"), "hh", 3, radixBits = bits)
            .orderBy("o_orderstatus", "rank")
            .select("o_orderstatus", "hh", "rank")
            .collect().toSeq.map(r => (r.get(0), r.get(1), r.get(2)))
        }
        org.apache.commons.io.FileUtils.deleteDirectory(
          new java.io.File(new java.io.File(s).getParent))
        top
      }).toList
      parity = Some((tops.head, tops(1)))
    }
    val Some((t4, t8)) = parity
    require(t4 == t8, s"radix strides disagree on sf0.1:\n$t4\n$t8")
    for (phase <- Seq("boot", "fold", "read")) {
      val a = cells((4, phase)).min; val b = cells((8, phase)).min
      println(f"[dyadicradix] $phase%-5s radix16=$a%6.2fs " +
        f"radix256=$b%6.2fs ratio256/16=${b / a}%5.2f")
    }
    spark.stop()
  }
}

/** Round-17 measurement for the row-level scan's columnar
  * pass-through: the SAME wide-table SQL UPDATE (lineitem's 16
  * columns, sf0.1) runs with `-Dgraft.cow.columnar` on and off —
  * isolating the per-row overhead of flattening vectorized batches
  * to row views in the rewrite read. Min of reps, identical results
  * asserted (sum over a rewritten column).
  */
object CowColumnarCheck {
  def main(args: Array[String]): Unit = {
    import org.apache.spark.sql.functions._
    import operators.AtomicIncrement
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val reps = args.drop(1).headOption.map(_.toInt).getOrElse(3)
    val replicas = args.drop(2).headOption.map(_.toInt).getOrElse(1)
    val spark = GraftSession.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.conf.set("spark.sql.catalog.graft", "graft.sources.GraftCatalog")
    val li0 = sources.Tables.table(spark, dir, "lineitem")
    val mx0 = li0.agg(max("l_orderkey")).head().getLong(0)
    val li = (1 until replicas).foldLeft(li0)((acc, r) =>
      acc.unionByName(li0.withColumn("l_orderkey",
        col("l_orderkey") + lit(r * 4L * mx0)))).cache()
    val mx = if (replicas == 1) mx0 else (replicas - 1) * 4L * mx0 + mx0
    li.count()
    def sinkDir(): String = java.nio.file.Files
      .createTempDirectory("graft_cowcol").resolve("t").toString
    val cells = scala.collection.mutable.Map[String, List[Double]]()
      .withDefaultValue(Nil)
    var sums = scala.collection.mutable.Map[String, Double]()
    (1 to reps).foreach { _ =>
      for (mode <- Seq("true", "false")) {
        System.setProperty("graft.cow.columnar", mode)
        val s = sinkDir()
        AtomicIncrement.appendIncrementAtomic(li.repartition(8), s,
          "l_orderkey", Seq("l_quantity"))
        val t0 = System.nanoTime()
        spark.sql(s"UPDATE graft.`$s` SET l_quantity = l_quantity + 1 " +
          s"WHERE l_orderkey <= ${mx / 2}")
        cells(mode) ::= (System.nanoTime() - t0) / 1e9
        sums(mode) = AtomicIncrement.readCommitted(spark, s)
          .agg(sum("l_quantity")).head().getDouble(0)
        org.apache.commons.io.FileUtils.deleteDirectory(
          new java.io.File(new java.io.File(s).getParent))
      }
    }
    System.setProperty("graft.cow.columnar", "true")
    require(sums("true") == sums("false"),
      s"columnar and row paths disagree: $sums")
    val c = cells("true").min; val r = cells("false").min
    println(f"[cowcolumnar] update16col columnar=$c%6.2fs " +
      f"rows=$r%6.2fs ratio=${c / r}%5.2f")
    spark.stop()
  }
}
