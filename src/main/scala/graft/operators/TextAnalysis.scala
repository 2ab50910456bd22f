package graft.operators

import graft.QueryDef
import graft.functions.Functions.spreadScan
import graft.sources.Tables.table
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Text-analysis operators for a training-data pipeline (north-star
  * extensions beyond the reference, see BASELINE.json): tokenization,
  * quality scoring, language-ID heuristic, document fingerprinting.
  * All pure column expressions — per-row cost is O(|text|), no
  * shuffles except the final aggregates, so the plan is embarrassingly
  * parallel at any scale.
  */
object TextAnalysis {

  /** Whitespace tokenizer (trim first so no empty edge tokens). */
  def tokens(c: Column): Column = split(trim(c), "\\s+")

  /** Canonical text form: lowercase, collapse whitespace runs. */
  def normalize(c: Column): Column =
    regexp_replace(lower(trim(c)), "\\s+", " ")

  /** MD5 fingerprint of the normalized text — the exact-dup key. */
  def fingerprint(c: Column): Column = md5(normalize(c))

  /** BPE-ish subword count estimate: whitespace tokens plus an extra
    * unit per 6 chars of long tokens (a public rule-of-thumb proxy —
    * ~4 chars/token for English); real tokenizers drop in behind the
    * same column signature.
    */
  def tokenEstimate(c: Column): Column =
    aggregate(
      tokens(c),
      lit(0L),
      (acc, t) => acc + greatest(ceil(length(t).cast(DoubleType) / 6.0).cast(LongType), lit(1L)))

  /** Stopword ratio over a broadcast-small stopword set. */
  def stopwordRatio(c: Column, stopwords: Seq[String]): Column = {
    val toks = tokens(c)
    when(size(toks) > 0,
      size(filter(toks, t => t.isin(stopwords.map(lit): _*)))
        .cast(DoubleType) / size(toks))
      .otherwise(0.0)
  }

  /** Language-ID heuristic: charset detection first (script is the
    * strongest signal), then distinctive function words. First match
    * wins — order is part of the contract.
    */
  def langId(c: Column): Column = {
    val t = lower(c)
    def hasWord(w: String) = t.rlike(s"(^|\\s)$w(\\s|$$)")
    when(c.rlike("[\\p{IsCyrillic}]"), "ru")
      .when(c.rlike("[\\p{IsHan}]"), "zh")
      .when(c.rlike("[äöüß]"), "de")
      .when(c.rlike("[áéíóúñ¿¡]"), "es")
      .when(hasWord("der") || hasWord("und") || hasWord("nicht"), "de")
      .when(hasWord("el") || hasWord("los") || hasWord("las"), "es")
      .when(hasWord("le") || hasWord("les") || hasWord("est"), "fr")
      .when(hasWord("the") || hasWord("and") || hasWord("is"), "en")
      .otherwise("und")
  }

  private val stopwords = Seq("the", "a", "and", "of", "to", "is")

  // ---------- winnowing fingerprints (rolling hash) --------------------

  /** Engine-portable 32-bit token hash (md5 hex prefix) as a long —
    * any SQL engine can reproduce it, unlike xxhash64.
    */
  def hash32(tok: Column): Column =
    conv(substring(md5(tok), 1, 8), 16, 10).cast("long")

  private val RkP = 2147483647L // 2^31-1
  private val RkB = 131L

  /** Rolling Rabin-Karp 4-gram hashes over a *materialized* token-hash
    * array: Horner with mod at each step, so intermediates stay under
    * 2^39 — identical integer math is expressible in any engine.
    */
  def gramHashes(h: Column): Column =
    when(size(h) >= 4,
      transform(sequence(lit(1), size(h) - 3), i => pmod(
        pmod(pmod(
          element_at(h, i) * RkB + element_at(h, i + lit(1)), lit(RkP)) * RkB +
          element_at(h, i + lit(2)), lit(RkP)) * RkB +
          element_at(h, i + lit(3)), lit(RkP))))
      .otherwise(array().cast(ArrayType(LongType)))

  /** Winnowing (the MOSS scheme): the min gram hash of every
    * w-window, deduped — a position-robust fingerprint set whose size
    * is ~2/(w+1) of the grams, giving near-dup overlap detection at a
    * fraction of full-shingle cost.
    *
    * PERF: the sliding min is w-1 zip_with rounds against shifted
    * slices, NOT `transform(seq, i => array_min(slice(g, i, w)))`.
    * Array arguments of zip_with/slice are HOF *children*, evaluated
    * once per row; a column referenced inside a transform lambda
    * re-evaluates its whole upstream expression per element when the
    * optimizer inlines the projection chain (measured 100× here: the
    * md5 token hashing re-ran for every window).
    */
  def winnow(g: Column, w: Int = 5): Column = {
    // mins_k[i] = min(g[i..i+k-1]); extend one shifted copy at a time
    val mins = (1 until w).foldLeft(g) { (m, k) =>
      zip_with(m, slice(g, lit(k + 1), size(g)), (a, b) => least(a, b))
    }
    when(size(g) >= w,
      array_sort(array_distinct(slice(mins, lit(1), size(g) - (w - 1)))))
      .otherwise(array().cast(ArrayType(LongType)))
  }

  /** Sliding token-window chunking — context-length preparation for a
    * training pipeline: each document becomes fixed-size token windows
    * at `stride` offsets (overlap = chunkTokens − stride keeps
    * boundary context). One window per stride offset below n_tokens;
    * trailing windows run short rather than re-aligning (simple,
    * deterministic, oracle-replayable — dial `stride` to taste).
    * explode + slice on the materialized token array: narrow per-row
    * work, no shuffle, the same plan at 500 docs or 5 B.
    */
  def chunkDocs(docs: DataFrame, idCol: String, textCol: String,
      chunkTokens: Int = 128, stride: Int = 96): DataFrame = {
    require(chunkTokens > 0 && stride > 0, "chunk and stride must be positive")
    // repartition FIRST: a small single-file source scans as one
    // partition and the tokenize+slice work would run on one core
    // (the q_pii_scrub/repetitionMetrics lesson)
    spreadScan(docs)
      .select(col(idCol), tokens(col(textCol)).as("__t"))
      .withColumn("__n", size(col("__t")))
      .filter(col("__n") > 0)
      .select(col(idCol), col("__t"), col("__n"),
        posexplode(sequence(lit(0), col("__n") - 1, lit(stride)))
          .as(Seq("chunk_id", "__start")))
      .select(col(idCol), col("chunk_id"),
        concat_ws(" ", slice(col("__t"), col("__start") + 1, lit(chunkTokens)))
          .as("chunk_text"),
        least(lit(chunkTokens), col("__n") - col("__start"))
          .as("n_chunk_tokens"))
  }

  /** Cross-document duplicated-passage stats: for every doc, the
    * fraction of its token `k`-gram POSITIONS whose gram also occurs
    * in at least one other document — the per-doc signal behind exact
    * substring dedup (remove or down-weight docs made of passages the
    * corpus already has; cf. the duplicated-spans analyses in the
    * public train-data-dedup literature). Position-weighted, so a doc
    * that repeats a shared passage five times scores it five times.
    *
    * Scale shape: grams key every shuffle as their 128-bit md5 (bounded
    * width however long the passage), and the per-gram document count
    * attaches via an equi-JOIN rather than a window — a stop-phrase
    * gram shared by 10^8 docs becomes an AQE-splittable skewed join
    * partition instead of one unsplittable window partition. Three
    * keyed shuffles total: (gram,doc) combine, gram count, doc rollup.
    */
  def dupPassages(docs: DataFrame, idCol: String, textCol: String,
      k: Int = 5): DataFrame = {
    require(k > 0, "k must be positive")
    val pos = graft.functions.Functions.explodeOnce(
        spreadScan(docs)
          .select(col(idCol), tokens(col(textCol)).as("__t")),
        Seq(col(idCol)), Dedup.wordNgrams(col("__t"), k), "__gram")
      .select(col(idCol), md5(col("__gram")).as("__fp"))
    val byDoc = pos.groupBy("__fp", idCol).agg(count(lit(1)).as("__n_pos"))
    val gramDocs = byDoc.groupBy("__fp").agg(count(lit(1)).as("__n_docs"))
    byDoc.join(gramDocs, "__fp")
      .groupBy(idCol)
      .agg(
        sum("__n_pos").as("n_grams"),
        sum(when(col("__n_docs") >= 2, col("__n_pos")).otherwise(0L))
          .as("n_dup"))
      .withColumn("dup_frac",
        round(col("n_dup") * lit(1.0) / col("n_grams"), 4))
  }

  /** Maximal duplicated spans — the localization stage of exact
    * substring dedup: where [[dupPassages]] scores how much of a doc
    * is duplicated elsewhere, this returns WHICH token ranges are,
    * as maximal runs of consecutive duplicated k-gram positions
    * (the spans an exact-substring dedup pass would cut). A position
    * is duplicated iff its k-gram occurs in ≥ 2 documents; a run of
    * positions [p, q] covers tokens [p, q + k - 1].
    *
    * Scale shape: same keyed shuffles as dupPassages for the gram doc
    * counts (md5 keys, join not window over grams), then island
    * detection (`pos − row_number()`) in ONE window partitioned by
    * doc — per-doc row counts are bounded by doc length, so the
    * window partition never exceeds a document, regardless of corpus
    * size.
    */
  def dupSpans(docs: DataFrame, idCol: String, textCol: String,
      k: Int = 5): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(k > 0, "k must be positive")
    // posexplode form of Functions.explodeOnce: the outer generator
    // infers no pushable filters, the null-stub drop stays above it
    val pos = spreadScan(docs)
      .select(col(idCol), tokens(col(textCol)).as("__t"))
      .select(col(idCol),
        posexplode_outer(Dedup.wordNgrams(col("__t"), k))
          .as(Seq("__p0", "__gram")))
      .filter(col("__gram").isNotNull)
      .select(col(idCol), (col("__p0") + 1).as("__pos"),
        md5(col("__gram")).as("__fp"))
      // ONE exchange on __fp that both consumers below hang off
      // (ReusedExchange) — without it the tokenize+gram+md5 stage runs
      // once under the doc-count aggregate and again under the join.
      // The explicit isnotnull mirrors the filter the join would infer
      // on only its own branch; without it the two exchange subtrees
      // canonicalize differently and reuse silently never happens
      .filter(col("__fp").isNotNull)
      .repartition(col("__fp"))
    val gramDocs = pos
      .groupBy("__fp").agg(countDistinct(col(idCol)).as("__n_docs"))
    val dupPos = pos.join(gramDocs, "__fp")
      .filter(col("__n_docs") >= 2)
      .select(col(idCol), col("__pos"))
    val w = Window.partitionBy(col(idCol)).orderBy(col("__pos"))
    dupPos
      .withColumn("__isl", col("__pos") - row_number().over(w))
      .groupBy(col(idCol), col("__isl"))
      .agg(min("__pos").as("span_start"),
        (max("__pos") - min("__pos") + k).cast("int").as("span_tokens"))
      .select(col(idCol), col("span_start").cast("int").as("span_start"),
        col("span_tokens"))
  }

  /** Exact-substring scrub — the TRANSFORM stage of exact substring
    * dedup (cf. the public train-data-dedup literature): where
    * [[dupSpans]] localizes duplicated token ranges, this removes
    * them and reassembles the surviving text. A token is cut iff it
    * is covered by any duplicated k-gram (one occurring in ≥ 2 docs),
    * i.e. some dup gram start p satisfies p ≤ pos < p + k.
    *
    * Scale shape: the gram doc-count reuses dupSpans' keyed shuffles
    * (md5 gram keys, join not window); dup START positions then
    * collapse to one array row per doc (bounded by doc length), and
    * the cut itself is per-row HOF math over the materialized token
    * array — no token-level explode, no per-token join. Docs with no
    * duplicated grams pass through the left join unchanged.
    */
  def scrubDupSpans(docs: DataFrame, idCol: String, textCol: String,
      k: Int = 5): DataFrame = {
    require(k > 0, "k must be positive")
    val par = docs.sparkSession.sparkContext.defaultParallelism
    val tokFrame = spreadScan(docs)
      .select(col(idCol), tokens(col(textCol)).as("__t"))
    val pos = tokFrame
      .select(col(idCol),
        posexplode_outer(Dedup.wordNgrams(col("__t"), k))
          .as(Seq("__p0", "__gram")))
      .filter(col("__gram").isNotNull)
      .select(col(idCol), (col("__p0") + 1).as("__pos"),
        md5(col("__gram")).as("__fp"))
      // one exchange on __fp feeding both the doc-count aggregate and
      // the join back; explicit isnotnull keeps both subtrees
      // canonical-equal so the exchange actually reuses (the dupSpans
      // lesson — the join-side inferred filter otherwise breaks it)
      .filter(col("__fp").isNotNull)
      .repartition(col("__fp"))
    val gramDocs = pos
      .groupBy("__fp").agg(countDistinct(col(idCol)).as("__n_docs"))
    val starts = pos.join(gramDocs, "__fp")
      .filter(col("__n_docs") >= 2)
      .groupBy(idCol)
      .agg(collect_set(col("__pos")).as("__starts"))
    val st = coalesce(col("__starts"), array().cast(ArrayType(IntegerType)))
    tokFrame.join(starts, Seq(idCol), "left")
      // barrier: keepIdx references __t and __starts through two HOF
      // passes; the shuffle pins both as materialized columns first
      .repartition(par)
      .withColumn("__keep",
        filter(sequence(lit(1), size(col("__t"))),
          i => !exists(st, p => p <= i && i < p + k)))
      .select(col(idCol),
        size(col("__t")).as("n_tokens"),
        size(col("__keep")).as("n_kept"),
        concat_ws(" ",
          transform(col("__keep"), i => element_at(col("__t"), i)))
          .as("scrubbed_text"))
  }

  /** Cross-source overlap matrix — the corpus contamination report:
    * for every source pair, how many distinct token k-grams the two
    * share, plus the gram-set Jaccard. `dfCap` drops grams present in
    * more than that many sources first (stop-phrase grams carry no
    * contamination signal and would otherwise fan the self-join out
    * m² per gram — the same df-cap rationale as the posting-list
    * Jaccard in Dedup.jaccardScored).
    *
    * Scale shape: ONE corpus-sized exchange. The gram stream hash-
    * partitions on the md5 key; dedup and the per-gram source-set
    * collect are both partition-local under that single partitioning
    * (hash on `__fp` clusters every (gram, source) duplicate), so no
    * window sort and — crucially — no gram self-join: pairs fan out
    * ROW-LOCALLY from each gram's sorted source array (≤ dfCap²/2 per
    * gram after the cap). Per-source totals re-derive from the same
    * per-gram frame by exploding the source sets; the two tiny
    * aggregates (|sources| and pair-count rows) and the broadcast
    * joins are all that shuffles after the gram exchange. The
    * self-join formulation this replaced paid a full window SORT over
    * every distinct gram for the df cap plus a join shuffle of the
    * capped stream — at sf0.1 the gram explode dominates either way,
    * but at crawl scale the sort is the first thing to spill.
    */
  def sourceOverlap(docs: DataFrame, srcCol: String, textCol: String,
      k: Int = 5, dfCap: Int = 16): DataFrame = {
    require(k > 0 && dfCap >= 2, "k must be positive, dfCap >= 2")
    val par = docs.sparkSession.sparkContext.defaultParallelism
    val perGram = graft.functions.Functions.explodeOnce(
        spreadScan(docs)
          .select(col(srcCol), tokens(col(textCol)).as("__t")),
        Seq(col(srcCol)), Dedup.wordNgrams(col("__t"), k), "__gram")
      .select(col(srcCol), md5(col("__gram")).as("__fp"))
      .filter(col("__fp").isNotNull)
      .repartition(col("__fp"))
      .dropDuplicates("__fp", srcCol)
      .groupBy("__fp")
      .agg(sort_array(collect_set(col(srcCol))).as("__srcs"))
    val perSrc = perGram
      .select(explode(col("__srcs")).as(srcCol))
      .groupBy(srcCol).agg(count(lit(1)).as("__n"))
    val pairsArr = flatten(transform(col("__srcs"), (a, i) =>
      transform(slice(col("__srcs"), i + 2, size(col("__srcs"))),
        b => struct(a.as("src_a"), b.as("src_b")))))
    perGram
      .filter(size(col("__srcs")).between(2, dfCap))
      .select(explode(pairsArr).as("__p"))
      .groupBy(col("__p.src_a").as("src_a"), col("__p.src_b").as("src_b"))
      .agg(count(lit(1)).as("shared_grams"))
      .join(broadcast(perSrc
        .select(col(srcCol).as("src_a"), col("__n").as("__na"))), "src_a")
      .join(broadcast(perSrc
        .select(col(srcCol).as("src_b"), col("__n").as("__nb"))), "src_b")
      .select(col("src_a"), col("src_b"), col("shared_grams"),
        round(col("shared_grams").cast(DoubleType) /
          (col("__na") + col("__nb") - col("shared_grams")), 6)
          .as("jaccard"))
  }

  /** Corpus bigram-LM scoring — shared by `q_lm_score` (raw scores)
    * and `q_ppl_buckets` in [[Selection]] (per-language fluency
    * tiers). Train an add-k-smoothed bigram model on the corpus
    * itself (two keyed shuffles: bigram counts, then context counts
    * FROM the bigram aggregate), score each doc by its mean bigram
    * log-probability. Docs with fewer than 2 tokens carry no bigram
    * and drop out. Per-position log-probs are quantized to the 1/2^20
    * integer grid BEFORE the per-doc sum (the kmeans MeanQ trick):
    * integer sums are associative, so the average is bit-stable under
    * any shuffle order and the oracle replays it exactly — a raw
    * double avg() would leak summation order into the low bits on
    * BOTH engines. Returns (doc_id, n_bigrams, avg_logp) ordered by
    * doc_id.
    */
  def lmScored(s: SparkSession, dir: String): DataFrame = {
    val (model, qlpUnk) = ensureLmModel(s, dir)
    lmScoreWith(spreadScan(table(s, dir, "documents")),
      "doc_id", "text", model, qlpUnk)
      .orderBy("doc_id")
  }

  /** Build-once frozen bigram LM for a source dir — the third member
    * of the artifact family (postings, Lloyd quantizer): q_lm_score,
    * q_ppl_buckets and q_curriculum all score against the corpus LM,
    * and each used to retrain it in-query. The model (the
    * `(w1, w2, __qlp)` scored-bigram table) publishes as content-keyed
    * parquet plus the quantized UNK constant in a sidecar; scoring the
    * fit corpus against the frozen table reproduces the self-fit score
    * bit-for-bit (every bigram hits the table — LmGateSpec pins the
    * equality), so the swap is invisible in results and the oracles
    * keep refitting from scratch. `_SUCCESS` marks completeness; a
    * changed corpus re-keys and refits.
    */
  def ensureLmModel(s: SparkSession, dir: String): (DataFrame, Long) = {
    val cacheDir = graft.sources.DerivedCache.dirFor(s,
      s"$dir/documents.parquet", "bigram-lm")
    val root = new org.apache.hadoop.fs.Path(cacheDir)
    val fs = root.getFileSystem(s.sessionState.newHadoopConf())
    val unkPath = new org.apache.hadoop.fs.Path(s"$cacheDir/qlp_unk.txt")
    if (!graft.sources.DerivedCache.isComplete(s, cacheDir)) {
      val (model, qlpUnk) = lmModel(spreadScan(table(s, dir, "documents")))
      model.write.mode(org.apache.spark.sql.SaveMode.Overwrite)
        .parquet(s"$cacheDir/model")
      val out = fs.create(unkPath, true)
      try out.write(qlpUnk.toString.getBytes("UTF-8")) finally out.close()
      fs.create(new org.apache.hadoop.fs.Path(s"$cacheDir/_SUCCESS"), true)
        .close()
    }
    val in = fs.open(unkPath)
    val qlpUnk = try scala.io.Source.fromInputStream(in, "UTF-8")
      .mkString.trim.toLong finally in.close()
    (graft.sources.DerivedCache.read(s, s"$cacheDir/model"), qlpUnk)
  }

  /** Freeze the bigram LM of [[lmScored]] as an artifact: the
    * `(w1, w2, __qlp)` scored-bigram table plus the quantized UNK
    * log-prob (−ln vocabSize — the probability mass an unseen-context
    * bigram gets under the same add-k smoothing). Feeds the streaming
    * [[graft.streaming.LmGate]]: fit once on a bounded reference
    * corpus, score any batch against the frozen table. Scoring the FIT
    * corpus itself reproduces [[lmScored]]'s per-doc averages exactly
    * (every bigram hits the table — LmGateSpec pins it), which is what
    * makes the gate the stream twin of the batch score rather than an
    * approximation of it. One driver scalar (the vocab size, for the
    * UNK constant) collects at build time — same one-time cost class
    * as WinnowGate's construction count.
    */
  def lmModel(docs: DataFrame, textCol: String = "text"): (DataFrame, Long) = {
    val Q = 1048576L
    val toksF = docs
      .select(tokens(lower(col(textCol))).as("__t"))
      .filter(size(col("__t")) >= 2)
    val n = size(col("__t"))
    val bigrams = zip_with(
      slice(col("__t"), lit(1), n - 1), slice(col("__t"), lit(2), n - 1),
      (a, b) => struct(a.as("w1"), b.as("w2")))
    val bi = graft.functions.Functions.explodeOnce(
        toksF, Seq.empty, bigrams, "__bg")
      .select(col("__bg.w1").as("w1"), col("__bg.w2").as("w2"))
    val c12 = graft.InternalCaches.track(
      bi.groupBy("w1", "w2").agg(count(lit(1)).as("c12"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    val c1 = c12.groupBy("w1").agg(sum("c12").as("c1"))
    val vsz = c12.select(col("w1").as("w"))
      .union(c12.select(col("w2").as("w")))
      .agg(countDistinct("w")).head().getLong(0)
    val lp = log((col("c12") + lit(0.5)) / (col("c1") + lit(0.5) * vsz))
    val model = c12.join(c1, Seq("w1"))
      .select(col("w1"), col("w2"),
        floor(lp * Q + lit(0.5)).cast(LongType).as("__qlp"))
    val qlpUnk = math.floor(math.log(1.0 / vsz) * Q + 0.5).toLong
    (model, qlpUnk)
  }

  /** Score docs against a FROZEN bigram model from [[lmModel]]:
    * per-doc mean quantized bigram log-prob, unseen bigrams at the UNK
    * constant. Docs with fewer than 2 tokens carry no bigram and are
    * ABSENT from the result (the caller decides their fate — the gate
    * passes them, matching WinnowGate's under-floor contract).
    */
  def lmScoreWith(docs: DataFrame, idCol: String, textCol: String,
      model: DataFrame, qlpUnk: Long): DataFrame = {
    val toksF = docs
      .select(col(idCol), tokens(lower(col(textCol))).as("__t"))
      .filter(size(col("__t")) >= 2)
    val n = size(col("__t"))
    val bigrams = zip_with(
      slice(col("__t"), lit(1), n - 1), slice(col("__t"), lit(2), n - 1),
      (a, b) => struct(a.as("w1"), b.as("w2")))
    graft.functions.Functions.explodeOnce(
        toksF, Seq(col(idCol)), bigrams, "__bg")
      .select(col(idCol), col("__bg.w1").as("w1"), col("__bg.w2").as("w2"))
      .join(model, Seq("w1", "w2"), "left")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_bigrams"),
        sum(coalesce(col("__qlp"), lit(qlpUnk))).as("__s"))
      .select(col(idCol), col("n_bigrams"),
        round(col("__s").cast(DoubleType) /
          (col("n_bigrams").cast(DoubleType) * lit(1048576.0)), 4)
          .as("avg_logp"))
  }

  def defs: Map[String, QueryDef] = Map(
    // Sliding-window chunking at chunk=32/stride=24 (docs average ~54
    // tokens, so most emit 2-3 chunks). The oracle rebuilds every
    // window — offsets, slice text, short-tail lengths — so an
    // off-by-one anywhere in the windowing hash-mismatches.
    "q_chunk_docs" -> QueryDef(
      (s, dir) => chunkDocs(table(s, dir, "documents"),
        "doc_id", "text", chunkTokens = 32, stride = 24)
        .orderBy("doc_id", "chunk_id"),
      """WITH toks AS (
        |  SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS t
        |  FROM documents),
        |st AS (
        |  SELECT doc_id, t, len(t) AS n,
        |    unnest(range(0, len(t), 24)) AS start
        |  FROM toks WHERE len(t) > 0)
        |SELECT doc_id, CAST(start // 24 AS INT) AS chunk_id,
        |  array_to_string(t[start+1 : start+32], ' ') AS chunk_text,
        |  CAST(least(32, n - start) AS INT) AS n_chunk_tokens
        |FROM st
        |ORDER BY doc_id, chunk_id""".stripMargin),


    // Duplicated-passage profile at 5-gram granularity. The oracle
    // rebuilds every gram position, so windowing, within-doc repeat
    // counting, and the cross-doc threshold all hash-check.
    "q_dup_passages" -> QueryDef(
      (s, dir) => dupPassages(table(s, dir, "documents"),
        "doc_id", "text", k = 5).orderBy("doc_id"),
      """WITH toks AS (
        |  SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS t
        |  FROM documents),
        |pos AS (
        |  SELECT doc_id, unnest(list_transform(
        |    generate_series(1, len(t) - 4),
        |    i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2] || ' ' ||
        |         t[i+3] || ' ' || t[i+4])) AS gram
        |  FROM toks WHERE len(t) >= 5),
        |bydoc AS (
        |  SELECT doc_id, gram, count(*) AS n_pos FROM pos GROUP BY 1, 2),
        |gd AS (SELECT gram, count(*) AS n_docs FROM bydoc GROUP BY 1)
        |SELECT doc_id, CAST(sum(n_pos) AS BIGINT) AS n_grams,
        |  CAST(sum(CASE WHEN n_docs >= 2 THEN n_pos ELSE 0 END) AS BIGINT)
        |    AS n_dup,
        |  round(sum(CASE WHEN n_docs >= 2 THEN n_pos ELSE 0 END) * 1.0 /
        |    sum(n_pos), 4) AS dup_frac
        |FROM bydoc JOIN gd USING (gram)
        |GROUP BY 1 ORDER BY doc_id""".stripMargin),

    // Maximal duplicated spans: island detection over duplicated
    // 5-gram positions. The oracle rebuilds positions, the cross-doc
    // test, and the row_number() islands, so any off-by-one in span
    // boundaries hash-mismatches.
    "q_dup_spans" -> QueryDef(
      (s, dir) => dupSpans(table(s, dir, "documents"),
        "doc_id", "text", k = 5).orderBy("doc_id", "span_start"),
      """WITH toks AS (
        |  SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS t
        |  FROM documents),
        |pos AS (
        |  SELECT doc_id, unnest(generate_series(1, len(t) - 4)) AS pos, t
        |  FROM toks WHERE len(t) >= 5),
        |pg AS (
        |  SELECT doc_id, pos,
        |    t[pos] || ' ' || t[pos+1] || ' ' || t[pos+2] || ' ' ||
        |    t[pos+3] || ' ' || t[pos+4] AS gram
        |  FROM pos),
        |gd AS (
        |  SELECT gram, count(DISTINCT doc_id) AS n_docs FROM pg GROUP BY 1),
        |dp AS (
        |  SELECT doc_id, pos FROM pg JOIN gd USING (gram) WHERE n_docs >= 2),
        |isl AS (
        |  SELECT doc_id, pos, pos - row_number()
        |    OVER (PARTITION BY doc_id ORDER BY pos) AS grp
        |  FROM dp)
        |SELECT doc_id, CAST(min(pos) AS INT) AS span_start,
        |  CAST(max(pos) - min(pos) + 5 AS INT) AS span_tokens
        |FROM isl GROUP BY doc_id, grp
        |ORDER BY doc_id, span_start""".stripMargin),

    // Exact-substring scrub: cut every token covered by a duplicated
    // 5-gram and reassemble. The oracle rebuilds gram positions, the
    // cross-doc test, the covered-position predicate, and the
    // reassembly, so an off-by-one at either span edge (p ≤ pos < p+k)
    // hash-mismatches the scrubbed text.
    "q_scrub_dup_spans" -> QueryDef(
      (s, dir) => scrubDupSpans(table(s, dir, "documents"),
        "doc_id", "text", k = 5).orderBy("doc_id"),
      """WITH toks AS (
        |  SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS t
        |  FROM documents),
        |pos AS (
        |  SELECT doc_id, unnest(generate_series(1, len(t) - 4)) AS pos, t
        |  FROM toks WHERE len(t) >= 5),
        |pg AS (
        |  SELECT doc_id, pos,
        |    t[pos] || ' ' || t[pos+1] || ' ' || t[pos+2] || ' ' ||
        |    t[pos+3] || ' ' || t[pos+4] AS gram
        |  FROM pos),
        |gd AS (
        |  SELECT gram, count(DISTINCT doc_id) AS n_docs FROM pg GROUP BY 1),
        |st AS (
        |  SELECT doc_id, list(DISTINCT pos) AS starts
        |  FROM pg JOIN gd USING (gram) WHERE n_docs >= 2 GROUP BY 1),
        |kp AS (
        |  SELECT toks.doc_id, t,
        |    list_filter(generate_series(1, len(t)),
        |      i -> len(list_filter(coalesce(starts, []),
        |        p -> p <= i AND i < p + 5)) = 0) AS keep
        |  FROM toks LEFT JOIN st USING (doc_id))
        |SELECT doc_id,
        |  CAST(len(t) AS INT) AS n_tokens,
        |  CAST(len(keep) AS INT) AS n_kept,
        |  coalesce(array_to_string(list_transform(keep, i -> t[i]), ' '), '')
        |    AS scrubbed_text
        |FROM kp ORDER BY doc_id""".stripMargin),

    // Cross-source contamination matrix: distinct shared 5-grams and
    // gram-set Jaccard per source pair, stop-phrase grams (df > 16
    // sources) dropped before the pair fan-out. The oracle replays the
    // distinct-gram sets, the df cap, and the Jaccard denominator.
    "q_source_overlap" -> QueryDef(
      (s, dir) => sourceOverlap(table(s, dir, "documents"),
        "source", "text", k = 5, dfCap = 16)
        .orderBy("src_a", "src_b"),
      """WITH toks AS (
        |  SELECT source, regexp_split_to_array(trim(text), '\s+') AS t
        |  FROM documents),
        |pg AS (
        |  SELECT DISTINCT source, md5(gram) AS fp FROM (
        |    SELECT source, unnest(list_transform(
        |      generate_series(1, len(t) - 4),
        |      i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2] || ' ' ||
        |           t[i+3] || ' ' || t[i+4])) AS gram
        |    FROM toks WHERE len(t) >= 5)),
        |ps AS (SELECT source, count(*) AS n FROM pg GROUP BY 1),
        |df AS (SELECT fp, count(*) AS df FROM pg GROUP BY 1),
        |cg AS (SELECT source, fp FROM pg JOIN df USING (fp) WHERE df <= 16),
        |pairs AS (
        |  SELECT a.source AS src_a, b.source AS src_b,
        |    count(*) AS shared_grams
        |  FROM cg a JOIN cg b USING (fp)
        |  WHERE a.source < b.source
        |  GROUP BY 1, 2)
        |SELECT src_a, src_b, shared_grams,
        |  round(shared_grams * 1.0 / (na.n + nb.n - shared_grams), 6)
        |    AS jaccard
        |FROM pairs
        |JOIN ps na ON na.source = pairs.src_a
        |JOIN ps nb ON nb.source = pairs.src_b
        |ORDER BY src_a, src_b""".stripMargin),

    // Token counting: whitespace tokens, distinct tokens, subword
    // estimate — the unit economics of an LLM data pipeline. The token
    // array is projected once (multi-use non-cheap expressions stay
    // un-collapsed) so the text splits once per row.
    "q_token_count" -> QueryDef(
      (s, dir) => spreadScan(table(s, dir, "documents"))
        .select(col("doc_id"), tokens(col("text")).as("__toks"))
        .select(
          col("doc_id"),
          size(col("__toks")).as("n_tokens"),
          size(array_distinct(col("__toks"))).as("n_distinct"),
          aggregate(col("__toks"), lit(0L), (acc, t) =>
            acc + greatest(ceil(length(t).cast(DoubleType) / 6.0).cast(LongType), lit(1L)))
            .as("n_subwords"))
        .orderBy("doc_id"),
      """SELECT doc_id,
        |  len(regexp_split_to_array(trim(text), '\s+')) AS n_tokens,
        |  len(list_distinct(regexp_split_to_array(trim(text), '\s+'))) AS n_distinct,
        |  CAST(list_sum(list_transform(regexp_split_to_array(trim(text), '\s+'),
        |    t -> greatest(CAST(ceil(length(t) / 6.0) AS BIGINT), 1))) AS BIGINT) AS n_subwords
        |FROM documents ORDER BY doc_id""".stripMargin),

    // Subword-accurate token accounting: a GPT-2-style pre-tokenizer
    // regex (contraction suffixes | space?+letter-run | space?+digit-
    // run | space?+punct-run | whitespace-run) — RE2-portable (no
    // lookahead, so Java regex and the oracle's RE2 split
    // identically), counted per doc with the words-to-subwords
    // fertility ratio a token-budget planner actually uses. Pure
    // per-row column math, zero shuffles.
    "q_token_count_bpe" -> QueryDef(
      (s, dir) => {
        val pat = "'(?:s|t|re|ve|m|ll|d)| ?[\\p{L}]+| ?[\\p{N}]+| ?[^\\s\\p{L}\\p{N}]+|\\s+"
        spreadScan(table(s, dir, "documents"))
          .select(col("doc_id"),
            size(tokens(col("text"))).as("n_words"),
            size(regexp_extract_all(col("text"), lit(pat), lit(0)))
              .as("n_bpe"))
          .select(col("doc_id"), col("n_words"), col("n_bpe"),
            round(col("n_bpe").cast(DoubleType) /
              greatest(col("n_words"), lit(1)), 4).as("fertility"))
          .orderBy("doc_id")
      },
      """SELECT doc_id,
        |  len(regexp_split_to_array(trim(text), '\s+')) AS n_words,
        |  len(regexp_extract_all(text,
        |    '''(?:s|t|re|ve|m|ll|d)| ?[\p{L}]+| ?[\p{N}]+| ?[^\s\p{L}\p{N}]+|\s+'))
        |    AS n_bpe,
        |  round(len(regexp_extract_all(text,
        |    '''(?:s|t|re|ve|m|ll|d)| ?[\p{L}]+| ?[\p{N}]+| ?[^\s\p{L}\p{N}]+|\s+'))
        |    * 1.0 / greatest(len(regexp_split_to_array(trim(text), '\s+')), 1), 4)
        |    AS fertility
        |FROM documents ORDER BY doc_id""".stripMargin),

    // Quality scoring: length stats, punctuation ratio, stopword
    // ratio, mean token length — the standard pre-training filters.
    "q_text_quality" -> QueryDef(
      (s, dir) => {
        val toks = col("__toks")
        spreadScan(table(s, dir, "documents"))
          .select(col("doc_id"), col("text"), tokens(col("text")).as("__toks"))
          .select(
            col("doc_id"),
            length(col("text")).as("n_chars_actual"),
            size(toks).as("n_tokens"),
            round(length(regexp_replace(col("text"), "[a-zA-Z0-9\\s]", ""))
              .cast(DoubleType) / greatest(length(col("text")), lit(1)), 4)
              .as("punct_ratio"),
            round(size(filter(toks, t => t.isin(stopwords.map(lit): _*)))
              .cast(DoubleType) / greatest(size(toks), lit(1)), 4)
              .as("stopword_ratio"),
            round(aggregate(toks, lit(0L), (a, t) => a + length(t))
              .cast(DoubleType) / greatest(size(toks), lit(1)), 4)
              .as("avg_token_len"))
          .orderBy("doc_id")
      },
      """SELECT doc_id,
        |  length(text) AS n_chars_actual,
        |  len(regexp_split_to_array(trim(text), '\s+')) AS n_tokens,
        |  round(length(regexp_replace(text, '[a-zA-Z0-9\s]', '', 'g'))
        |    / greatest(length(text), 1), 4) AS punct_ratio,
        |  round(len(list_filter(regexp_split_to_array(trim(text), '\s+'),
        |      t -> t IN ('the','a','and','of','to','is')))
        |    / greatest(len(regexp_split_to_array(trim(text), '\s+')), 1), 4) AS stopword_ratio,
        |  round(list_sum(list_transform(regexp_split_to_array(trim(text), '\s+'),
        |      t -> length(t)))
        |    / greatest(len(regexp_split_to_array(trim(text), '\s+')), 1), 4) AS avg_token_len
        |FROM documents ORDER BY doc_id""".stripMargin),

    // Language-ID heuristic output + corpus distribution vs the
    // labeled lang column (charset + function-word rules; the
    // synthetic corpus is English-wordlist text so the heuristic
    // stays deterministic).
    "q_lang_id" -> QueryDef(
      (s, dir) => table(s, dir, "documents")
        .select(col("doc_id"), langId(col("text")).as("pred_lang"))
        .orderBy("doc_id"),
      """SELECT doc_id,
        |  CASE
        |    WHEN regexp_matches(text, '[Ѐ-ӿ]') THEN 'ru'
        |    WHEN regexp_matches(text, '[一-鿿]') THEN 'zh'
        |    WHEN regexp_matches(text, '[äöüß]') THEN 'de'
        |    WHEN regexp_matches(text, '[áéíóúñ¿¡]') THEN 'es'
        |    WHEN regexp_matches(lower(text), '(^|\s)(der|und|nicht)(\s|$)') THEN 'de'
        |    WHEN regexp_matches(lower(text), '(^|\s)(el|los|las)(\s|$)') THEN 'es'
        |    WHEN regexp_matches(lower(text), '(^|\s)(le|les|est)(\s|$)') THEN 'fr'
        |    WHEN regexp_matches(lower(text), '(^|\s)(the|and|is)(\s|$)') THEN 'en'
        |    ELSE 'und' END AS pred_lang
        |FROM documents ORDER BY doc_id""".stripMargin),

    // Language-ID EVALUATION against the labeled lang column (the
    // harness corpus ships ground truth that no query used until
    // now): the (label, prediction) confusion matrix with per-cell
    // share of the label's row — per-language recall on the diagonal,
    // the confusion structure off it. This is the accuracy gate a
    // pipeline runs before trusting a classifier to route documents;
    // one narrow groupBy + a label-partition window over ≤ |langs|²
    // rows at any corpus size.
    "q_langid_eval" -> QueryDef(
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        table(s, dir, "documents")
          .select(col("lang"), langId(col("text")).as("pred_lang"))
          .groupBy("lang", "pred_lang").agg(count(lit(1)).as("n"))
          .withColumn("share", round(col("n") * lit(1.0) /
            sum("n").over(Window.partitionBy("lang")), 4))
          .orderBy("lang", "pred_lang")
      },
      """WITH p AS (
        |  SELECT lang,
        |    CASE
        |      WHEN regexp_matches(text, '[Ѐ-ӿ]') THEN 'ru'
        |      WHEN regexp_matches(text, '[一-鿿]') THEN 'zh'
        |      WHEN regexp_matches(text, '[äöüß]') THEN 'de'
        |      WHEN regexp_matches(text, '[áéíóúñ¿¡]') THEN 'es'
        |      WHEN regexp_matches(lower(text), '(^|\s)(der|und|nicht)(\s|$)') THEN 'de'
        |      WHEN regexp_matches(lower(text), '(^|\s)(el|los|las)(\s|$)') THEN 'es'
        |      WHEN regexp_matches(lower(text), '(^|\s)(le|les|est)(\s|$)') THEN 'fr'
        |      WHEN regexp_matches(lower(text), '(^|\s)(the|and|is)(\s|$)') THEN 'en'
        |      ELSE 'und' END AS pred_lang
        |  FROM documents),
        |c AS (SELECT lang, pred_lang, count(*) AS n FROM p GROUP BY 1, 2)
        |SELECT lang, pred_lang, n,
        |  round(n * 1.0 / sum(n) OVER (PARTITION BY lang), 4) AS share
        |FROM c ORDER BY lang, pred_lang""".stripMargin),

    // Corpus stats per labeled language.
    "q_lang_dist" -> QueryDef(
      (s, dir) => table(s, dir, "documents")
        .groupBy("lang")
        .agg(
          count(lit(1)).as("n_docs"),
          round(avg("n_chars"), 4).as("avg_chars"),
          sum(size(tokens(col("text")))).as("total_tokens"))
        .orderBy("lang"),
      """SELECT lang, count(*) AS n_docs,
        |  round(avg(n_chars), 4) AS avg_chars,
        |  CAST(sum(len(regexp_split_to_array(trim(text), '\s+'))) AS BIGINT) AS total_tokens
        |FROM documents GROUP BY lang ORDER BY lang""".stripMargin),

    // TF-IDF top term per document: explode → per-(doc,term) tf →
    // per-term df (distinct docs) → broadcast N → score → windowed
    // top-1. Two shuffles (tf groupBy, df groupBy) + one broadcast —
    // the canonical multi-stage text-pipeline shape at any corpus
    // size. Ties break on term order in both engines.
    "q_tfidf" -> QueryDef(
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        // tf IS the postings index — ride the content-keyed artifact
        // the retrieval family and q_dedup_tfidf share (identical
        // tokenizer and groupBy), already persisted for multi-consumer
        // fan-out (df derives from it AND it feeds the final join —
        // without a shared frame Catalyst duplicated the whole
        // tokenize subtree per consumer, round-8 plan review)
        val tf = graft.operators.SparseRetrieval.postings(s, dir)
        val df_ = tf.groupBy("term").agg(count(lit(1)).as("df"))
        val n = table(s, dir, "documents").agg(count(lit(1)).as("n_docs"))
        val w = Window.partitionBy("doc_id")
          .orderBy(col("score").desc, col("term"))
        tf.join(df_, "term")
          .crossJoin(broadcast(n))
          .withColumn("score",
            col("tf") * log((col("n_docs") + 1.0) / (col("df") + 1.0)))
          .withColumn("rn", row_number().over(w))
          .filter(col("rn") === 1)
          .select(col("doc_id"), col("term"), round(col("score"), 4).as("score"))
          .orderBy("doc_id")
      },
      """WITH toks AS (
        |  SELECT doc_id, unnest(regexp_split_to_array(trim(lower(text)), '\s+')) AS term
        |  FROM documents),
        |tf AS (SELECT doc_id, term, count(*) AS tf FROM toks GROUP BY 1, 2),
        |df AS (SELECT term, count(DISTINCT doc_id) AS df FROM toks GROUP BY 1),
        |n AS (SELECT count(*) AS n_docs FROM documents),
        |scored AS (
        |  SELECT doc_id, term, tf * ln((n_docs + 1.0) / (df + 1.0)) AS score
        |  FROM tf JOIN df USING (term), n)
        |SELECT doc_id, term, round(score, 4) AS score
        |FROM scored
        |QUALIFY row_number() OVER (PARTITION BY doc_id ORDER BY score DESC, term) = 1
        |ORDER BY doc_id""".stripMargin),

    // Corpus bigram-LM quality score — the CCNet-style fluency signal
    // beyond surface heuristics (repetitive/templated text scores
    // high, token-soup scores low). Full shape + the order-free
    // quantized-sum contract: see [[lmScored]] above.
    "q_lm_score" -> QueryDef(
      (s, dir) => lmScored(s, dir),
      """WITH tf AS (
        |  SELECT doc_id, regexp_split_to_array(trim(lower(text)), '\s+') AS t
        |  FROM documents WHERE len(regexp_split_to_array(trim(lower(text)), '\s+')) >= 2),
        |b2 AS (
        |  SELECT doc_id, bg['w1'] AS w1, bg['w2'] AS w2 FROM (
        |    SELECT doc_id, unnest(list_transform(generate_series(1, len(t) - 1),
        |      i -> {'w1': t[i], 'w2': t[i+1]})) AS bg
        |    FROM tf)),
        |c12 AS (SELECT w1, w2, count(*) AS c12 FROM b2 GROUP BY 1, 2),
        |c1 AS (SELECT w1, CAST(sum(c12) AS BIGINT) AS c1 FROM c12 GROUP BY 1),
        |v AS (SELECT count(DISTINCT w) AS vsz
        |      FROM (SELECT unnest(t) AS w FROM tf)),
        |sc AS (
        |  SELECT doc_id,
        |    CAST(floor(ln((c12 + 0.5) / (c1 + 0.5 * vsz)) * 1048576 + 0.5)
        |      AS BIGINT) AS qlp
        |  FROM b2 JOIN c12 USING (w1, w2) JOIN c1 USING (w1), v)
        |SELECT doc_id, count(*) AS n_bigrams,
        |  round(CAST(sum(qlp) AS DOUBLE) /
        |    (CAST(count(*) AS DOUBLE) * 1048576.0), 4) AS avg_logp
        |FROM sc GROUP BY 1 ORDER BY doc_id""".stripMargin),

    // Document fingerprinting: md5 of the normalized text — the
    // canonical exact-dup / lineage key.
    "q_fingerprint" -> QueryDef(
      (s, dir) => table(s, dir, "documents")
        .select(
          col("doc_id"),
          fingerprint(col("text")).as("fp"))
        .orderBy("doc_id"),
      """SELECT doc_id,
        |  md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) AS fp
        |FROM documents ORDER BY doc_id""".stripMargin),

    // Winnowing fingerprints: token md5-hash → rolling 4-gram Horner
    // hash mod 2^31-1 → window-5 minima, deduped and exploded. Staged
    // projections keep each interpreted HOF pass over a materialized
    // array. Integer math end to end — the oracle reproduces it
    // bit-for-bit.
    "q_winnow_fp" -> QueryDef(
      (s, dir) => winnowFps(s, dir).orderBy("doc_id", "fp"),
      s"""$winnowFpsSql
        |SELECT doc_id, unnest(fps) AS fp FROM winnowed
        |ORDER BY doc_id, fp""".stripMargin),

    // Winnow-fingerprint near-dedup (the batch twin of the streaming
    // WinnowGate): docs sharing ≥ 2 selected fingerprints are
    // edit-drift near-dup candidates — winnowing guarantees any
    // sufficiently long shared substring contributes a shared
    // fingerprint (Schleimer et al. 2003, the MOSS scheme), so this
    // catches copies that token-set and MinHash views blur. Same
    // posting-list counting join as the Jaccard family: one
    // fp-keyed exchange, df-capped to prune boilerplate fingerprints
    // (a viral fp at 100 TB is a stop-gram, not a dup signal), pair
    // count = |shared fp set| since fps are per-doc distinct.
    "q_dedup_winnow" -> QueryDef(
      (s, dir) => {
        val fps = winnowFps(s, dir)
        val inv = fps
          .withColumn("__df", count(lit(1))
            .over(org.apache.spark.sql.expressions.Window.partitionBy("fp")))
          .filter(col("__df") <= 50)
          .drop("__df")
        inv.select(col("doc_id").as("id_a"), col("fp"))
          .join(inv.select(col("doc_id").as("id_b"), col("fp")), "fp")
          .filter(col("id_a") < col("id_b"))
          .groupBy("id_a", "id_b").agg(count(lit(1)).as("shared"))
          .filter(col("shared") >= 2)
          .orderBy("id_a", "id_b")
      },
      s"""$winnowFpsSql,
        |fps AS (SELECT doc_id, unnest(fps) AS fp FROM winnowed),
        |keep AS (SELECT fp FROM fps GROUP BY fp HAVING count(*) <= 50),
        |inv AS (SELECT f.doc_id, f.fp FROM fps f JOIN keep USING (fp)),
        |pairs AS (
        |  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS shared
        |  FROM inv a JOIN inv b ON a.fp = b.fp AND a.doc_id < b.doc_id
        |  GROUP BY 1, 2)
        |SELECT id_a, id_b, shared FROM pairs WHERE shared >= 2
        |ORDER BY id_a, id_b""".stripMargin)
  )

  /** The winnowing pipeline as a frame: (doc_id, fp) with per-doc
    * distinct fingerprints — shared by q_winnow_fp and
    * q_dedup_winnow, mirrored line-for-line by [[winnowFpsSql]].
    */
  private def winnowFps(s: org.apache.spark.sql.SparkSession,
      dir: String): DataFrame = {
    val par = s.sparkContext.defaultParallelism
    val gramFrame = spreadScan(table(s, dir, "documents"))
      .select(col("doc_id"), tokens(col("text")).as("__toks"))
      // filter EARLY on the cheapest equivalent predicate
      // (tokens ≥ 8 ⟺ grams ≥ 5): predicate pushdown substitutes
      // projection chains into the predicate regardless of cost,
      // and a filter on size(__g) would re-run the md5-per-token
      // chain once per gram inside gramHashes' lambda (measured
      // 100× — 50 s at sf0.1 for a 1 s pipeline)
      .filter(size(col("__toks")) >= 8)
      .select(col("doc_id"),
        transform(col("__toks"), t => hash32(t)).as("__h"))
      .select(col("doc_id"), gramHashes(col("__h")).as("__g"))
      // barrier: winnow references __g ~w times; the shuffle pins
      // the gram array to a materialized column first
      .repartition(par)
    graft.functions.Functions.explodeOnce(
      gramFrame, Seq(col("doc_id")), winnow(col("__g")), "fp")
  }

  /** The winnowing pipeline as DuckDB CTEs ending in `winnowed`
    * (doc_id, fps sorted-distinct list) — one string so both
    * winnow-backed oracles provably replay the same scheme.
    */
  private val winnowFpsSql: String =
    """WITH toks AS (
      |  SELECT doc_id, list_transform(regexp_split_to_array(trim(text), '\s+'),
      |    t -> CAST(CAST(('0x' || substr(md5(t), 1, 8)) AS UINT32) AS BIGINT)) AS h
      |  FROM documents),
      |grams AS (
      |  SELECT doc_id, list_transform(generate_series(1, len(h) - 3),
      |    i -> ((((h[i] * 131 + h[i+1]) % 2147483647) * 131 + h[i+2])
      |          % 2147483647 * 131 + h[i+3]) % 2147483647) AS g
      |  FROM toks),
      |winnowed AS (
      |  SELECT doc_id, list_sort(list_distinct(list_transform(
      |    generate_series(1, len(g) - 4), i -> list_min(g[i:i+4])))) AS fps
      |  FROM grams WHERE len(g) >= 5)""".stripMargin
}
