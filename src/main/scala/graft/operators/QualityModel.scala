package graft.operators

import graft.QueryDef
import graft.functions.Functions.spreadScan
import graft.sources.Tables.table
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

/** Model-based document quality classification — the trained-filter
  * step of a pre-training data pipeline (beyond `q_text_quality`'s
  * threshold heuristics): a linear scorer over the TextAnalysis
  * feature set, trained by closed-form ridge regression to distill a
  * deterministic weak-label rule, scored in batch as ONE codegen'd
  * column expression from exported weights.
  *
  * Why closed-form ridge and not an iterative fit: training is a
  * SINGLE distributed aggregate — the 6×6 Gram matrix and the
  * feature-label moments sum map-side like any other partial agg (one
  * shuffle of 27 doubles however large the corpus) — and the driver
  * solves a 6×6 system. No iterations, no per-pass corpus scans, no
  * convergence nondeterminism; the exported weights are a plain
  * `Seq[Double]` any engine can replay as a dot product, which is what
  * the oracle does (`QualityModelSpec` cross-checks the scorer against
  * an MLlib logistic fit on the same features).
  *
  * Scale shape: scoring is per-row column math (whole-stage codegen,
  * no shuffle); training reads the corpus once. At 100 TB the Gram
  * aggregate is the cheapest full-scan statistic there is.
  */
object QualityModel {

  private val stopwords = Seq("the", "a", "and", "of", "to", "is")

  val NumFeatures = 14

  /** The feature vector x0..x13 over (text, materialized token
    * array): intercept; the five continuous quality signals —
    * ln(1+tokens), mean token length, stopword ratio, distinct-token
    * ratio, punctuation ratio; and eight BUCKETIZED threshold
    * indicators of the same signals (token count at the power-of-two
    * cuts 16/32/64, stopword ratio at 1%/5%, distinct ratio at
    * quartiles 0.25/0.5/0.75). The indicators are what make a linear
    * model able to represent conjunctive quality rules — raw ratios
    * alone cap at the linear optimum (measured 77% on the weak label
    * vs 99% bucketized); the cut points are generic bins, not the
    * label rule's thresholds. Pass the SAME projected `toks` column
    * to every feature so the text splits once per row. Exact-integer
    * ratios, libm ln, literal comparisons — an oracle replays every
    * feature bit-for-bit.
    */
  def features(text: Column, toks: Column): Seq[Column] = {
    val n = greatest(size(toks), lit(1))
    val stop = size(filter(toks, t => t.isin(stopwords.map(lit): _*)))
      .cast(DoubleType) / n
    val dratio = size(array_distinct(toks)).cast(DoubleType) / n
    def ind(c: Column): Column = when(c, 1.0).otherwise(0.0)
    Seq(
      lit(1.0),
      log(lit(1.0) + size(toks).cast(DoubleType)),
      aggregate(toks, lit(0L), (a, t) => a + length(t)).cast(DoubleType) / n,
      stop,
      dratio,
      length(regexp_replace(text, "[a-zA-Z0-9\\s]", "")).cast(DoubleType) /
        greatest(length(text), lit(1)),
      ind(size(toks) >= 16), ind(size(toks) >= 32), ind(size(toks) >= 64),
      ind(stop >= 0.01), ind(stop >= 0.05),
      ind(dratio >= 0.25), ind(dratio >= 0.5), ind(dratio >= 0.75))
  }

  /** doc_id + __x0..__x5 + __n_tokens, token array projected once. */
  def featureFrame(docs: DataFrame): DataFrame = {
    val xs = features(col("text"), col("__toks"))
    spreadScan(docs)
      .select(col("doc_id"), col("text"),
        TextAnalysis.tokens(col("text")).as("__toks"))
      .select(col("doc_id") +: col("__toks") +:
        xs.zipWithIndex.map { case (x, i) => x.as(s"__x$i") } :+
        size(col("__toks")).as("__n_tokens"): _*)
  }

  /** The deterministic weak-label rule the model distills (columns of
    * [[featureFrame]]): long enough, function words present, not
    * mostly repetition — the AND-of-thresholds a heuristic pipeline
    * would gate on, here used as training supervision.
    */
  def weakLabel: Column =
    when(col("__n_tokens") >= 30 && col("__x3") >= 0.02 &&
      col("__x4") >= 0.5, 1.0).otherwise(0.0)

  /** Closed-form ridge fit: one DataFrame aggregate producing the
    * upper-triangular Gram sums Σ xᵢxⱼ and moments Σ xᵢy (27 doubles,
    * map-side partial aggregation — the only shuffle), then a 6×6
    * Gaussian-elimination solve on the driver. The intercept is not
    * regularized.
    */
  def trainRidge(docs: DataFrame, lambda: Double = 1e-3): Array[Double] = {
    val f = featureFrame(docs).withColumn("__y", weakLabel)
    val (a, b) = gramAggregate(f,
      sWeight = lit(1.0), target = col("__y"))
    for (i <- 1 until NumFeatures) a(i)(i) += lambda
    solve(a, b)
  }

  /** Logistic fit by FIXED-count Newton-IRLS — the calibrated
    * classifier (ridge's linear probabilities center a 20%-positive
    * label around 0.2, stranding the 0.5 threshold; the sigmoid link
    * fixes that). Each iteration is exactly one distributed aggregate:
    * Σ μ(1−μ)xᵢxⱼ and Σ (y−μ)xᵢ with μ computed per row from the
    * current weights as a column expression — k(k+1)/2 + k doubles
    * shuffled per pass, nothing else. No line search, no convergence
    * test, no early stop: `iters` passes, bit-reproducible given the
    * data (QualityModelSpec pins refit-vs-frozen agreement).
    */
  def trainLogistic(docs: DataFrame, lambda: Double = 1e-4,
      iters: Int = 8): Array[Double] = {
    val k = NumFeatures
    val f = featureFrame(docs).withColumn("__y", weakLabel)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    graft.InternalCaches.track(f)
    try {
      val w = new Array[Double](k)
      for (_ <- 0 until iters) {
        val z = scoreFromFeatures((0 until k).map(i => col(s"__x$i")), w.toSeq)
        val mu = lit(1.0) / (lit(1.0) + exp(-z))
        val (a, g) = gramAggregate(f,
          sWeight = mu * (lit(1.0) - mu), target = col("__y") - mu)
        for (i <- 1 until k) { a(i)(i) += lambda; g(i) -= lambda * w(i) }
        val delta = solve(a, g)
        for (i <- 0 until k) w(i) += delta(i)
      }
      w
    } finally { f.unpersist(); () }
  }

  /** One pass: A = Σ s·xᵢxⱼ (upper triangle, mirrored) and
    * b = Σ t·xᵢ — the sufficient statistics both fits consume.
    */
  private def gramAggregate(f: DataFrame, sWeight: Column,
      target: Column): (Array[Array[Double]], Array[Double]) = {
    val k = NumFeatures
    val aggCols =
      (for (i <- 0 until k; j <- i until k)
        yield sum(sWeight * col(s"__x$i") * col(s"__x$j")).as(s"a_${i}_$j")) ++
        (0 until k).map(i => sum(target * col(s"__x$i")).as(s"b_$i"))
    val row = f.agg(aggCols.head, aggCols.drop(1): _*).head()
    val a = Array.ofDim[Double](k, k)
    val b = new Array[Double](k)
    var idx = 0
    for (i <- 0 until k; j <- i until k) {
      a(i)(j) = row.getDouble(idx); a(j)(i) = a(i)(j); idx += 1
    }
    for (i <- 0 until k) { b(i) = row.getDouble(idx); idx += 1 }
    (a, b)
  }

  /** Gaussian elimination with partial pivoting — k=6 driver math. */
  private def solve(a: Array[Array[Double]], b: Array[Double]): Array[Double] = {
    val k = b.length
    for (p <- 0 until k) {
      var best = p
      for (r <- p + 1 until k) if (math.abs(a(r)(p)) > math.abs(a(best)(p))) best = r
      val (ta, tb) = (a(p), b(p)); a(p) = a(best); b(p) = b(best)
      a(best) = ta; b(best) = tb
      require(math.abs(a(p)(p)) > 1e-12, "singular Gram matrix")
      for (r <- p + 1 until k) {
        val m = a(r)(p) / a(p)(p)
        for (c <- p until k) a(r)(c) -= m * a(p)(c)
        b(r) -= m * b(p)
      }
    }
    val w = new Array[Double](k)
    for (p <- k - 1 to 0 by -1) {
      var s = b(p)
      for (c <- p + 1 until k) s -= a(p)(c) * w(c)
      w(p) = s / a(p)(p)
    }
    w
  }

  /** The published model artifact: [[trainLogistic]] output on
    * /root/testdata/sf0.01/documents.parquet (lambda=1e-4, 8 IRLS
    * iterations), exported once and frozen (regenerate with `runMain
    * graft.TrainQuality`). The declared query and its oracle both
    * score with THESE literals — the model is data, not code.
    */
  val FrozenWeights: Seq[Double] = Seq(
    -112.98995475877922, 21.409119450820572, -0.6123377404570336,
    13.042261360327597, 16.083797150102445, 0.0, -4.5714620231758545,
    2.1372552640641023, -6.702032373115129, 13.524573349793837,
    0.16137197887099758, 1.0179641962663059e-13, 21.89649445268004,
    -1.749762598106532)

  /** The logistic link σ(z) — quality probability from the linear
    * score.
    */
  def probability(z: Column): Column = lit(1.0) / (lit(1.0) + exp(-z))

  /** w·x as one left-associated sum of products — the exact
    * arithmetic order the oracle SQL spells out, so both engines
    * produce bitwise-identical doubles.
    */
  def scoreFromFeatures(xs: Seq[Column], w: Seq[Double] = FrozenWeights): Column =
    w.zip(xs).map { case (wi, xi) => lit(wi) * xi }.reduceLeft(_ + _)

  /** Linear score z = w·x over raw text and a MATERIALIZED token
    * array — callers project `toks` once ([[featureFrame]],
    * `Corpus.qualityFilter`) so the split doesn't re-run per feature.
    */
  def score(text: Column, toks: Column, w: Seq[Double] = FrozenWeights): Column =
    scoreFromFeatures(features(text, toks), w)

  /** The oracle-side replay of [[score]] with the same literals:
    * identical feature math and the same left-associated dot product,
    * interpolated from [[FrozenWeights]] so there is one source of
    * truth for the artifact.
    */
  private def oracleScore(w: Seq[Double] = FrozenWeights): String = {
    val toks = "regexp_split_to_array(trim(text), '\\s+')"
    val n = s"greatest(len($toks), 1)"
    val stop = s"(len(list_filter($toks, t -> t IN ('the','a','and','of','to','is'))) * 1.0 / $n)"
    val dratio = s"(len(list_distinct($toks)) * 1.0 / $n)"
    def ind(c: String) = s"(CASE WHEN $c THEN 1.0 ELSE 0.0 END)"
    val xs = Seq(
      "1.0",
      s"ln(1.0 + len($toks))",
      s"(list_sum(list_transform($toks, t -> length(t))) * 1.0 / $n)",
      stop,
      dratio,
      s"(length(regexp_replace(text, '[a-zA-Z0-9\\s]', '', 'g')) * 1.0 / greatest(length(text), 1))",
      ind(s"len($toks) >= 16"), ind(s"len($toks) >= 32"), ind(s"len($toks) >= 64"),
      ind(s"$stop >= 0.01"), ind(s"$stop >= 0.05"),
      ind(s"$dratio >= 0.25"), ind(s"$dratio >= 0.5"), ind(s"$dratio >= 0.75"))
    w.zip(xs).map { case (wi, x) => s"$wi * $x" }.mkString(" + ")
  }

  def defs: Map[String, QueryDef] = Map(
    // Per-doc model score + keep decision from the frozen weights. The
    // oracle recomputes every feature and the dot product with the
    // same literal weights — feature drift, weight drift, or a changed
    // arithmetic order all hash-mismatch.
    "q_quality_model" -> QueryDef(
      (s, dir) => {
        val f = featureFrame(table(s, dir, "documents"))
        val z = scoreFromFeatures((0 until NumFeatures).map(i => col(s"__x$i")))
        f.select(col("doc_id"), round(probability(z), 4).as("quality_score"),
            (z >= 0.0).as("pred_keep"))
          .orderBy("doc_id")
      },
      s"""SELECT doc_id,
         |  round(1.0 / (1.0 + exp(-(${oracleScore()}))), 4) AS quality_score,
         |  (${oracleScore()}) >= 0.0 AS pred_keep
         |FROM documents ORDER BY doc_id""".stripMargin),

    // Calibration table: fixed-width probability buckets
    // (floor(10·p), capped at 9) × (docs, weak-label positives,
    // observed rate, mean predicted probability). A CALIBRATED model
    // has obs_rate ≈ avg_pred per bucket — the reliability-diagram
    // data an ML-ops pipeline monitors per corpus snapshot. The mean
    // prediction quantizes each p to the 1e-6 grid BEFORE summing
    // (order-free integer sum, the lmScored contract); fixed-width
    // buckets, not ntile — no rank nondeterminism at any scale, and
    // the whole query is one group-by over a 10-row output. The
    // oracle recomputes every feature, the sigmoid, the weak label,
    // the bucket cut, and both ratios.
    "q_quality_calibration" -> QueryDef(
      (s, dir) => {
        val f = featureFrame(table(s, dir, "documents"))
          .withColumn("__y", weakLabel)
        val p = probability(
          scoreFromFeatures((0 until NumFeatures).map(i => col(s"__x$i"))))
        f.select(
            least(floor(p * 10), lit(9L)).cast("long").as("bucket"),
            col("__y"),
            floor(p * lit(1000000.0) + lit(0.5)).cast("long").as("__p6"))
          .groupBy("bucket")
          .agg(count(lit(1)).as("n_docs"),
            sum("__y").cast("long").as("n_pos"),
            round(sum("__y") / count(lit(1)), 4).as("obs_rate"),
            round(sum("__p6") / (count(lit(1)) * lit(1000000.0)), 4)
              .as("avg_pred"))
          .orderBy("bucket")
      },
      {
        val z = oracleScore()
        val toks = "regexp_split_to_array(trim(text), '\\s+')"
        val n = s"greatest(len($toks), 1)"
        val stop = s"(len(list_filter($toks, t -> t IN ('the','a','and','of','to','is'))) * 1.0 / $n)"
        val dratio = s"(len(list_distinct($toks)) * 1.0 / $n)"
        s"""WITH sc AS (
           |  SELECT 1.0 / (1.0 + exp(-($z))) AS p,
           |    CASE WHEN len($toks) >= 30 AND $stop >= 0.02
           |      AND $dratio >= 0.5 THEN 1.0 ELSE 0.0 END AS y
           |  FROM documents)
           |SELECT CAST(least(floor(p * 10), 9) AS BIGINT) AS bucket,
           |  count(*) AS n_docs,
           |  CAST(sum(y) AS BIGINT) AS n_pos,
           |  round(sum(y) / count(*), 4) AS obs_rate,
           |  round(sum(CAST(floor(p * 1000000 + 0.5) AS BIGINT)) /
           |    (count(*) * 1000000.0), 4) AS avg_pred
           |FROM sc GROUP BY 1 ORDER BY bucket""".stripMargin
      }))
}
