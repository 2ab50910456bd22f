package graft.operators

import graft.QueryDef
import graft.functions.Functions.spreadScan
import graft.functions.FloatDotProduct.fdot
import graft.sources.Tables.table
import org.apache.spark.sql.{Column, DataFrame, SaveMode}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.sql.expressions.Window

/** Approximate-nearest-neighbor search over an embedding column.
  *
  * Two paths:
  *  - brute-force top-k: the query side is broadcast (a query set is
  *    always dim-table-sized), the corpus streams — one pass, no
  *    shuffle of the corpus, exact results. This is the baseline and
  *    the verification oracle.
  *  - random-hyperplane LSH: corpus is bucketed by a b-bit signature
  *    (one groupBy-free map pass), queries probe only their own
  *    bucket — candidate count drops ~2^b-fold; recall is tunable via
  *    multi-probe (signature Hamming-1 neighbors). This is the 100 TB
  *    path: bucket keys partition the corpus so each query touches a
  *    bounded slice.
  */
object Similarity {

  /** Deterministic random hyperplanes (seed 42): NumPlanes × dim. */
  def hyperplanes(numPlanes: Int, dim: Int): Array[Array[Double]] = {
    val rnd = new scala.util.Random(42)
    Array.fill(numPlanes)(Array.fill(dim)(rnd.nextGaussian()))
  }

  /** The hyperplanes as a SQL list-of-lists literal (Double.toString
    * round-trips exactly, so an external engine rebuilds bit-identical
    * planes — the embed-the-constants pattern that makes q_ann_lsh
    * oracle-checkable).
    */
  def planesLit(numPlanes: Int = 8, dim: Int = 64): String =
    hyperplanes(numPlanes, dim)
      .map(_.mkString("[", ",", "]")).mkString("[", ",", "]")

  /** b-bit random-hyperplane signature of a float-array column — one
    * codegen'd `fdot` per plane (float×double, exact vs the oracle's
    * double math); the interpreted zip_with/aggregate formulation cost
    * planes×dim boxed lambda steps per corpus row.
    */
  def lshSignature(v: Column, planes: Array[Array[Double]]): Column =
    planes.zipWithIndex.map { case (p, i) =>
      when(fdot(v, typedlit(p.toSeq)) >= 0, lit(1L << i)).otherwise(0L)
    }.reduce((a, b) => a.bitwiseOR(b))

  /** Exact brute-force top-k: broadcast query set × streamed corpus.
    * Norms are precomputed per row — each pair then costs one dot
    * product, not three.
    *
    * The shape generalizes past self-exclusion: `carryQuery` /
    * `carryCorpus` alias extra columns onto each side (corpus carries
    * surface in the output), and `pair` overrides the join predicate —
    * `q_hard_negatives` is this exact pipeline with labels carried and
    * a label-mismatch predicate, so the scoring/rank/round contract
    * lives in ONE place.
    */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame, k: Int,
      carryQuery: Seq[(String, String)] = Nil,
      carryCorpus: Seq[(String, String)] = Nil,
      pair: Option[Column] = None): DataFrame = {
    val q = queries.select(col("vec_id").as("query_id") +:
        col("embedding").as("q_v") +:
        carryQuery.map { case (s, d) => col(s).as(d) }: _*)
      .withColumn("q_norm", sqrt(fdot(col("q_v"), col("q_v"))))
    val c = spreadScan(corpus.select(col("vec_id").as("neighbor_id") +:
        col("embedding").as("c_v") +:
        carryCorpus.map { case (s, d) => col(s).as(d) }: _*))
      .withColumn("c_norm", sqrt(fdot(col("c_v"), col("c_v"))))
    val w = Window.partitionBy("query_id")
      .orderBy(col("cos_raw").desc, col("neighbor_id"))
    val carried = carryCorpus.map(t => col(t._2))
    c.join(broadcast(q),
        pair.getOrElse(col("query_id") =!= col("neighbor_id")))
      .select(Seq(col("query_id"), col("neighbor_id")) ++ carried :+
        (fdot(col("q_v"), col("c_v")) /
          (col("q_norm") * col("c_norm"))).as("cos_raw"): _*)
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(Seq(col("query_id"), col("neighbor_id")) ++ carried :+
        round(col("cos_raw"), 4).as("cos"): _*)
  }

  /** LSH-bucketed top-k: candidates limited to the query's signature
    * bucket plus its Hamming-1 probes (recall/cost dial = numPlanes &
    * probe radius).
    */
  def lshTopK(corpus: DataFrame, queries: DataFrame, k: Int,
      numPlanes: Int = 8, dim: Int = 64): DataFrame = {
    val planes = hyperplanes(numPlanes, dim)
    val sig = lshSignature(col("embedding"), planes)
    val c = spreadScan(corpus.select(col("vec_id").as("neighbor_id"),
        col("embedding").as("c_v"), sig.as("bucket")))
      .withColumn("c_norm", sqrt(fdot(col("c_v"), col("c_v"))))
    // multi-probe: each query probes its bucket and all Hamming-1 buckets
    val probes = array(lit(0L) +: (0 until numPlanes).map(i => lit(1L << i)): _*)
    val q = queries.select(col("vec_id").as("query_id"),
      col("embedding").as("q_v"), sig.as("q_sig"))
      .withColumn("q_norm", sqrt(fdot(col("q_v"), col("q_v"))))
      .select(col("query_id"), col("q_v"), col("q_norm"),
        explode(transform(probes, m => col("q_sig").bitwiseXOR(m))).as("bucket"))
    val w = Window.partitionBy("query_id")
      .orderBy(col("cos_raw").desc, col("neighbor_id"))
    q.join(c, Seq("bucket"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        (fdot(col("q_v"), col("c_v")) / (col("q_norm") * col("c_norm"))).as("cos_raw"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"),
        round(col("cos_raw"), 4).as("cos"))
  }

  // ---- IVF (inverted-file) index --------------------------------------

  /** Deterministic coarse quantizer WITHOUT a corpus count: the k
    * corpus vectors with the smallest md5(vec_id) hex strings — a
    * uniform deterministic sample (the same md5 trick as
    * `Sampling.hashFraction`) fetched by ONE TakeOrderedAndProject job
    * (per-partition top-k, driver merge; no count() pre-pass, no full
    * sort, no dense-vec_id assumption). Centroid ids are the 0..k-1
    * rank in hash order, so an external engine rebuilds the identical
    * index via `ORDER BY md5(vec_id) LIMIT k`.
    */
  def hashCentroids(corpus: DataFrame, k: Int): Seq[(Long, Seq[Double])] =
    corpus.select(md5(col("vec_id").cast("string")).as("hk"), col("embedding"))
      .orderBy("hk")
      .limit(k)
      .collect()
      .sortBy(_.getString(0))
      .zipWithIndex
      .map { case (r, i) => (i.toLong, r.getSeq[Float](1).map(_.toDouble): Seq[Double]) }
      .toSeq

  /** Nearest-centroid id for a vector against broadcast centroid
    * literals: one codegen'd `fdot` per centroid, argmin over
    * (−score, id) structs via `least` — struct ordering is
    * lexicographic, so ties go to the smaller centroid id, matching
    * the oracle's `ORDER BY dot DESC, centroid_id`. The previous
    * aggregate/zip_with formulation evaluated interpreted (per corpus
    * row: k×dim boxed lambda steps) and dominated the whole IVF run;
    * the double math is unchanged — float→double is exact, products
    * accumulate in index order on both paths.
    */
  private def nearestCentroid(v: Column, centroids: Seq[(Long, Seq[Double])]): Column = {
    val scored = centroids.map { case (id, c) =>
      struct((lit(0.0) - fdot(v, typedlit(c))).as("neg_score"), lit(id).as("id"))
    }
    least(scored: _*).getField("id")
  }

  /** Top-`p` centroid ids by dot product (the IVF nprobe dial): score
    * every centroid with codegen'd `fdot`, sort the (−score, id)
    * struct array, slice p, project ids — one array expression, no
    * shuffle. The sort/slice lambdas are interpreted but run only on
    * the query panel (dim-table-sized), never the corpus.
    */
  private def nearestCentroids(v: Column, centroids: Seq[(Long, Seq[Double])],
      p: Int): Column = {
    val scored = array(centroids.map { case (id, c) =>
      struct((lit(0.0) - fdot(v, typedlit(c))).as("neg_score"), lit(id).as("id"))
    }: _*)
    transform(slice(array_sort(scored), 1, p), s => s.getField("id"))
  }

  // ---- k-means (Lloyd) centroid refinement ----------------------------

  /** Quantization scale for the deterministic centroid mean: dims are
    * rounded to 1/2^20 before summation. x·2^20 is a power-of-two
    * scale (exact in double); the per-dim integer sums are then
    * associative — the SAME centroid falls out at any partitioning,
    * with map-side partial combine, where a double `avg` would leak
    * summation order into the low bits and break engine parity.
    */
  val MeanQ = 1048576L

  /** Lloyd refinement of the hash centroids, `iters` iterations of
    * (assign via codegen'd dot / argmax, recompute quantized means).
    * Each iteration is ONE job with broadcast centroid literals plus a
    * k×dim-row collect (k=16, dim=64 → 1 k rows) — the standard
    * scalable k-means shape. With `sampleFrac < 1` the refinement runs
    * on a deterministic md5-fraction sample (`Sampling.hashFraction`
    * on vec_id): iters passes over frac·n rows instead of n — the
    * 100 TB shape — and the single FULL corpus pass stays where it
    * always was, in `probeTopK`'s index-build assignment. Empty lists
    * keep their old centroid. Centroid dims are s/(n·2^20) computed in
    * IEEE double — bit-identical on any engine, so the whole
    * refinement (sample membership included) is oracle-replayable.
    */
  def kmeansCentroids(corpus: DataFrame, k: Int,
      iters: Int, sampleFrac: Double = 1.0): Seq[(Long, Seq[Double])] = {
    var cents: Seq[(Long, Seq[Double])] = hashCentroids(corpus, k)
    val train =
      if (sampleFrac >= 1.0) corpus
      else corpus.filter(Sampling.hashFraction(col("vec_id")) < sampleFrac)
    for (_ <- 0 until iters) {
      val sums = train.select(col("vec_id"), col("embedding"))
        .withColumn("list_id", nearestCentroid(col("embedding"), cents))
        .select(col("list_id"), posexplode(col("embedding")).as(Seq("pos", "x")))
        .groupBy("list_id", "pos")
        .agg(sum(floor(col("x").cast(DoubleType) * MeanQ + lit(0.5))).as("s"),
          count(lit(1)).as("n"))
        .collect()
      val byList = sums.groupBy(_.getLong(0))
      cents = cents.map { case (id, old) =>
        byList.get(id).map { rows =>
          val dims = rows.sortBy(_.getInt(1)).map(r =>
            r.getLong(2).toDouble / (r.getLong(3) * MeanQ).toDouble)
          (id, dims.toSeq)
        }.getOrElse((id, old))
      }
    }
    cents
  }

  /** IVF top-k: corpus vectors are assigned to their nearest centroid
    * list once (the index build — a narrow map pass); each query scans
    * its `nprobe` nearest lists (recall/cost dial). At 100 TB the
    * lists are the partition keys, so a query touches nprobe/k of the
    * corpus.
    */
  def ivfTopK(corpus: DataFrame, queries: DataFrame, k: Int,
      numLists: Int = 16, nprobe: Int = 1,
      carryQuery: Seq[(String, String)] = Nil,
      carryCorpus: Seq[(String, String)] = Nil,
      pair: Option[Column] = None): DataFrame =
    probeTopK(corpus, queries, hashCentroids(corpus, numLists), k, nprobe,
      carryQuery, carryCorpus, pair)

  /** IVF with Lloyd-refined centroids (see kmeansCentroids) — same
    * probe, better-balanced lists than the raw hash quantizer.
    */
  def kmeansTopK(corpus: DataFrame, queries: DataFrame, k: Int,
      numLists: Int = 16, iters: Int = 2, nprobe: Int = 1,
      sampleFrac: Double = 1.0): DataFrame =
    probeTopK(corpus, queries,
      kmeansCentroids(corpus, numLists, iters, sampleFrac), k, nprobe)

  /** IVF probe with CALLER-SUPPLIED centroids — the frozen-quantizer
    * path (replaying a sidecar's centroids against a fresh corpus,
    * e.g. to verify an appended index).
    */
  def ivfTopKWithCentroids(corpus: DataFrame, queries: DataFrame,
      cents: Seq[(Long, Seq[Double])], k: Int, nprobe: Int = 1): DataFrame =
    probeTopK(corpus, queries, cents, k, nprobe)

  private def probeTopK(corpus: DataFrame, queries: DataFrame,
      cents: Seq[(Long, Seq[Double])], k: Int, nprobe: Int,
      carryQuery: Seq[(String, String)] = Nil,
      carryCorpus: Seq[(String, String)] = Nil,
      pair: Option[Column] = None): DataFrame = {
    val c = spreadScan(corpus.select(col("vec_id").as("neighbor_id") +:
        col("embedding").as("c_v") +:
        carryCorpus.map { case (s, d) => col(s).as(d) }: _*))
      .withColumn("list_id", nearestCentroid(col("c_v"), cents))
      .withColumn("c_norm", sqrt(fdot(col("c_v"), col("c_v"))))
    probeAssigned(c, queries, cents, k, nprobe, carryQuery, carryCorpus, pair)
  }

  /** The probe half of IVF against an ALREADY-ASSIGNED corpus frame
    * (neighbor_id, c_v, c_norm, list_id) — fresh from [[probeTopK]]'s
    * map pass or read back from a persisted index, where the encode
    * cost is already paid.
    */
  private def probeAssigned(c: DataFrame, queries: DataFrame,
      cents: Seq[(Long, Seq[Double])], k: Int, nprobe: Int,
      carryQuery: Seq[(String, String)] = Nil,
      carryCorpus: Seq[(String, String)] = Nil,
      pair: Option[Column] = None): DataFrame = {
    val q = queries.select(col("vec_id").as("query_id") +:
        col("embedding").as("q_v") +:
        carryQuery.map { case (s, d) => col(s).as(d) }: _*)
      .withColumn("list_id",
        explode(nearestCentroids(col("q_v"), cents, nprobe)))
      .withColumn("q_norm", sqrt(fdot(col("q_v"), col("q_v"))))
    val w = Window.partitionBy("query_id")
      .orderBy(col("cos_raw").desc, col("neighbor_id"))
    val carried = carryCorpus.map(t => col(t._2))
    q.join(c, Seq("list_id"))
      .filter(pair.getOrElse(col("query_id") =!= col("neighbor_id")))
      .select(Seq(col("query_id"), col("neighbor_id")) ++ carried :+
        (fdot(col("q_v"), col("c_v")) / (col("q_norm") * col("c_norm"))).as("cos_raw"): _*)
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(Seq(col("query_id"), col("neighbor_id")) ++ carried :+
        round(col("cos_raw"), 4).as("cos"): _*)
  }

  // ---- IVF-PQ (product quantization, inner-product metric) ------------

  /** LUT quantization grid: ADC table entries are rounded to 1/2^20
    * before the 8-way sum, making the per-pair score an INTEGER sum —
    * associative, so Spark's left-to-right expression and any SQL
    * engine's aggregate produce the same bits regardless of order.
    * Production ADC does the same thing harder (FAISS quantizes the
    * LUT to int8 for SIMD); this grid keeps ~6 decimal digits.
    */
  val LutQ: Long = MeanQ

  /** The per-subspace dot-product arrays (one 16-double array per
    * subspace m: dot of the m-th embedding slice against every
    * codebook entry) — computed ONCE per row and reused for BOTH the
    * coarse list assignment and the per-subspace codes. Because the
    * codebooks are slices of the coarse centroids, the full-width dot
    * is exactly the sum of these subspace dots; deriving the coarse
    * argmax from the same arrays halves the encoding math (no second
    * 64-dim dot pass) at the cost of a different (but deterministic,
    * left-associated, oracle-mirrored) float summation order.
    */
  private def subDotArrays(v: Column, sub: Int,
      books: Seq[Seq[(Long, Seq[Double])]]): Seq[Column] =
    books.zipWithIndex.map { case (book, m) =>
      array(book.map { case (_, c) =>
        fdot(slice(v, m * sub + 1, sub), typedlit(c))
      }: _*)
    }

  /** Full-width score of entry j: the subspace dots summed left to
    * right — the association the oracle replays term by term.
    */
  private def sumScore(pfx: String, numSubspaces: Int)(j: Int): Column =
    (0 until numSubspaces).map(m =>
      element_at(col(s"$pfx$m"), j + 1)).reduce(_ + _)

  /** IVF-PQ top-k — the FAISS-style 100 TB ANN shape: a coarse
    * quantizer partitions the corpus into inverted lists (the shuffle/
    * storage key), and within a list candidates are ranked by
    * PRODUCT-QUANTIZED approximate inner product: each vector is
    * stored as M small codes (one per dim/M-wide subspace, argmax
    * inner product against that subspace's codebook), and a query
    * scores a candidate by summing M lookup-table entries instead of
    * computing a dim-wide dot product. At 100 TB the corpus holds
    * M bytes per vector instead of 4·dim — the codes column IS the
    * compressed index — and the scan does M integer lookups per
    * candidate.
    *
    * Determinism contract (what makes q_ann_pq oracle-replayable):
    * coarse centroids AND subspace codebooks both come from
    * `hashCentroids` (md5-rank sample, one driver job, shared);
    * codebook m is the m-th slice of each sampled vector. The coarse
    * score is the LEFT-ASSOCIATED sum of the 8 subspace dots (not a
    * single 64-dim accumulation — the oracle sums the same terms in
    * the same order), code assignment compares RAW double dots (ties
    * → smaller code); LUT entries are quantized to 1/2^20 (`LutQ`) so
    * the ADC sum is an associative integer sum; ranking orders by
    * that integer (desc, then neighbor_id). Every step replays in
    * portable SQL.
    */
  private def pqBooks(cents: Seq[(Long, Seq[Double])], numSubspaces: Int,
      dim: Int): Seq[Seq[(Long, Seq[Double])]] = {
    val sub = dim / numSubspaces
    (0 until numSubspaces).map(m =>
      cents.map { case (j, c) => (j, c.slice(m * sub, m * sub + sub)) })
  }

  private def argmaxList(pfx: String, cents: Seq[(Long, Seq[Double])],
      numSubspaces: Int): Column =
    least(cents.map { case (j, _) =>
      struct((lit(0.0) - sumScore(pfx, numSubspaces)(j.toInt)).as("neg"),
        lit(j).as("id"))
    }: _*).getField("id")

  /** Encode the corpus into the compressed IVF-PQ index:
    * (vec_id, code0..codeM-1, list_id). The subspace-dot arrays are
    * computed once per row; the coarse assignment is their sum-argmax
    * and each code the per-subspace argmax — one narrow codegen'd map
    * pass, and the full embedding is DROPPED after encoding (the PQ
    * memory win).
    */
  def pqEncode(corpus: DataFrame, cents: Seq[(Long, Seq[Double])],
      numSubspaces: Int = 8, dim: Int = 64): DataFrame = {
    require(dim % numSubspaces == 0, "dim must divide into subspaces")
    val sub = dim / numSubspaces
    val books = pqBooks(cents, numSubspaces, dim)
    val withD = subDotArrays(col("c_v"), sub, books).zipWithIndex.foldLeft(
      spreadScan(corpus.select(col("vec_id"), col("embedding").as("c_v")))
    ) { case (df, (a, m)) => df.withColumn(s"__d$m", a) }
    (0 until numSubspaces).foldLeft(
      withD.withColumn("list_id", argmaxList("__d", cents, numSubspaces))) {
      (df, m) =>
        df.withColumn(s"code$m", least(books(m).map { case (j, _) =>
          struct((lit(0.0) - element_at(col(s"__d$m"), j.toInt + 1)).as("neg"),
            lit(j.toInt).as("j"))
        }: _*).getField("j"))
    }.select(col("vec_id") +:
      (0 until numSubspaces).map(m => col(s"code$m")) :+ col("list_id"): _*)
  }

  /** ADC probe over an encoded index (`pqEncode` output — fresh or
    * read back from a persisted copy): queries run the same
    * subspace-dot machinery (so a query vector that is also a corpus
    * row assigns to the SAME list), probe their top-`nprobe` lists,
    * and rank candidates by the quantized integer LUT sum — no dot
    * products touch the index side.
    */
  def pqProbe(index: DataFrame, queries: DataFrame,
      cents: Seq[(Long, Seq[Double])], k: Int, numSubspaces: Int = 8,
      dim: Int = 64, nprobe: Int = 1): DataFrame = {
    require(dim % numSubspaces == 0, "dim must divide into subspaces")
    val sub = dim / numSubspaces
    val books = pqBooks(cents, numSubspaces, dim)
    val coded = index.select(col("list_id") +:
      col("vec_id").as("neighbor_id") +:
      (0 until numSubspaces).map(m => col(s"code$m")): _*)
    val qD = subDotArrays(col("q_v"), sub, books).zipWithIndex.foldLeft(
      queries.select(col("vec_id").as("query_id"), col("embedding").as("q_v"))) {
      case (df, (a, m)) => df.withColumn(s"__q$m", a)
    }
    val probeIds = transform(
      slice(array_sort(array(cents.map { case (j, _) =>
        struct((lit(0.0) - sumScore("__q", numSubspaces)(j.toInt)).as("neg"),
          lit(j).as("id"))
      }: _*)), 1, nprobe), s => s.getField("id"))
    val withLut = (0 until numSubspaces).foldLeft(
      qD.withColumn("list_id", explode(probeIds))) { (df, m) =>
      df.withColumn(s"lut$m", transform(col(s"__q$m"),
        d => floor(d * LutQ + lit(0.5)).cast(LongType)))
    }.select(col("list_id") +: col("query_id") +:
      (0 until numSubspaces).map(m => col(s"lut$m")): _*)
    // ADC: equi-join on the inverted list, score = Σ_m lut_m[code_m]
    // — a fixed-order integer expression, no dot products
    val score = (0 until numSubspaces).map(m =>
      element_at(col(s"lut$m"), col(s"code$m") + 1)).reduce(_ + _)
    val w = Window.partitionBy("query_id")
      .orderBy(col("adot_q").desc, col("neighbor_id"))
    withLut.join(coded, Seq("list_id"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"), score.as("adot_q"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"),
        round(col("adot_q").cast(DoubleType) / LutQ, 4).as("adot"))
  }

  def pqTopK(corpus: DataFrame, queries: DataFrame, k: Int,
      numLists: Int = 16, numSubspaces: Int = 8, dim: Int = 64,
      nprobe: Int = 1): DataFrame = {
    val cents = hashCentroids(corpus, numLists)
    pqProbe(pqEncode(corpus, cents, numSubspaces, dim), queries, cents, k,
      numSubspaces, dim, nprobe)
  }

  private def hadoopFs(spark: org.apache.spark.sql.SparkSession, dir: String) =
    new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sessionState.newHadoopConf())

  /** The version the LATEST pointer names, if the index exists. */
  private def pqLatestVersion(spark: org.apache.spark.sql.SparkSession,
      dir: String): Option[Long] = {
    val fs = hadoopFs(spark, dir)
    val p = new org.apache.hadoop.fs.Path(s"$dir/LATEST")
    if (!fs.exists(p)) None
    else {
      val in = fs.open(p)
      val text = try scala.io.Source.fromInputStream(in, "UTF-8").mkString
        finally in.close()
      Some(text.trim.toLong)
    }
  }

  /** Persist the IVF-PQ index: codes as parquet PARTITIONED BY the
    * inverted list (so a probe's list_id equi-join prunes to nprobe
    * directories — at 100 TB a query touches nprobe/numLists of the
    * index FILES, not just rows) plus a centroid sidecar whose header
    * records the build parameters and whose doubles round-trip
    * exactly, so the probe rebuilds bit-identical codebooks. Build
    * once, probe many — re-encoding the corpus per query panel is the
    * cost this removes.
    *
    * PUBLICATION is versioned: each build lands complete under
    * `v<N>/`, and the one-file LATEST pointer flips only after both
    * codes and sidecar are down — a crash mid-rebuild leaves readers
    * on the previous complete version, never on new codes with stale
    * centroids. The version before the new one is retained for
    * readers that pinned it mid-probe; older ones are pruned.
    * Single-writer contract (like any snapshot-pointer table).
    */
  def writePqIndex(corpus: DataFrame, dir: String, numLists: Int = 16,
      numSubspaces: Int = 8, dim: Int = 64): Unit = {
    val spark = corpus.sparkSession
    val v = pqLatestVersion(spark, dir).getOrElse(0L) + 1
    val cents = hashCentroids(corpus, numLists)
    // base rows sit at −1 in the version's maintenance log: any
    // tombstone masks them, any append outranks them
    pqEncode(corpus, cents, numSubspaces, dim)
      .withColumn("batch", lit(-1L))
      .write.mode(SaveMode.Overwrite).partitionBy("list_id")
      .parquet(s"$dir/v$v/codes")
    val fs = hadoopFs(spark, dir)
    def writeFile(path: String, content: String): Unit = {
      val out = fs.create(new org.apache.hadoop.fs.Path(path), true)
      try out.write(content.getBytes("UTF-8")) finally out.close()
    }
    writeFile(s"$dir/v$v/centroids.tsv",
      pqSidecarText(cents, numSubspaces, dim))
    writeFile(s"$dir/LATEST", v.toString) // the publication point
    for (old <- 1L until v - 1)
      fs.delete(new org.apache.hadoop.fs.Path(s"$dir/v$old"), true)
  }

  /** The centroid sidecar + build params of a persisted index's
    * current version.
    */
  def readPqSidecar(spark: org.apache.spark.sql.SparkSession, dir: String)
      : (Seq[(Long, Seq[Double])], Int, Int) = {
    val v = pqLatestVersion(spark, dir).getOrElse(
      throw new IllegalStateException(s"no LATEST pointer under $dir"))
    parsePqSidecar(readTextFile(spark, s"$dir/v$v/centroids.tsv"))
  }

  private def parsePqSidecar(text: String)
      : (Seq[(Long, Seq[Double])], Int, Int) = {
    val lines = text.split("\n").toSeq.filter(_.nonEmpty)
    val params = lines.head.stripPrefix("#pq ").split(" ")
      .map { kv => val Array(k, n) = kv.split("="); k -> n.toInt }.toMap
    val cents = lines.tail.map { line =>
      val Array(id, dims) = line.split("\t", 2)
      (id.toLong, dims.split(",").toSeq.map(_.toDouble))
    }
    val dim = params("dim")
    require(cents.forall(_._2.length == dim),
      s"sidecar centroids disagree with dim=$dim")
    (cents, params("numSubspaces"), dim)
  }

  private def pqSidecarText(cents: Seq[(Long, Seq[Double])],
      numSubspaces: Int, dim: Int): String =
    (s"#pq numLists=${cents.size} numSubspaces=$numSubspaces dim=$dim" +:
      cents.map { case (id, c) => s"$id\t${c.mkString(",")}" })
      .mkString("\n")

  /** Append new vectors to the CURRENT version of a persisted index:
    * they are encoded against the FROZEN sidecar centroids (codebooks
    * never move on append — the standard incremental-IVF contract;
    * quantization drift from a shifting corpus is what `writePqIndex`
    * rebuilds are for) and their codes land as new files inside the
    * existing list partitions, so probes see them immediately with no
    * rewrite of prior data. Batch single-writer semantics: an append
    * is not idempotent — a streaming caller wanting replay safety
    * lands each batch under its own subdirectory (the `BatchDirs`
    * pattern) or rebuilds periodically.
    *
    * `batchId` stamps the new code rows' position in the version's
    * maintenance log (base rows from a build or compaction sit at −1):
    * a tombstone at batch `b` masks only code rows from STRICTLY
    * EARLIER batches, so a delete-then-re-append of the same id —
    * [[deleteFromPqIndex]] at `b` plus an append at `b` — is an
    * upsert whose fresh codes survive their own tombstone, instead of
    * being silently hidden (and then physically dropped by
    * [[compactPqIndex]]) the way an orderless mask would.
    */
  def appendToPqIndex(newVecs: DataFrame, dir: String,
      batchId: Long = 0L): Unit = {
    require(batchId >= 0L,
      s"append batch ids start at 0 (base code rows sit at -1): $batchId")
    val spark = newVecs.sparkSession
    val (cents, numSubspaces, dim) = readPqSidecar(spark, dir)
    val v = pqLatestVersion(spark, dir).get
    pqEncode(newVecs, cents, numSubspaces, dim)
      .withColumn("batch", lit(batchId))
      .write.mode(SaveMode.Append).partitionBy("list_id")
      .parquet(s"$dir/v$v/codes")
  }

  /** Probe a persisted index. Subspace count and dim come FROM the
    * sidecar (a caller-supplied mismatch would read absent code
    * columns as nulls and rank garbage silently); the explicit schema
    * pins `list_id` to LONG (partition-dir inference would guess INT
    * and the cast would defeat partition pruning on the probe join).
    * Tombstoned ids ([[deleteFromPqIndex]]) mask out under the shared
    * log-ordered broadcast anti-join ([[maskTombstonesAt]]) — the
    * delete set is churn-sized, never corpus-sized, and only code rows
    * from batches STRICTLY BEFORE an id's latest tombstone die, so a
    * re-appended id keeps its fresh codes.
    */
  def probePqIndex(spark: org.apache.spark.sql.SparkSession, dir: String,
      queries: DataFrame, k: Int, nprobe: Int = 1): DataFrame = {
    val (cents, numSubspaces, dim) = readPqSidecar(spark, dir)
    val v = pqLatestVersion(spark, dir).get
    val codes = readPqCodes(spark, dir, v, numSubspaces)
    val live = maskTombstonesAt(spark, s"$dir/v$v/_tombstones", codes)
      .drop("batch")
    pqProbe(live, queries, cents, k, numSubspaces, dim, nprobe)
  }

  /** Code rows of one version, batch-stamped. `coalesce(batch, −1)`
    * self-heals layouts written before the log-ordered mask existed:
    * their files lack the column, the explicit schema reads it as
    * null, and −1 (the base-row position) restores the exact orderless
    * semantics those layouts were written under.
    */
  private def readPqCodes(spark: org.apache.spark.sql.SparkSession,
      dir: String, v: Long, numSubspaces: Int): DataFrame = {
    val schema = StructType(
      StructField("vec_id", LongType) +:
        (0 until numSubspaces).map(m => StructField(s"code$m", IntegerType)) :+
        StructField("batch", LongType) :+
        StructField("list_id", LongType))
    spark.read.schema(schema).parquet(s"$dir/v$v/codes")
      .withColumn("batch", coalesce(col("batch"), lit(-1L)))
  }

  /** Tombstone delete for the persisted PQ index — the
    * [[deleteIvfIncrement]] contract on the versioned layout: ids land
    * whole under the CURRENT version's `_tombstones/batch=<id>`
    * (underscore-prefixed, invisible to the codes read), every probe
    * masks them until [[compactPqIndex]] drops the code rows
    * physically. The mask is LOG-ORDERED (shared [[maskTombstonesAt]]):
    * a tombstone at batch `b` kills code rows from batches strictly
    * before `b` only — base rows sit at −1, so any delete masks them,
    * while an [[appendToPqIndex]] at `b` survives its own tombstone
    * (the upsert shape) and only dies under a LATER delete. Batch-dir
    * Overwrite makes redelivery idempotent; a replay against an
    * already-compacted version re-masks ids whose rows are gone — a
    * no-op by construction, so no horizon is needed on this layout
    * (each version starts tombstone-free).
    */
  def deleteFromPqIndex(spark: org.apache.spark.sql.SparkSession,
      dir: String, ids: DataFrame, batchId: Long): Unit = {
    val v = pqLatestVersion(spark, dir).getOrElse(
      throw new IllegalStateException(s"no LATEST pointer under $dir"))
    ids.select(col("vec_id"))
      .write.mode(SaveMode.Overwrite)
      .parquet(s"$dir/v$v/_tombstones/batch=$batchId")
  }

  /** Fold the current version's live codes (tombstones applied) into
    * `v<V+1>`, carry the immutable centroid sidecar forward, flip
    * `LATEST` — the [[writePqIndex]] publication discipline, so a
    * crash mid-compaction leaves readers on the previous complete
    * version. The version before the new one is retained for pinned
    * readers; older ones are pruned.
    */
  def compactPqIndex(spark: org.apache.spark.sql.SparkSession,
      dir: String): Unit = {
    val v = pqLatestVersion(spark, dir).getOrElse(
      throw new IllegalStateException(s"no LATEST pointer under $dir"))
    val (_, numSubspaces, _) = readPqSidecar(spark, dir)
    val codes = readPqCodes(spark, dir, v, numSubspaces)
    // same log-ordered mask the probes apply, so the physical fold
    // keeps exactly the rows a probe would have seen — including a
    // re-appended id whose older codes a tombstone masked. Survivors
    // restart at the base batch position: the new version opens
    // tombstone-free, its log empty.
    val live = maskTombstonesAt(spark, s"$dir/v$v/_tombstones", codes)
      .withColumn("batch", lit(-1L))
    live.write.mode(SaveMode.Overwrite).partitionBy("list_id")
      .parquet(s"$dir/v${v + 1}/codes")
    writeSmallFile(spark, s"$dir/v${v + 1}/centroids.tsv",
      readTextFile(spark, s"$dir/v$v/centroids.tsv"))
    writeSmallFile(spark, s"$dir/LATEST", (v + 1).toString)
    val fs = hadoopFs(spark, dir)
    for (old <- 1L until v)
      fs.delete(new org.apache.hadoop.fs.Path(s"$dir/v$old"), true)
  }

  private def readTextFile(spark: org.apache.spark.sql.SparkSession,
      path: String): String = {
    val in = hadoopFs(spark, path).open(new org.apache.hadoop.fs.Path(path))
    try scala.io.Source.fromInputStream(in, "UTF-8").mkString
    finally in.close()
  }

  // ---- persisted IVF (full-vector) index ------------------------------

  /** Persist a k-means IVF index: (vec_id, vector, norm) rows
    * PARTITIONED BY inverted list + the centroid sidecar — the same
    * versioned LATEST-pointer publication as [[writePqIndex]]. Unlike
    * PQ the vectors ride along (exact in-list cosine, no compression),
    * so this is the reuse shape for `kmeansTopK`: the Lloyd refinement
    * and the full-corpus assignment pass are paid once, probes after
    * that read only their nprobe list directories.
    */
  def writeIvfIndex(corpus: DataFrame, dir: String, numLists: Int = 16,
      iters: Int = 2, sampleFrac: Double = 1.0,
      centsOpt: Option[Seq[(Long, Seq[Double])]] = None): Unit = {
    val spark = corpus.sparkSession
    val v = pqLatestVersion(spark, dir).getOrElse(0L) + 1
    val cents = centsOpt.getOrElse(
      kmeansCentroids(corpus, numLists, iters, sampleFrac))
    spreadScan(corpus.select(col("vec_id"), col("embedding").as("c_v")))
      .withColumn("list_id", nearestCentroid(col("c_v"), cents))
      .withColumn("c_norm", sqrt(fdot(col("c_v"), col("c_v"))))
      .write.mode(SaveMode.Overwrite).partitionBy("list_id")
      .parquet(s"$dir/v$v/codes")
    val fs = hadoopFs(spark, dir)
    def writeFile(path: String, content: String): Unit = {
      val out = fs.create(new org.apache.hadoop.fs.Path(path), true)
      try out.write(content.getBytes("UTF-8")) finally out.close()
    }
    val dim = cents.head._2.length
    writeFile(s"$dir/v$v/centroids.tsv",
      (s"#ivf numLists=$numLists dim=$dim" +:
        cents.map { case (id, c) => s"$id\t${c.mkString(",")}" })
        .mkString("\n"))
    writeFile(s"$dir/LATEST", v.toString)
    for (old <- 1L until v - 1)
      fs.delete(new org.apache.hadoop.fs.Path(s"$dir/v$old"), true)
  }

  private def parseCentroidsTsv(text: String): Seq[(Long, Seq[Double])] =
    text.split("\n").toSeq.filter(_.nonEmpty).tail.map { line =>
      val Array(id, dims) = line.split("\t", 2)
      (id.toLong, dims.split(",").toSeq.map(_.toDouble))
    }

  private def readCentroidsFile(spark: org.apache.spark.sql.SparkSession,
      path: String): Seq[(Long, Seq[Double])] = {
    val in = hadoopFs(spark, path).open(new org.apache.hadoop.fs.Path(path))
    val text = try scala.io.Source.fromInputStream(in, "UTF-8").mkString
      finally in.close()
    parseCentroidsTsv(text)
  }

  private def readIvfCentroids(spark: org.apache.spark.sql.SparkSession,
      dir: String, v: Long): Seq[(Long, Seq[Double])] =
    readCentroidsFile(spark, s"$dir/v$v/centroids.tsv")

  /** Append new vectors to the CURRENT version of a persisted IVF
    * index: assigned against the FROZEN sidecar centroids (the same
    * incremental-IVF contract as [[appendToPqIndex]] — codebooks never
    * move on append; rebuilds handle drift), landing as new files in
    * the existing list partitions. Probes see them immediately.
    */
  def appendToIvfIndex(newVecs: DataFrame, dir: String): Unit = {
    val spark = newVecs.sparkSession
    val v = pqLatestVersion(spark, dir).getOrElse(
      throw new IllegalStateException(s"no LATEST pointer under $dir"))
    val cents = readIvfCentroids(spark, dir, v)
    spreadScan(newVecs.select(col("vec_id"), col("embedding").as("c_v")))
      .withColumn("list_id", nearestCentroid(col("c_v"), cents))
      .withColumn("c_norm", sqrt(fdot(col("c_v"), col("c_v"))))
      .write.mode(SaveMode.Append).partitionBy("list_id")
      .parquet(s"$dir/v$v/codes")
  }

  /** Probe a persisted IVF index — [[probeAssigned]] over the stored
    * list partitions, centroids from the sidecar.
    */
  def probeIvfIndex(spark: org.apache.spark.sql.SparkSession, dir: String,
      queries: DataFrame, k: Int, nprobe: Int = 1): DataFrame = {
    val v = pqLatestVersion(spark, dir).getOrElse(
      throw new IllegalStateException(s"no LATEST pointer under $dir"))
    val cents = readIvfCentroids(spark, dir, v)
    val schema = StructType(Seq(
      StructField("vec_id", LongType),
      StructField("c_v", ArrayType(FloatType)),
      StructField("c_norm", DoubleType),
      StructField("list_id", LongType)))
    val codes = spark.read.schema(schema).parquet(s"$dir/v$v/codes")
      .withColumnRenamed("vec_id", "neighbor_id")
    probeAssigned(codes, queries, cents, k, nprobe)
  }

  // ---- build-once-probe-many for the declared queries -----------------

  /** Cache directory for a source dir's persisted index, keyed by the
    * embeddings file's identity (path, mtime, size) — a changed source
    * gets a fresh key, so a stale index can never answer for new data.
    */
  private def indexCacheDir(spark: org.apache.spark.sql.SparkSession,
      sfDir: String, kind: String): String =
    graft.sources.DerivedCache.dirFor(spark,
      s"$sfDir/embeddings.parquet", s"index-$kind")

  /** Build the persisted index iff this source has none yet; return
    * its directory. The first caller pays the build, every later call
    * (this process or the next) goes straight to the probe — the
    * build-once-probe-many amortization the declared `_indexed`
    * queries exercise.
    */
  private[graft] def ensurePqIndex(spark: org.apache.spark.sql.SparkSession,
      sfDir: String): String = {
    val dir = indexCacheDir(spark, sfDir, "pq")
    if (pqLatestVersion(spark, dir).isEmpty)
      writePqIndex(table(spark, sfDir, "embeddings"), dir)
    dir
  }

  /** The CDC lifecycle for the declared upsert query: the full corpus
    * lands as batch 0, then ONE change batch — every `vec_id % 5 == 1`
    * document "re-embedded" (deterministically: it takes `vec_id + 1`'s
    * vector, so the oracle can replay the mutation in SQL) and every
    * `vec_id % 7 == 3` document deleted. Probes must rank the
    * re-embedded docs by their NEW vectors and never surface the
    * deleted ones. Ids that are both (re-embed ∩ takedown) are
    * takedowns — the upsert set excludes them, keeping the semantics
    * deterministic.
    */
  private[graft] def ensureIvfUpserted(
      spark: org.apache.spark.sql.SparkSession, sfDir: String): String = {
    val dir = indexCacheDir(spark, sfDir, "ivf-ups")
    if (!graft.sources.DerivedCache.isComplete(spark, dir) ||
        pqLatestVersion(spark, dir).isEmpty) {
      val cents = ensureKmeansQuantizer(spark, sfDir)
      val e = table(spark, sfDir, "embeddings")
      appendIvfIncrement(spark, dir, e, cents, 0L)
      val next = e.select((col("vec_id") - 1).as("vec_id"),
        col("embedding").as("__new_emb"))
      val ups = e.select("vec_id").join(next, "vec_id")
        .filter(pmod(col("vec_id"), lit(5)) === 1 &&
          pmod(col("vec_id"), lit(7)) =!= 3)
        .select(col("vec_id"), col("__new_emb").as("embedding"),
          lit("upsert").as("op"))
      val dels = e.filter(pmod(col("vec_id"), lit(7)) === 3)
        .select(col("vec_id"), col("embedding"), lit("delete").as("op"))
      upsertIvfIncrement(spark, dir, ups.unionByName(dels), cents, 1L)
      hadoopFs(spark, dir)
        .create(new org.apache.hadoop.fs.Path(s"$dir/_SUCCESS"), true).close()
    }
    dir
  }

  /** Build + delete + compact lifecycle for the declared PQ delete
    * query — the [[ensureIvfDeleted]] pattern on the versioned PQ
    * layout, so the oracle grades the physically-compacted codes.
    * Crash anywhere before the `_SUCCESS` witness → the rerun builds a
    * fresh version through `writePqIndex`'s own publication and
    * converges (stale versions are pruned by the next flip).
    */
  private[graft] def ensurePqDeleted(spark: org.apache.spark.sql.SparkSession,
      sfDir: String): String = {
    val dir = indexCacheDir(spark, sfDir, "pq-del")
    if (!graft.sources.DerivedCache.isComplete(spark, dir) ||
        pqLatestVersion(spark, dir).isEmpty) {
      val e = table(spark, sfDir, "embeddings")
      writePqIndex(e, dir)
      deleteFromPqIndex(spark, dir,
        e.filter(pmod(col("vec_id"), lit(7)) === 3).select("vec_id"), 0L)
      compactPqIndex(spark, dir)
      hadoopFs(spark, dir)
        .create(new org.apache.hadoop.fs.Path(s"$dir/_SUCCESS"), true).close()
    }
    dir
  }

  private[graft] def ensureIvfIndex(spark: org.apache.spark.sql.SparkSession,
      sfDir: String): String = {
    val dir = indexCacheDir(spark, sfDir, "ivf")
    if (pqLatestVersion(spark, dir).isEmpty)
      writeIvfIndex(table(spark, sfDir, "embeddings"), dir,
        numLists = 16, iters = 2, sampleFrac = 0.5,
        centsOpt = Some(ensureKmeansQuantizer(spark, sfDir)))
    dir
  }

  /** INCREMENTAL index maintenance — the missing half of
    * build-once-probe-many at 100 TB: a production IVF index is not
    * rebuilt per ingest, it ABSORBS increments against a frozen
    * quantizer (retrain is a rare, monitored event — `q_centroid_drift`
    * is the monitor), masks deletes with tombstones, and compacts
    * occasionally. Layout: `LATEST` names the current GENERATION
    * `g<G>/`, inside which every increment lands whole under
    * `batch=<id>/list_id=<l>/` and every delete under
    * `_tombstones/batch=<id>/`; compaction folds live postings into
    * `g<G+1>` and flips the pointer (the [[writePqIndex]] publication
    * discipline — a crash mid-compaction leaves readers on the
    * complete previous generation).
    *
    * Each increment is one map-only pass over the NEW vectors (assign
    * to the frozen centroids, norm, write) — cost ∝ batch, the
    * existing postings are never touched. `batch=<id>` is overwritten
    * whole on replay (the CorpusStream shield), and a batch id at or
    * below the generation's `_FOLDED` horizon no-ops — a redelivery
    * straddling a compaction cannot re-insert rows the fold already
    * carried forward. Probes read the union of batches; `list_id`
    * stays a PARTITION column, so the per-list directory pruning that
    * makes an IVF probe cheap holds across every increment (and
    * dynamic partition pruning covers the join path on a cluster).
    * Single-writer maintenance contract (appends/deletes/compactions
    * serialized), like any snapshot-pointer table; probes are
    * lock-free.
    */
  def appendIvfIncrement(spark: org.apache.spark.sql.SparkSession,
      indexDir: String, vecs: DataFrame,
      cents: Seq[(Long, Seq[Double])], batchId: Long): Unit = {
    val g = ivfIncGeneration(spark, indexDir)
    if (batchId <= ivfIncFoldedThrough(spark, indexDir, g)) return
    spreadScan(vecs.select(col("vec_id"), col("embedding").as("c_v")))
      .withColumn("list_id", nearestCentroid(col("c_v"), cents))
      .withColumn("c_norm", sqrt(fdot(col("c_v"), col("c_v"))))
      .write.mode(org.apache.spark.sql.SaveMode.Overwrite)
      .partitionBy("list_id")
      .parquet(s"$indexDir/g$g/batch=$batchId")
  }

  /** Tombstone delete: the ids land whole under the current
    * generation's `_tombstones/batch=<id>/` (underscore-prefixed, so
    * postings reads never see them as data) and every probe anti-joins
    * them out until a compaction removes the rows physically — the
    * append-only answer to retention/right-to-be-forgotten at 100 TB,
    * where rewriting the postings per delete would dwarf the delete.
    * A tombstone at batch `b` masks postings from batches STRICTLY
    * BEFORE `b` — log ordering, so [[upsertIvfIncrement]]'s same-batch
    * re-append survives its own tombstone. Replay-idempotent twice
    * over: the batch dir overwrites whole, and a redelivery past a
    * compaction (`batchId <= _FOLDED`) no-ops — by then the masked
    * rows are physically gone.
    */
  def deleteIvfIncrement(spark: org.apache.spark.sql.SparkSession,
      indexDir: String, ids: DataFrame, batchId: Long): Unit = {
    val g = ivfIncGeneration(spark, indexDir)
    if (batchId <= ivfIncFoldedThrough(spark, indexDir, g)) return
    ids.select(col("vec_id"))
      .write.mode(org.apache.spark.sql.SaveMode.Overwrite)
      .parquet(s"$indexDir/g$g/_tombstones/batch=$batchId")
  }

  /** CDC upsert batch: every incoming id is tombstoned at this batch
    * (killing all earlier postings for it) and the non-delete rows
    * re-append in the SAME batch with their new vectors — re-embedded
    * documents land under the fresh assignment, takedowns (`op` =
    * "delete") just vanish. This is how a 100 TB ANN index tracks an
    * encoder refresh or a document edit stream without rebuilds: per
    * batch, cost ∝ churn. Both writes ride the same replay shields as
    * their building blocks; a crash between them leaves the index
    * temporarily missing the re-appends, and the batch replay rewrites
    * both sides to the converged state.
    */
  def upsertIvfIncrement(spark: org.apache.spark.sql.SparkSession,
      indexDir: String, batch: DataFrame,
      cents: Seq[(Long, Seq[Double])], batchId: Long,
      opCol: String = "op"): Unit = {
    deleteIvfIncrement(spark, indexDir, batch.select(col("vec_id")), batchId)
    appendIvfIncrement(spark, indexDir,
      batch.filter(col(opCol) =!= "delete").select("vec_id", "embedding"),
      cents, batchId)
  }

  /** The live postings of the current generation: the union of its
    * increment batches minus its tombstones (broadcast anti-join — the
    * tombstone set is churn-sized, never corpus-sized). A tombstone
    * masks postings from STRICTLY EARLIER batches only: that log
    * ordering is what makes UPSERT expressible as tombstone + re-append
    * in one batch (the re-embedded vector survives its own tombstone;
    * every older posting for the id dies), while a pure delete — a
    * tombstone with no re-append — removes the id entirely. The
    * explicit schema pins both partition columns to LONG (inference
    * would guess INT and the cast would defeat the probe join's
    * partition pruning).
    */
  private def ivfIncLive(spark: org.apache.spark.sql.SparkSession,
      indexDir: String, g: Long,
      exclude: Set[Long] = Set.empty): DataFrame = {
    val schema = StructType(Seq(
      StructField("vec_id", LongType),
      StructField("c_v", ArrayType(FloatType)),
      StructField("c_norm", DoubleType),
      StructField("batch", LongType),
      StructField("list_id", LongType)))
    val all = spark.read.schema(schema).parquet(s"$indexDir/g$g")
    // `batch` is a partition column, so the torn-batch exclusion a
    // compaction passes prunes whole directories at planning time
    val codes =
      if (exclude.isEmpty) all
      else all.filter(!col("batch").isin(exclude.toSeq: _*))
    maskIncTombstones(spark, indexDir, g, codes, exclude)
      .select(col("vec_id").as("neighbor_id"), col("c_v"),
        col("c_norm"), col("list_id"))
  }

  /** The log-ordered tombstone mask shared by every maintained layout
    * (incremental full-vector postings, incremental PQ codes, and the
    * versioned PQ index): one row per id at its LATEST tombstone
    * batch, broadcast (churn-sized, never corpus-sized); a row
    * survives iff it landed at or after every tombstone for its id —
    * the ordering that makes upsert expressible as tombstone +
    * same-batch re-append. `exclude` drops named tombstone batches
    * (compaction passes the torn set, so a half-written delete is
    * never baked into a fold it could not survive replaying).
    */
  private def maskTombstonesAt(spark: org.apache.spark.sql.SparkSession,
      tombDir: String, rows: DataFrame,
      exclude: Set[Long] = Set.empty): DataFrame = {
    val tombPath = new org.apache.hadoop.fs.Path(tombDir)
    if (!hadoopFs(spark, tombDir).exists(tombPath)) rows
    else {
      val all = spark.read
        .schema(StructType(Seq(StructField("vec_id", LongType),
          StructField("batch", LongType))))
        .parquet(tombDir)
      val kept =
        if (exclude.isEmpty) all
        else all.filter(!col("batch").isin(exclude.toSeq: _*))
      val tombs = kept
        .select(col("vec_id").as("__t_id"), col("batch"))
        .groupBy("__t_id").agg(max("batch").as("__t_batch"))
      rows.join(broadcast(tombs),
        rows("vec_id") === tombs("__t_id") &&
          rows("batch") < tombs("__t_batch"), "left_anti")
    }
  }

  private def maskIncTombstones(spark: org.apache.spark.sql.SparkSession,
      indexDir: String, g: Long, rows: DataFrame,
      exclude: Set[Long] = Set.empty): DataFrame =
    maskTombstonesAt(spark, s"$indexDir/g$g/_tombstones", rows, exclude)

  /** Probe the incrementally-grown postings: identical semantics (and
    * identical results — the declared queries share their oracle
    * strings with the batch-built twins) to [[probeIvfIndex]], over
    * however many increments, deletes and compactions have landed.
    */
  def probeIvfIncremental(spark: org.apache.spark.sql.SparkSession,
      indexDir: String, cents: Seq[(Long, Seq[Double])],
      queries: DataFrame, k: Int, nprobe: Int = 1): DataFrame = {
    val g = pqLatestVersion(spark, indexDir).getOrElse(
      throw new IllegalStateException(s"no LATEST pointer under $indexDir"))
    probeAssigned(ivfIncLive(spark, indexDir, g), queries, cents, k, nprobe)
  }

  /** Fold the current generation's live postings (tombstones applied)
    * into a single-batch next generation and flip `LATEST` — the
    * publication point. The old generation is retained for readers
    * that pinned it mid-probe; generations before it are pruned. The
    * new generation's `_FOLDED` horizon records the largest batch id
    * the fold consumed, so replayed increments/deletes at or below it
    * no-op instead of re-inserting folded rows.
    */
  def compactIvfIncremental(spark: org.apache.spark.sql.SparkSession,
      indexDir: String): Unit =
    foldGeneration(spark, indexDir, (g, torn) =>
      ivfIncLive(spark, indexDir, g, torn)
        .select(col("neighbor_id").as("vec_id"), col("c_v"),
          col("c_norm"), col("list_id")))

  /** The shared compaction step of both incremental layouts: fold the
    * current generation's live rows (whatever frame `live` derives for
    * it — full-vector postings or PQ codes, tombstones already
    * applied) into `g<G+1>/batch=0`, record the `_FOLDED` horizon (the
    * largest batch id consumed, so replays at or below it no-op), flip
    * `LATEST`, prune generations older than the one retained for
    * pinned readers.
    *
    * TORN batches — directories missing Spark's `_SUCCESS` witness,
    * i.e. a crashed append or delete that has not replayed yet — are
    * excluded twice over: their ids stay OUT of the horizon (so the
    * replay still fires against the new generation instead of
    * no-opping) and their partial rows stay out of the fold input (so
    * half a batch is never frozen into a generation as if it were the
    * whole). Without this a compaction racing a crashed write would
    * make the torn batch permanent: the horizon would swallow its id,
    * the replay would no-op, and the partial rows would be the
    * batch forever. A batch id is torn if ANY directory bearing it
    * (data or tombstone) lacks the witness — an upsert is one
    * tombstone write plus one data write, and a crash between them
    * must keep the WHOLE batch replayable, not fold the delete half
    * while dropping the re-append.
    */
  private def foldGeneration(spark: org.apache.spark.sql.SparkSession,
      indexDir: String, live: (Long, Set[Long]) => DataFrame): Unit = {
    val g = pqLatestVersion(spark, indexDir).getOrElse(
      throw new IllegalStateException(s"no LATEST pointer under $indexDir"))
    val fs = hadoopFs(spark, indexDir)
    def batchDirs(parent: org.apache.hadoop.fs.Path): Seq[(Long, Boolean)] =
      fs.listStatus(parent).toSeq
        .filter(_.getPath.getName.startsWith("batch="))
        .map { s =>
          (s.getPath.getName.stripPrefix("batch=").toLong,
            fs.exists(new org.apache.hadoop.fs.Path(s.getPath, "_SUCCESS")))
        }
    val gPath = new org.apache.hadoop.fs.Path(s"$indexDir/g$g")
    val tombPath = new org.apache.hadoop.fs.Path(s"$indexDir/g$g/_tombstones")
    val seen = batchDirs(gPath) ++
      (if (fs.exists(tombPath)) batchDirs(tombPath) else Nil)
    val torn = seen.collect { case (id, false) => id }.toSet
    val folded = ivfIncFoldedThrough(spark, indexDir, g)
    val horizon = (seen.map(_._1).filterNot(torn) :+ folded).max
    // the torn-batch exclusion assumes ONE sequential writer: a crash
    // always leaves the torn batch as the highest id, so excluding it
    // from the horizon keeps its replay live. A torn id BELOW a
    // completed non-torn id (and above the already-folded horizon —
    // redelivery debris at or below it was applied long ago and is
    // harmless) means that assumption broke: folding would swallow
    // the id into the horizon's max and the partial batch would be
    // lost silently. Fail loudly instead — replay or remove the torn
    // dirs, then compact.
    val swallowed = torn.filter(t => t > folded && t < horizon)
    require(swallowed.isEmpty,
      s"torn batch id(s) ${swallowed.toSeq.sorted.mkString(",")} sit " +
        s"below the fold horizon $horizon under $indexDir/g$g: a " +
        "non-torn batch committed after a crashed write, violating " +
        "the single-sequential-writer contract — folding now would " +
        "permanently discard the torn batch's replay. Replay or " +
        "remove those batch dirs first.")
    live(g, torn)
      .write.mode(org.apache.spark.sql.SaveMode.Overwrite)
      .partitionBy("list_id")
      .parquet(s"$indexDir/g${g + 1}/batch=0")
    writeSmallFile(spark, s"$indexDir/g${g + 1}/_FOLDED", horizon.toString)
    writeSmallFile(spark, s"$indexDir/LATEST", (g + 1).toString)
    for (old <- 1L until g)
      fs.delete(new org.apache.hadoop.fs.Path(s"$indexDir/g$old"), true)
  }

  /** Current generation, initializing `LATEST` to 1 on first touch —
    * concurrent first writers race benignly (identical bytes).
    */
  private def ivfIncGeneration(spark: org.apache.spark.sql.SparkSession,
      indexDir: String): Long =
    pqLatestVersion(spark, indexDir).getOrElse {
      writeSmallFile(spark, s"$indexDir/LATEST", "1"); 1L
    }

  /** The current generation's folded-batch horizon (−1 if the index
    * does not exist yet or was never compacted). The streaming batch
    * steps consult this to skip their compaction leg on a
    * post-compaction redelivery: the append already no-ops
    * (`batchId <= horizon`), and without the same guard the fold
    * would re-run anyway — a full corpus-sized rewrite plus a garbage
    * generation per redelivered batch, for zero state change.
    */
  def incFoldedThrough(spark: org.apache.spark.sql.SparkSession,
      indexDir: String): Long =
    pqLatestVersion(spark, indexDir)
      .map(g => ivfIncFoldedThrough(spark, indexDir, g))
      .getOrElse(-1L)

  /** The generation's folded-batch horizon: compaction folded every
    * batch id at or below it (−1 for a never-compacted generation).
    */
  private def ivfIncFoldedThrough(spark: org.apache.spark.sql.SparkSession,
      indexDir: String, g: Long): Long = {
    val fs = hadoopFs(spark, indexDir)
    val p = new org.apache.hadoop.fs.Path(s"$indexDir/g$g/_FOLDED")
    if (!fs.exists(p)) -1L
    else {
      val in = fs.open(p)
      val text = try scala.io.Source.fromInputStream(in, "UTF-8").mkString
        finally in.close()
      text.trim.toLong
    }
  }

  private def writeSmallFile(spark: org.apache.spark.sql.SparkSession,
      path: String, content: String): Unit = {
    val out = hadoopFs(spark, path)
      .create(new org.apache.hadoop.fs.Path(path), true)
    try out.write(content.getBytes("UTF-8")) finally out.close()
  }

  // ---- incremental PQ (compressed-code) index maintenance -------------

  /** The [[appendIvfIncrement]] lifecycle on the COMPRESSED index —
    * the layout a 100 TB ANN deployment actually ships, because the
    * codes are M bytes per vector where the postings are 4·dim. Same
    * generation/batch/tombstone discipline, but each increment is one
    * map-only ENCODE pass against the frozen codebook (pqEncode — the
    * full embedding is dropped after encoding, so an increment's
    * storage cost is its code rows, nothing else). The codebook
    * publishes once at the index root on first touch: it is frozen
    * across generations by the incremental contract (codebook drift is
    * what full [[writePqIndex]] rebuilds are for, and
    * `q_centroid_drift` is the monitor that triggers them), so probes
    * never refit and never need the caller to re-supply it.
    */
  def appendPqIncrement(spark: org.apache.spark.sql.SparkSession,
      indexDir: String, vecs: DataFrame,
      cents: Seq[(Long, Seq[Double])], batchId: Long,
      numSubspaces: Int = 8, dim: Int = 64): Unit = {
    val g = ivfIncGeneration(spark, indexDir)
    val sidecar = new org.apache.hadoop.fs.Path(s"$indexDir/centroids.tsv")
    if (!hadoopFs(spark, indexDir).exists(sidecar))
      writeSmallFile(spark, s"$indexDir/centroids.tsv",
        pqSidecarText(cents, numSubspaces, dim))
    if (batchId <= ivfIncFoldedThrough(spark, indexDir, g)) return
    pqEncode(vecs.select("vec_id", "embedding"), cents, numSubspaces, dim)
      .write.mode(org.apache.spark.sql.SaveMode.Overwrite)
      .partitionBy("list_id")
      .parquet(s"$indexDir/g$g/batch=$batchId")
  }

  /** CDC upsert on the compressed index — [[upsertIvfIncrement]]'s
    * contract (tombstone every incoming id at this batch, re-encode
    * the non-deletes in the same batch; log ordering lets the fresh
    * codes survive their own tombstone). [[deleteIvfIncrement]] is
    * layout-agnostic (it only writes ids under the generation's
    * `_tombstones/`), so both layouts share it verbatim.
    */
  def upsertPqIncrement(spark: org.apache.spark.sql.SparkSession,
      indexDir: String, batch: DataFrame,
      cents: Seq[(Long, Seq[Double])], batchId: Long,
      numSubspaces: Int = 8, dim: Int = 64, opCol: String = "op"): Unit = {
    deleteIvfIncrement(spark, indexDir, batch.select(col("vec_id")), batchId)
    appendPqIncrement(spark, indexDir,
      batch.filter(col(opCol) =!= "delete").select("vec_id", "embedding"),
      cents, batchId, numSubspaces, dim)
  }

  /** Live codes of the current generation: batch union minus the
    * log-ordered tombstone mask ([[maskIncTombstones]] — shared with
    * the full-vector layout). Explicit schema pins `batch` and
    * `list_id` to LONG for the same partition-pruning reason as
    * everywhere else.
    */
  private def pqIncLive(spark: org.apache.spark.sql.SparkSession,
      indexDir: String, g: Long, numSubspaces: Int,
      exclude: Set[Long] = Set.empty): DataFrame = {
    val schema = StructType(
      StructField("vec_id", LongType) +:
        (0 until numSubspaces).map(m =>
          StructField(s"code$m", IntegerType)) :+
        StructField("batch", LongType) :+
        StructField("list_id", LongType))
    val all = spark.read.schema(schema).parquet(s"$indexDir/g$g")
    val codes =
      if (exclude.isEmpty) all
      else all.filter(!col("batch").isin(exclude.toSeq: _*))
    maskIncTombstones(spark, indexDir, g, codes, exclude).drop("batch")
  }

  /** Probe the incrementally-grown compressed index: the sidecar at
    * the index root supplies codebook and params, [[pqProbe]] does the
    * rest — identical semantics (and, for the declared query, an
    * identical oracle string) to a fresh full encode.
    */
  def probePqIncremental(spark: org.apache.spark.sql.SparkSession,
      indexDir: String, queries: DataFrame, k: Int,
      nprobe: Int = 1): DataFrame = {
    val (cents, numSubspaces, dim) =
      parsePqSidecar(readTextFile(spark, s"$indexDir/centroids.tsv"))
    val g = pqLatestVersion(spark, indexDir).getOrElse(
      throw new IllegalStateException(s"no LATEST pointer under $indexDir"))
    pqProbe(pqIncLive(spark, indexDir, g, numSubspaces), queries, cents, k,
      numSubspaces, dim, nprobe)
  }

  /** Per-list balance of the incrementally-maintained index — the
    * probe-latency monitor: a probe opens nprobe lists, so one hot
    * list IS the tail latency, and list skew is what a quantizer
    * retrain (the `q_centroid_drift` trigger) actually fixes. One
    * map-side-combined count over the live postings, |lists|-row
    * output at any corpus size; `imbalance` = max/mean (1.0 =
    * perfectly balanced; a probe of the hottest list costs
    * `imbalance ×` the average probe).
    */
  def ivfIndexStats(spark: org.apache.spark.sql.SparkSession,
      indexDir: String): DataFrame = {
    val g = pqLatestVersion(spark, indexDir).getOrElse(
      throw new IllegalStateException(s"no LATEST pointer under $indexDir"))
    val lc = ivfIncLive(spark, indexDir, g)
      .groupBy("list_id").agg(count(lit(1)).as("n_postings"))
    val t = broadcast(lc.agg(
      sum("n_postings").cast(LongType).as("total"),
      max("n_postings").as("mx"),
      count(lit(1)).as("k")))
    lc.crossJoin(t).select(col("list_id"), col("n_postings"),
      round(col("n_postings") * lit(1.0) / col("total"), 4).as("share"),
      round(col("mx") * col("k") * lit(1.0) / col("total"), 4)
        .as("imbalance"))
  }

  /** Fold the live codes into the next generation —
    * [[foldGeneration]], with the root sidecar untouched (the codebook
    * is generation-invariant on this layout).
    */
  def compactPqIncremental(spark: org.apache.spark.sql.SparkSession,
      indexDir: String): Unit = {
    val (_, numSubspaces, _) =
      parsePqSidecar(readTextFile(spark, s"$indexDir/centroids.tsv"))
    foldGeneration(spark, indexDir, (g, torn) =>
      pqIncLive(spark, indexDir, g, numSubspaces, torn))
  }

  /** Build the incremental compressed index for the declared query iff
    * absent: codebook fit once on the full corpus (the same
    * deterministic md5-rank sample [[writePqIndex]] uses, so the
    * q_ann_pq oracle replays it), then the corpus arrives as two
    * disjoint increments. `_SUCCESS` lands last — a crashed build
    * re-runs both appends over their Overwrite shields.
    */
  private[graft] def ensurePqIncremental(
      spark: org.apache.spark.sql.SparkSession, sfDir: String): String = {
    val dir = indexCacheDir(spark, sfDir, "pq-inc")
    if (!graft.sources.DerivedCache.isComplete(spark, dir) ||
        pqLatestVersion(spark, dir).isEmpty) {
      val e = table(spark, sfDir, "embeddings")
      val cents = hashCentroids(e, 16)
      appendPqIncrement(spark, dir,
        e.filter(pmod(col("vec_id"), lit(2)) === 0), cents, 0L)
      appendPqIncrement(spark, dir,
        e.filter(pmod(col("vec_id"), lit(2)) === 1), cents, 1L)
      hadoopFs(spark, dir)
        .create(new org.apache.hadoop.fs.Path(s"$dir/_SUCCESS"), true).close()
    }
    dir
  }

  /** [[ensureIvfUpserted]]'s CDC lifecycle on the compressed index:
    * full corpus at batch 0, then one change batch re-embedding every
    * `vec_id % 5 == 1` doc (as `vec_id + 1`'s vector) and taking down
    * every `vec_id % 7 == 3` — through [[upsertPqIncrement]], so the
    * fresh CODES survive their own tombstone by log ordering.
    */
  private[graft] def ensurePqUpserted(
      spark: org.apache.spark.sql.SparkSession, sfDir: String): String = {
    val dir = indexCacheDir(spark, sfDir, "pq-ups")
    if (!graft.sources.DerivedCache.isComplete(spark, dir) ||
        pqLatestVersion(spark, dir).isEmpty) {
      val e = table(spark, sfDir, "embeddings")
      val cents = hashCentroids(e, 16)
      appendPqIncrement(spark, dir, e, cents, 0L)
      val next = e.select((col("vec_id") - 1).as("vec_id"),
        col("embedding").as("__new_emb"))
      val ups = e.select("vec_id").join(next, "vec_id")
        .filter(pmod(col("vec_id"), lit(5)) === 1 &&
          pmod(col("vec_id"), lit(7)) =!= 3)
        .select(col("vec_id"), col("__new_emb").as("embedding"),
          lit("upsert").as("op"))
      val dels = e.filter(pmod(col("vec_id"), lit(7)) === 3)
        .select(col("vec_id"), col("embedding"), lit("delete").as("op"))
      upsertPqIncrement(spark, dir, ups.unionByName(dels), cents, 1L)
      hadoopFs(spark, dir)
        .create(new org.apache.hadoop.fs.Path(s"$dir/_SUCCESS"), true).close()
    }
    dir
  }

  /** Build the incremental index for the declared query iff absent:
    * the corpus arrives as two disjoint increments (even then odd
    * vec_ids). The root `_SUCCESS` lands only after the last
    * increment — a crash mid-build leaves no marker and the next
    * caller re-runs both appends over their own Overwrite shields.
    */
  private[graft] def ensureIvfIncremental(
      spark: org.apache.spark.sql.SparkSession, sfDir: String): String = {
    val dir = indexCacheDir(spark, sfDir, "ivf-inc")
    // a complete marker without a generation pointer is a stale
    // pre-generation layout — rebuild rather than fail the probe
    if (!graft.sources.DerivedCache.isComplete(spark, dir) ||
        pqLatestVersion(spark, dir).isEmpty) {
      val cents = ensureKmeansQuantizer(spark, sfDir)
      val e = table(spark, sfDir, "embeddings")
      appendIvfIncrement(spark, dir,
        e.filter(pmod(col("vec_id"), lit(2)) === 0), cents, 0L)
      appendIvfIncrement(spark, dir,
        e.filter(pmod(col("vec_id"), lit(2)) === 1), cents, 1L)
      val fs = hadoopFs(spark, dir)
      fs.create(new org.apache.hadoop.fs.Path(s"$dir/_SUCCESS"), true).close()
    }
    dir
  }

  /** The full maintenance lifecycle for the declared delete query:
    * two increments, a tombstone delete of every `vec_id % 7 == 3`
    * row, then a compaction — so the ORACLE (the batch replay over the
    * corpus minus the deleted ids) grades the physically-compacted
    * index, not just the tombstone mask. The mask path is spec-pinned
    * equal to this one.
    */
  private[graft] def ensureIvfDeleted(
      spark: org.apache.spark.sql.SparkSession, sfDir: String): String = {
    val dir = indexCacheDir(spark, sfDir, "ivf-del")
    if (!graft.sources.DerivedCache.isComplete(spark, dir) ||
        pqLatestVersion(spark, dir).isEmpty) {
      val cents = ensureKmeansQuantizer(spark, sfDir)
      val e = table(spark, sfDir, "embeddings")
      appendIvfIncrement(spark, dir,
        e.filter(pmod(col("vec_id"), lit(2)) === 0), cents, 0L)
      appendIvfIncrement(spark, dir,
        e.filter(pmod(col("vec_id"), lit(2)) === 1), cents, 1L)
      deleteIvfIncrement(spark, dir,
        e.filter(pmod(col("vec_id"), lit(7)) === 3).select("vec_id"), 2L)
      compactIvfIncremental(spark, dir)
      val fs = hadoopFs(spark, dir)
      fs.create(new org.apache.hadoop.fs.Path(s"$dir/_SUCCESS"), true).close()
    }
    dir
  }

  /** Fit-once FROZEN quantizer: the sample-refined Lloyd centroids
    * that q_ann_kmeans_indexed's IVF build, q_semdedup's cluster
    * assignment and q_corpus_map's composition map all consume — at
    * 100 TB these are one pipeline (cluster the embedding space once;
    * dedup within clusters, map the domain mix across them, serve ANN
    * from the same lists), so the fit is paid once and published as a
    * content-keyed sidecar (16 rows × 64 doubles). The key folds in
    * the embeddings file's identity, so a changed corpus refits; the
    * `_SUCCESS` marker is the completeness witness (a crashed build
    * leaves none and the next caller rebuilds); concurrent builders
    * race benignly — the fit is deterministic, so last-writer-wins
    * publishes identical bytes. The ORACLES of all three consumers
    * refit from scratch per run (`kmeansListsSql`), so artifact reuse
    * is provably invisible in results — the same contract as the
    * postings artifact and the `_indexed` ANN twins.
    *
    * q_ann_kmeans deliberately does NOT ride this: it is the
    * fresh-build baseline of the `_indexed` pair, so its timing keeps
    * the full fit+assign cost visible.
    */
  private[graft] def ensureKmeansQuantizer(
      spark: org.apache.spark.sql.SparkSession, sfDir: String,
      numLists: Int = 16, iters: Int = 2,
      sampleFrac: Double = 0.5): Seq[(Long, Seq[Double])] = {
    val dir = graft.sources.DerivedCache.dirFor(spark,
      s"$sfDir/embeddings.parquet", "kmeans-cents",
      s"$numLists-$iters-$sampleFrac")
    val fs = hadoopFs(spark, dir)
    val tsv = s"$dir/centroids.tsv"
    if (graft.sources.DerivedCache.isComplete(spark, dir))
      readCentroidsFile(spark, tsv)
    else {
      val cents = kmeansCentroids(
        spreadScan(table(spark, sfDir, "embeddings")),
        numLists, iters, sampleFrac)
      val dim = cents.head._2.length
      val out = fs.create(new org.apache.hadoop.fs.Path(tsv), true)
      try out.write(
        (s"#kmeans numLists=$numLists dim=$dim" +:
          cents.map { case (id, c) => s"$id\t${c.mkString(",")}" })
          .mkString("\n").getBytes("UTF-8"))
      finally out.close()
      fs.create(new org.apache.hadoop.fs.Path(s"$dir/_SUCCESS"), true).close()
      cents
    }
  }

  /** One unrolled Lloyd iteration as DuckDB CTEs: assignment by
    * dot-product argmax (tie → smaller cid), quantized per-dim integer
    * sums, IEEE-double mean, empty lists keep the previous centroid —
    * the exact arithmetic kmeansCentroids runs, over the `tr` sample
    * CTE (the md5-fraction training set).
    */
  private def lloydIterSql(i: Int, prev: String): String =
    s"""a$i AS (SELECT u.vec_id, u.v, c.cid,
       |    row_number() OVER (PARTITION BY u.vec_id
       |      ORDER BY list_dot_product(u.v, c.cent) DESC, c.cid) AS rn
       |  FROM tr u CROSS JOIN $prev c),
       |l$i AS (SELECT vec_id, v, cid FROM a$i WHERE rn = 1),
       |s$i AS (SELECT cid, pos,
       |    CAST(sum(CAST(floor(v[pos] * ${MeanQ} + 0.5) AS BIGINT)) AS BIGINT) AS s,
       |    count(*) AS n
       |  FROM l$i, (SELECT unnest(range(1, 65)) AS pos) ps GROUP BY 1, 2),
       |m$i AS (SELECT cid,
       |    list(CAST(s AS DOUBLE) / CAST(n * ${MeanQ} AS DOUBLE) ORDER BY pos) AS cent
       |  FROM s$i GROUP BY 1),
       |c$i AS (SELECT p.cid, coalesce(m$i.cent, p.cent) AS cent
       |  FROM $prev p LEFT JOIN m$i USING (cid)),""".stripMargin

  /** The coarse score of q_ann_pq's oracle: the 8 subspace dots summed
    * left to right — term-for-term the association `sumScore` builds.
    */
  private def pqCoarseSumSql: String = pqCoarseSumSqlFor("u")

  private def pqCoarseSumSqlFor(alias: String): String = (0 until 8).map(m =>
    s"list_dot_product($alias.v[${m * 8 + 1} : ${m * 8 + 8}], " +
      s"c.cent[${m * 8 + 1} : ${m * 8 + 8}])").mkString(" + ")

  /** The CTE chain ending in `lists` — the full-corpus assignment
    * against the sample-refined 2-iteration Lloyd centroids, with
    * per-row norms. Shared as the common prefix of
    * q_ann_kmeans{,_indexed} AND q_semdedup so all three provably
    * replay the same quantizer.
    */
  private lazy val kmeansListsSql: String =
    s"""WITH u AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        |tr AS (SELECT * FROM u
        |  WHERE CAST(('0x' || substr(md5(CAST(vec_id AS VARCHAR)), 1, 8)) AS UINT32)
        |    / 4294967296.0 < 0.5),
        |c0 AS (
        |  SELECT CAST(row_number() OVER (ORDER BY md5(CAST(vec_id AS VARCHAR))) - 1
        |      AS BIGINT) AS cid, v AS cent
        |  FROM u
        |  QUALIFY row_number() OVER (ORDER BY md5(CAST(vec_id AS VARCHAR))) <= 16),
        |${lloydIterSql(1, "c0")}
        |${lloydIterSql(2, "c1")}
        |af AS (SELECT u.vec_id, u.v, c.cid,
        |    row_number() OVER (PARTITION BY u.vec_id
        |      ORDER BY list_dot_product(u.v, c.cent) DESC, c.cid) AS rn
        |  FROM u CROSS JOIN c2 c),
        |lists AS (
        |  SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS nrm, cid AS list_id
        |  FROM af WHERE rn = 1)""".stripMargin

  /** q_ann_kmeans' oracle — shared verbatim by q_ann_kmeans_indexed:
    * the persisted-index probe must reproduce the rebuild query
    * bit-for-bit, and one SQL string makes that contract literal.
    */
  private lazy val kmeansOracleSql: String =
    s"""$kmeansListsSql,
        |sims AS (
        |  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
        |    list_dot_product(q.v, c.v) / (q.nrm * c.nrm) AS cos_raw
        |  FROM lists q JOIN lists c USING (list_id)
        |  WHERE q.vec_id < 32 AND c.vec_id != q.vec_id)
        |SELECT query_id, neighbor_id, round(cos_raw, 4) AS cos
        |FROM sims
        |QUALIFY row_number() OVER (PARTITION BY query_id
        |  ORDER BY cos_raw DESC, neighbor_id) <= 3
        |ORDER BY query_id, neighbor_id""".stripMargin

  /** q_ann_ivf_delete's oracle: the kmeans probe replay with the
    * tombstoned ids (`vec_id % 7 == 3`) excluded from the CORPUS side
    * only — deleted vectors stop being findable but remain valid
    * queries, exactly what the tombstone mask and the compacted index
    * must both produce.
    */
  private lazy val kmeansDeleteOracleSql: String =
    s"""$kmeansListsSql,
        |sims AS (
        |  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
        |    list_dot_product(q.v, c.v) / (q.nrm * c.nrm) AS cos_raw
        |  FROM lists q JOIN lists c USING (list_id)
        |  WHERE q.vec_id < 32 AND c.vec_id != q.vec_id
        |    AND c.vec_id % 7 != 3)
        |SELECT query_id, neighbor_id, round(cos_raw, 4) AS cos
        |FROM sims
        |QUALIFY row_number() OVER (PARTITION BY query_id
        |  ORDER BY cos_raw DESC, neighbor_id) <= 3
        |ORDER BY query_id, neighbor_id""".stripMargin

  /** q_ann_ivf_upsert's oracle: the quantizer fit and the QUERY-side
    * assignment replay over the ORIGINAL corpus (the frozen-quantizer
    * contract — increments never refit), while the CANDIDATE side is
    * the MUTATED corpus: `vec_id % 5 == 1` rows carry `vec_id + 1`'s
    * vector (re-assigned against the same centroids, exactly what the
    * upsert's re-append does) and `vec_id % 7 == 3` rows are gone.
    */
  /** `kmeansListsSql` extended with the mutated-corpus assignment —
    * the common prefix of q_ann_ivf_upsert AND q_recall_churn, so the
    * monitor provably grades the same churn the upsert query declares.
    */
  private lazy val kmeansMutatedListsSql: String =
    s"""$kmeansListsSql,
        |um AS (
        |  SELECT a.vec_id,
        |    CASE WHEN a.vec_id % 5 = 1 AND a.vec_id % 7 != 3
        |              AND b.vec_id IS NOT NULL
        |         THEN CAST(b.embedding AS DOUBLE[])
        |         ELSE CAST(a.embedding AS DOUBLE[]) END AS v
        |  FROM embeddings a LEFT JOIN embeddings b ON b.vec_id = a.vec_id + 1
        |  WHERE a.vec_id % 7 != 3),
        |afm AS (SELECT um.vec_id, um.v, c.cid,
        |    row_number() OVER (PARTITION BY um.vec_id
        |      ORDER BY list_dot_product(um.v, c.cent) DESC, c.cid) AS rn
        |  FROM um CROSS JOIN c2 c),
        |listsm AS (
        |  SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS nrm, cid AS list_id
        |  FROM afm WHERE rn = 1)""".stripMargin

  private lazy val kmeansUpsertOracleSql: String =
    s"""$kmeansMutatedListsSql,
        |sims AS (
        |  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
        |    list_dot_product(q.v, c.v) / (q.nrm * c.nrm) AS cos_raw
        |  FROM lists q JOIN listsm c ON q.list_id = c.list_id
        |  WHERE q.vec_id < 32 AND c.vec_id != q.vec_id)
        |SELECT query_id, neighbor_id, round(cos_raw, 4) AS cos
        |FROM sims
        |QUALIFY row_number() OVER (PARTITION BY query_id
        |  ORDER BY cos_raw DESC, neighbor_id) <= 3
        |ORDER BY query_id, neighbor_id""".stripMargin

  /** q_recall_churn's oracle: recall@3 of the maintained (upserted)
    * index's nprobe=1 probe against an exhaustive brute-force ranking
    * over the SAME mutated corpus — both pipelines replayed end to
    * end, so a recall drift in the index and a bookkeeping bug in the
    * monitor both hash-mismatch (the q_recall_at_k contract, on the
    * index that absorbs churn).
    */
  private lazy val recallChurnOracleSql: String =
    s"""$kmeansMutatedListsSql,
        |isims AS (
        |  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
        |    list_dot_product(q.v, c.v) / (q.nrm * c.nrm) AS cos_raw
        |  FROM lists q JOIN listsm c ON q.list_id = c.list_id
        |  WHERE q.vec_id < 32 AND c.vec_id != q.vec_id),
        |approx AS (
        |  SELECT query_id, neighbor_id FROM isims
        |  QUALIFY row_number() OVER (PARTITION BY query_id
        |    ORDER BY cos_raw DESC, neighbor_id) <= 3),
        |bsims AS (
        |  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
        |    list_dot_product(q.v, c.v) / (q.nrm * c.nrm) AS cos_raw
        |  FROM lists q CROSS JOIN listsm c
        |  WHERE q.vec_id < 32 AND c.vec_id != q.vec_id),
        |truth AS (
        |  SELECT query_id, neighbor_id FROM bsims
        |  QUALIFY row_number() OVER (PARTITION BY query_id
        |    ORDER BY cos_raw DESC, neighbor_id) <= 3),
        |hits AS (
        |  SELECT t.query_id, count(*) AS hits
        |  FROM truth t JOIN approx a USING (query_id, neighbor_id)
        |  GROUP BY t.query_id)
        |SELECT p.query_id, CAST(coalesce(h.hits, 0) AS BIGINT) AS hits,
        |  round(coalesce(h.hits, 0) / 3.0, 4) AS recall
        |FROM (SELECT vec_id AS query_id FROM embeddings WHERE vec_id < 32) p
        |LEFT JOIN hits h USING (query_id)
        |ORDER BY query_id""".stripMargin

  /** q_semdedup's oracle: the shared quantizer replay, then the
    * within-cluster keep-min-id ε-dedup — a dropped survivor, a
    * surviving duplicate, or any drifted cluster id hash-mismatches.
    */
  private lazy val semdedupOracleSql: String =
    s"""$kmeansListsSql,
        |dropped AS (
        |  SELECT DISTINCT b.vec_id
        |  FROM lists a JOIN lists b USING (list_id)
        |  WHERE a.vec_id < b.vec_id
        |    AND list_dot_product(a.v, b.v) / (a.nrm * b.nrm) >= 0.4)
        |SELECT l.vec_id, l.list_id AS cid FROM lists l
        |WHERE l.vec_id NOT IN (SELECT vec_id FROM dropped)
        |ORDER BY l.vec_id""".stripMargin

  /** q_ann_pq's oracle — shared verbatim by q_ann_pq_indexed. */
  private lazy val pqOracleSql: String =
    s"""$pqAdcSql
        |SELECT query_id, neighbor_id,
        |  round(CAST(s AS DOUBLE) / ${LutQ}, 4) AS adot
        |FROM adc
        |QUALIFY row_number() OVER (PARTITION BY query_id
        |  ORDER BY s DESC, neighbor_id) <= 3
        |ORDER BY query_id, neighbor_id""".stripMargin

  /** The PQ pipeline replay up to the integer ADC scores — the shared
    * prefix of q_ann_pq{,_indexed,_delete} and q_recall_pq.
    */
  private lazy val pqAdcSql: String =
    s"""WITH u AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        |cb AS (
        |  SELECT CAST(row_number() OVER (ORDER BY md5(CAST(vec_id AS VARCHAR))) - 1
        |      AS BIGINT) AS cid, v AS cent
        |  FROM u
        |  QUALIFY row_number() OVER (ORDER BY md5(CAST(vec_id AS VARCHAR))) <= 16),
        |assign AS (
        |  SELECT u.vec_id, u.v, c.cid,
        |    row_number() OVER (PARTITION BY u.vec_id
        |      ORDER BY (${pqCoarseSumSql}) DESC, c.cid) AS rn
        |  FROM u CROSS JOIN cb c),
        |lists AS (SELECT vec_id, v, cid AS list_id FROM assign WHERE rn = 1),
        |ms AS (SELECT unnest(range(0, 8)) AS m),
        |subdot AS (
        |  SELECT l.vec_id, ms.m, c.cid AS j,
        |    list_dot_product(l.v[ms.m*8+1 : ms.m*8+8],
        |                     c.cent[ms.m*8+1 : ms.m*8+8]) AS d
        |  FROM lists l CROSS JOIN ms CROSS JOIN cb c),
        |codes AS (
        |  SELECT vec_id, m, j AS code FROM (
        |    SELECT vec_id, m, j,
        |      row_number() OVER (PARTITION BY vec_id, m ORDER BY d DESC, j) AS rn
        |    FROM subdot) WHERE rn = 1),
        |q AS (SELECT vec_id AS query_id, v AS qv, list_id
        |  FROM lists WHERE vec_id < 32),
        |lut AS (
        |  SELECT q.query_id, ms.m, c.cid AS j,
        |    CAST(floor(list_dot_product(q.qv[ms.m*8+1 : ms.m*8+8],
        |      c.cent[ms.m*8+1 : ms.m*8+8]) * ${LutQ} + 0.5) AS BIGINT) AS dq
        |  FROM q CROSS JOIN ms CROSS JOIN cb c),
        |cand AS (
        |  SELECT q.query_id, l.vec_id AS neighbor_id, c.m, c.code
        |  FROM q JOIN lists l USING (list_id)
        |  JOIN codes c ON c.vec_id = l.vec_id
        |  WHERE l.vec_id != q.query_id),
        |adc AS (
        |  SELECT c.query_id, c.neighbor_id, CAST(sum(l.dq) AS BIGINT) AS s
        |  FROM cand c JOIN lut l
        |    ON l.query_id = c.query_id AND l.m = c.m AND l.j = c.code
        |  GROUP BY 1, 2)""".stripMargin

  /** q_recall_pq's oracle: recall@3 of the compressed (ADC-ranked)
    * probe against the exact brute ranking on the same corpus — the
    * price of M-byte compression in recall, measured on a schedule.
    * Both pipelines replay end to end (the q_recall_at_k contract on
    * the compressed index).
    */
  private lazy val recallPqOracleSql: String =
    s"""$pqAdcSql,
        |approx AS (
        |  SELECT query_id, neighbor_id FROM adc
        |  QUALIFY row_number() OVER (PARTITION BY query_id
        |    ORDER BY s DESC, neighbor_id) <= 3),
        |bsims AS (
        |  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
        |    list_dot_product(q.v, c.v) /
        |      (sqrt(list_dot_product(q.v, q.v)) *
        |       sqrt(list_dot_product(c.v, c.v))) AS cos_raw
        |  FROM u q JOIN u c ON q.vec_id < 32 AND c.vec_id != q.vec_id),
        |truth AS (
        |  SELECT query_id, neighbor_id FROM bsims
        |  QUALIFY row_number() OVER (PARTITION BY query_id
        |    ORDER BY cos_raw DESC, neighbor_id) <= 3),
        |hits AS (
        |  SELECT t.query_id, count(*) AS hits
        |  FROM truth t JOIN approx a USING (query_id, neighbor_id)
        |  GROUP BY t.query_id)
        |SELECT p.query_id, CAST(coalesce(h.hits, 0) AS BIGINT) AS hits,
        |  round(coalesce(h.hits, 0) / 3.0, 4) AS recall
        |FROM (SELECT vec_id AS query_id FROM embeddings WHERE vec_id < 32) p
        |LEFT JOIN hits h USING (query_id)
        |ORDER BY query_id""".stripMargin

  /** q_ann_pq_delete's oracle: the PQ probe replay with the
    * tombstoned ids (`vec_id % 7 == 3`) excluded from the CANDIDATE
    * side only — deleted vectors remain valid queries but stop being
    * findable, the same contract as `q_ann_ivf_delete` on the
    * compressed-code index.
    */
  private lazy val pqDeleteOracleSql: String = {
    val marker = "WHERE l.vec_id != q.query_id)"
    val patched = pqOracleSql.replace(marker,
      "WHERE l.vec_id != q.query_id AND l.vec_id % 7 != 3)")
    require(patched != pqOracleSql, "pq oracle candidate filter drifted")
    patched
  }

  /** q_ann_pq_upsert's oracle: the q_ann_ivf_upsert mutation replayed
    * through the FULL PQ pipeline — codebook sampled from the ORIGINAL
    * corpus (frozen across increments by contract), query side
    * assigned and LUT-built from the original vectors, while the
    * CANDIDATE side (coarse assignment AND subspace codes) re-derives
    * from the MUTATED corpus: `vec_id % 5 == 1` rows carry
    * `vec_id + 1`'s vector, `vec_id % 7 == 3` rows are gone. The
    * compression is re-checked end to end on the churned rows.
    */
  private lazy val pqUpsertOracleSql: String =
    s"""WITH u AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        |cb AS (
        |  SELECT CAST(row_number() OVER (ORDER BY md5(CAST(vec_id AS VARCHAR))) - 1
        |      AS BIGINT) AS cid, v AS cent
        |  FROM u
        |  QUALIFY row_number() OVER (ORDER BY md5(CAST(vec_id AS VARCHAR))) <= 16),
        |assign AS (
        |  SELECT u.vec_id, u.v, c.cid,
        |    row_number() OVER (PARTITION BY u.vec_id
        |      ORDER BY (${pqCoarseSumSql}) DESC, c.cid) AS rn
        |  FROM u CROSS JOIN cb c),
        |lists AS (SELECT vec_id, v, cid AS list_id FROM assign WHERE rn = 1),
        |um AS (
        |  SELECT a.vec_id,
        |    CASE WHEN a.vec_id % 5 = 1 AND a.vec_id % 7 != 3
        |              AND b.vec_id IS NOT NULL
        |         THEN CAST(b.embedding AS DOUBLE[])
        |         ELSE CAST(a.embedding AS DOUBLE[]) END AS v
        |  FROM embeddings a LEFT JOIN embeddings b ON b.vec_id = a.vec_id + 1
        |  WHERE a.vec_id % 7 != 3),
        |assignm AS (
        |  SELECT um.vec_id, um.v, c.cid,
        |    row_number() OVER (PARTITION BY um.vec_id
        |      ORDER BY (${pqCoarseSumSqlFor("um")}) DESC, c.cid) AS rn
        |  FROM um CROSS JOIN cb c),
        |listsm AS (SELECT vec_id, v, cid AS list_id FROM assignm WHERE rn = 1),
        |ms AS (SELECT unnest(range(0, 8)) AS m),
        |subdot AS (
        |  SELECT l.vec_id, ms.m, c.cid AS j,
        |    list_dot_product(l.v[ms.m*8+1 : ms.m*8+8],
        |                     c.cent[ms.m*8+1 : ms.m*8+8]) AS d
        |  FROM listsm l CROSS JOIN ms CROSS JOIN cb c),
        |codes AS (
        |  SELECT vec_id, m, j AS code FROM (
        |    SELECT vec_id, m, j,
        |      row_number() OVER (PARTITION BY vec_id, m ORDER BY d DESC, j) AS rn
        |    FROM subdot) WHERE rn = 1),
        |q AS (SELECT vec_id AS query_id, v AS qv, list_id
        |  FROM lists WHERE vec_id < 32),
        |lut AS (
        |  SELECT q.query_id, ms.m, c.cid AS j,
        |    CAST(floor(list_dot_product(q.qv[ms.m*8+1 : ms.m*8+8],
        |      c.cent[ms.m*8+1 : ms.m*8+8]) * ${LutQ} + 0.5) AS BIGINT) AS dq
        |  FROM q CROSS JOIN ms CROSS JOIN cb c),
        |cand AS (
        |  SELECT q.query_id, l.vec_id AS neighbor_id, c.m, c.code
        |  FROM q JOIN listsm l USING (list_id)
        |  JOIN codes c ON c.vec_id = l.vec_id
        |  WHERE l.vec_id != q.query_id),
        |adc AS (
        |  SELECT c.query_id, c.neighbor_id, CAST(sum(l.dq) AS BIGINT) AS s
        |  FROM cand c JOIN lut l
        |    ON l.query_id = c.query_id AND l.m = c.m AND l.j = c.code
        |  GROUP BY 1, 2)
        |SELECT query_id, neighbor_id,
        |  round(CAST(s AS DOUBLE) / ${LutQ}, 4) AS adot
        |FROM adc
        |QUALIFY row_number() OVER (PARTITION BY query_id
        |  ORDER BY s DESC, neighbor_id) <= 3
        |ORDER BY query_id, neighbor_id""".stripMargin

  /** Majority vote over a (query_id, neighbor_id, …) top-k frame
    * against the labeled corpus: each query takes the most frequent
    * neighbor label (vote ties → smallest label). One groupBy + one
    * tiny window over k rows per query — composes with ANY top-k
    * generator above, which is what makes kNN classification run on
    * whichever candidate path (brute/LSH/IVF/PQ) the scale calls for.
    */
  private def majorityVote(topK: DataFrame, labeled: DataFrame): DataFrame = {
    val w = Window.partitionBy("query_id")
      .orderBy(col("votes").desc, col("label"))
    topK
      .join(labeled.select(col("vec_id").as("neighbor_id"), col("label")),
        "neighbor_id")
      .groupBy("query_id", "label").agg(count(lit(1)).as("votes"))
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .select(col("query_id").as("vec_id"),
        col("label").as("pred_label"), col("votes"))
      .orderBy("vec_id")
  }

  /** Per-label mean vector, flat (label, pos, c) rows — one map-side
    * partial aggregate whose state is labels×dim cells however large
    * the corpus grows (the Rocchio/class-prototype primitive).
    * `pos` is 1-based to line up with the oracle's
    * generate_subscripts.
    */
  def labelCentroids(emb: DataFrame): DataFrame =
    emb.select(col("label"),
        posexplode(col("embedding").cast("array<double>")).as(Seq("p", "x")))
      .groupBy(col("label"), (col("p") + 1).as("pos"))
      .agg(avg("x").as("c"))

  private def ddot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

  /** Embedding-space drift between two snapshots — q_psi_drift's
    * counterpart for the vector table: per label, the cosine between
    * the label's centroid in the old slice and in the new one (1.0 =
    * the class prototype did not move), plus both population counts.
    * The audit a router/classifier owner reads before trusting last
    * snapshot's model against this snapshot's space. Two labels×dim
    * map-side aggregates and a label-count-sized join — output is
    * |labels| rows at any corpus size.
    */
  def centroidDrift(emb: DataFrame, isNew: Column): DataFrame = {
    val flat = spreadScan(emb)
      .select(col("label"), isNew.as("__new"),
        posexplode(col("embedding").cast("array<double>")).as(Seq("p", "x")))
      .groupBy(col("label"), col("__new"), (col("p") + 1).as("pos"))
      .agg(avg("x").as("c"), count(lit(1)).as("__n"))
    val byv = flat.groupBy(col("label"), col("__new"))
      .agg(transform(array_sort(collect_list(struct(col("pos"), col("c")))),
        s => s.getField("c")).as("c_v"),
        max("__n").as("n"))
    val a = byv.filter(!col("__new"))
      .select(col("label"), col("c_v").as("v_a"), col("n").as("n_old"))
    val b = byv.filter(col("__new"))
      .select(col("label"), col("c_v").as("v_b"), col("n").as("n_new"))
    a.join(b, Seq("label"))
      .select(col("label"), col("n_old"), col("n_new"),
        round(ddot(col("v_a"), col("v_b")) /
          (sqrt(ddot(col("v_a"), col("v_a"))) *
            sqrt(ddot(col("v_b"), col("v_b")))), 6).as("drift_cos"))
  }

  /** Nearest-centroid (Rocchio) classification: every vector scored
    * against the broadcast label centroids — corpus side is map-only,
    * the only shuffle is the labels×dim centroid aggregate, so the
    * shape is linear in the corpus with a bounded (label-count)
    * broadcast. Ranking compares the 6-dp-rounded cosine (ties → by
    * label), which is what makes the argmax replayable across engines
    * despite the centroid averages' last-ulp sum-order drift.
    */
  def nearestCentroid(emb: DataFrame): DataFrame = {
    val cv = labelCentroids(emb)
      .groupBy(col("label").as("c_label"))
      .agg(transform(array_sort(collect_list(struct(col("pos"), col("c")))),
        s => s.getField("c")).as("c_v"))
      .withColumn("c_norm", sqrt(ddot(col("c_v"), col("c_v"))))
    val v = emb.select(col("vec_id"), col("label"),
        col("embedding").cast("array<double>").as("v"))
      .withColumn("v_norm", sqrt(ddot(col("v"), col("v"))))
    val w = Window.partitionBy("vec_id")
      .orderBy(col("cos").desc, col("c_label"))
    v.crossJoin(broadcast(cv))
      .withColumn("cos",
        round(ddot(col("v"), col("c_v")) / (col("v_norm") * col("c_norm")), 6))
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .select(col("vec_id"), col("label"), col("c_label").as("pred_label"),
        col("cos"))
  }

  /** Greedy maximal-marginal-relevance selection — the diverse-panel
    * primitive (few-shot exemplars, eval panels, labeling batches):
    * pick `k` vectors maximizing `lambda·rel − divWeight·max_{s∈S}
    * cos(d, s)`, where relevance is cosine to a deterministic seed
    * (the md5-min vector, the same 1-sample rule as the IVF coarse
    * quantizer). Ties break on vec_id at every step.
    *
    * `lambda` and `divWeight` are SEPARATE parameters, not
    * `1 − lambda`: the subtraction `1 − 0.7` produces a different
    * double than the literal `0.3` an external engine parses, and the
    * oracle replays scores bit-for-bit.
    *
    * Scale shape: the scored frame (id, embedding, norm, rel)
    * persists once; each of the k greedy steps is one narrow pass
    * over it — a filter, a per-row max over ≤k broadcast literal
    * vectors, and a TakeOrdered(1). Driver state is k rows (the
    * selected vectors), k is panel-sized by contract. O(k·corpus)
    * total, embarrassingly parallel per step.
    */
  def mmrSelect(corpus: DataFrame, k: Int, lambda: Double = 0.7,
      divWeight: Double = 0.3): DataFrame = {
    val spark = corpus.sparkSession
    import spark.implicits._
    def dotD(a: Seq[Double], b: Seq[Double]): Double = {
      var s = 0.0; var i = 0
      while (i < a.length) { s += a(i) * b(i); i += 1 }
      s
    }
    // a panel from an empty corpus is an empty panel, not a crash at
    // the seed fetch (round-8 review finding)
    val seedRows = corpus
      .withColumn("__rk", md5(col("vec_id").cast("string")))
      .orderBy(col("__rk"), col("vec_id")).limit(1)
      .select("embedding").collect()
    if (seedRows.isEmpty)
      return Seq.empty[(Int, Long, Double)].toDF("rank", "vec_id", "mmr")
    val seed = seedRows(0).getAs[scala.collection.Seq[Float]](0)
      .map(_.toDouble).toSeq
    val seedNorm = math.sqrt(dotD(seed, seed))
    val frame = graft.InternalCaches.track(
      spreadScan(corpus.select(col("vec_id"), col("embedding")))
        .withColumn("__nrm", sqrt(fdot(col("embedding"), col("embedding"))))
        .withColumn("__rel",
          fdot(col("embedding"), typedlit(seed)) /
            (col("__nrm") * lit(seedNorm)))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    // (id, vector, norm, score-at-selection) — k rows of driver state
    var selected = Vector.empty[(Long, Seq[Double], Double, Double)]
    var exhausted = false
    while (selected.size < k && !exhausted) {
      val div =
        if (selected.isEmpty) lit(0.0)
        else selected.map { case (_, v, n, _) =>
          fdot(col("embedding"), typedlit(v)) / (col("__nrm") * lit(n))
        }.reduce(greatest(_, _))
      val remaining =
        if (selected.isEmpty) frame
        else frame.filter(!col("vec_id").isin(selected.map(_._1): _*))
      // k past the corpus size returns the full corpus as the panel —
      // not a mid-loop crash (round-8 review finding)
      remaining
        .withColumn("__score",
          lit(lambda) * col("__rel") - lit(divWeight) * div)
        .orderBy(col("__score").desc, col("vec_id")).limit(1)
        .select("vec_id", "embedding", "__nrm", "__score")
        .collect().headOption match {
        case None => exhausted = true
        case Some(best) => selected :+= ((best.getLong(0),
          best.getAs[scala.collection.Seq[Float]](1).map(_.toDouble).toSeq,
          best.getDouble(2), best.getDouble(3)))
      }
    }
    selected.zipWithIndex.map { case ((id, _, _, sc), i) =>
      (i + 1, id,
        BigDecimal(sc).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble)
    }.toDF("rank", "vec_id", "mmr")
  }

  /** Batched-greedy MMR (VERDICT r8 #9): PROVABLY identical output to
    * [[mmrSelect]] in ~k/`batch` driver round-trips instead of k.
    * Each round collects the top `batch`+1 candidates by current
    * score, then admits greedily ON THE DRIVER, recomputing scores
    * against just-admitted members with the same arithmetic the
    * cluster would run (fdot is an in-order double accumulation over
    * float→double casts — exact to replicate; `greatest` folds left
    * with NaN-greatest semantics, mirrored by `gmax`). Admission is
    * exact, not heuristic, because adding a member can only RAISE a
    * candidate's max-diversity, i.e. scores only decrease: the
    * (batch+1)-th collected score is an upper bound on every
    * uncollected candidate, so a batch member whose recomputed
    * (score, vec_id) still beats that bound is the true global
    * argmax. The first admission of every round always passes (its
    * start score tops the collected order), so progress is
    * guaranteed and a batch of 1 degenerates to the sequential
    * algorithm. When the bound stops the round, the next cluster
    * pass re-scores fresh — no approximation anywhere.
    */
  def mmrSelectBatched(corpus: DataFrame, k: Int, lambda: Double = 0.7,
      divWeight: Double = 0.3, batch: Int = 8): DataFrame = {
    require(batch > 0, "batch must be positive")
    val spark = corpus.sparkSession
    import spark.implicits._
    def dotD(a: Seq[Double], b: Seq[Double]): Double = {
      var s = 0.0; var i = 0
      while (i < math.min(a.length, b.length)) { s += a(i) * b(i); i += 1 }
      s
    }
    // Spark's Greatest/sort ordering: NaN greater than everything
    def gmax(a: Double, b: Double): Double =
      if (java.lang.Double.compare(a, b) >= 0) a else b
    // the (score DESC, vec_id ASC) selection order
    def beats(s1: Double, id1: Long, s2: Double, id2: Long): Boolean = {
      val c = java.lang.Double.compare(s1, s2)
      c > 0 || (c == 0 && id1 < id2)
    }
    val seedRows = corpus
      .withColumn("__rk", md5(col("vec_id").cast("string")))
      .orderBy(col("__rk"), col("vec_id")).limit(1)
      .select("embedding").collect()
    if (seedRows.isEmpty)
      return Seq.empty[(Int, Long, Double)].toDF("rank", "vec_id", "mmr")
    val seed = seedRows(0).getAs[scala.collection.Seq[Float]](0)
      .map(_.toDouble).toSeq
    val seedNorm = math.sqrt(dotD(seed, seed))
    val frame = graft.InternalCaches.track(
      spreadScan(corpus.select(col("vec_id"), col("embedding")))
        .withColumn("__nrm", sqrt(fdot(col("embedding"), col("embedding"))))
        .withColumn("__rel",
          fdot(col("embedding"), typedlit(seed)) /
            (col("__nrm") * lit(seedNorm)))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    var selected = Vector.empty[(Long, Seq[Double], Double, Double)]
    var exhausted = false
    while (selected.size < k && !exhausted) {
      // the round's cluster pass: EXACTLY the sequential step's score
      // expression w.r.t. the current selected set
      val div =
        if (selected.isEmpty) lit(0.0)
        else selected.map { case (_, v, n, _) =>
          fdot(col("embedding"), typedlit(v)) / (col("__nrm") * lit(n))
        }.reduce(greatest(_, _))
      val remaining =
        if (selected.isEmpty) frame
        else frame.filter(!col("vec_id").isin(selected.map(_._1): _*))
      val want = math.min(batch, k - selected.size)
      val rows = remaining
        .withColumn("__div", div)
        .withColumn("__score",
          lit(lambda) * col("__rel") - lit(divWeight) * col("__div"))
        .orderBy(col("__score").desc, col("vec_id")).limit(want + 1)
        .select("vec_id", "embedding", "__nrm", "__rel", "__div", "__score")
        .collect()
      if (rows.isEmpty) exhausted = true
      else {
        val bound =
          if (rows.length == want + 1)
            Some((rows(want).getDouble(5), rows(want).getLong(0)))
          else None
        // (id, vec, nrm, rel, div, score); div's fold so far is over
        // the round-start selected set — empty set means the 0.0 in
        // the score is a LITERAL, not a fold identity (cosines can be
        // negative), so track fold-emptiness explicitly
        var hasDiv = selected.nonEmpty
        val cands = scala.collection.mutable.ArrayBuffer.from(
          rows.take(want).map(r => (r.getLong(0),
            r.getAs[scala.collection.Seq[Float]](1).map(_.toDouble).toSeq,
            r.getDouble(2), r.getDouble(3), r.getDouble(4), r.getDouble(5))))
        var roundOpen = true
        while (roundOpen && cands.nonEmpty && selected.size < k) {
          var bi = 0
          var i = 1
          while (i < cands.length) {
            if (beats(cands(i)._6, cands(i)._1, cands(bi)._6, cands(bi)._1)) bi = i
            i += 1
          }
          val best = cands(bi)
          if (!bound.forall { case (bs, bid) => beats(best._6, best._1, bs, bid) })
            roundOpen = false
          else {
            selected :+= ((best._1, best._2, best._3, best._6))
            cands.remove(bi)
            // continue each survivor's left fold with the new member
            var j = 0
            while (j < cands.length) {
              val (id, v, nrm, rel, d, _) = cands(j)
              val nd0 = dotD(v, best._2) / (nrm * best._3)
              val nd = if (hasDiv) gmax(d, nd0) else nd0
              cands(j) = (id, v, nrm, rel, nd,
                lambda * rel - divWeight * nd)
              j += 1
            }
            hasDiv = true
          }
        }
      }
    }
    selected.zipWithIndex.map { case ((id, _, _, sc), i) =>
      (i + 1, id,
        BigDecimal(sc).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble)
    }.toDF("rank", "vec_id", "mmr")
  }

  def defs: Map[String, QueryDef] = Map(

    // Per-label mean embedding, emitted flat so the oracle replays
    // every cell: a drifted dimension, a dropped label, or a
    // wrong-order assembly all hash-mismatch.
    "q_label_centroid" -> QueryDef(
      (s, dir) => labelCentroids(table(s, dir, "embeddings"))
        .select(col("label"), col("pos"), round(col("c"), 6).as("c"))
        .orderBy("label", "pos"),
      """SELECT label, pos, round(avg(x), 6) AS c
        |FROM (SELECT label, unnest(CAST(embedding AS DOUBLE[])) AS x,
        |        generate_subscripts(embedding, 1) AS pos
        |      FROM embeddings)
        |GROUP BY label, pos ORDER BY label, pos""".stripMargin),

    // Centroid drift between the vec_id-parity snapshot halves (the
    // doc_id % k slice pattern): per label, the old/new prototype
    // cosine plus both populations. On harness data every label's
    // halves are same-distribution draws, so drift_cos sits near 1 —
    // and the oracle replays the centroids, counts, and every cosine,
    // so a slice leak or a flipped join mismatches regardless.
    "q_centroid_drift" -> QueryDef(
      (s, dir) => centroidDrift(table(s, dir, "embeddings"),
        pmod(col("vec_id"), lit(2)) === 1)
        .orderBy("label"),
      """WITH e AS (SELECT vec_id, label, vec_id % 2 = 1 AS nw,
        |    CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        |flat AS (SELECT label, nw, unnest(v) AS x,
        |    generate_subscripts(v, 1) AS pos FROM e),
        |cent AS (SELECT label, nw, pos, avg(x) AS c, count(*) AS n
        |  FROM flat GROUP BY 1, 2, 3),
        |cv AS (SELECT label, nw, list(c ORDER BY pos) AS c_v, max(n) AS n
        |  FROM cent GROUP BY 1, 2)
        |SELECT a.label, a.n AS n_old, b.n AS n_new,
        |  round(list_dot_product(a.c_v, b.c_v) /
        |    (sqrt(list_dot_product(a.c_v, a.c_v)) *
        |     sqrt(list_dot_product(b.c_v, b.c_v))), 6) AS drift_cos
        |FROM cv a JOIN cv b ON a.label = b.label AND NOT a.nw AND b.nw
        |ORDER BY a.label""".stripMargin),

    // Nearest-centroid classification of the whole corpus — the
    // oracle rebuilds the centroids, the cosine scores, and the
    // rounded-rank argmax end to end.
    "q_nearest_centroid" -> QueryDef(
      (s, dir) => nearestCentroid(table(s, dir, "embeddings"))
        .orderBy("vec_id"),
      """WITH e AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v
        |  FROM embeddings),
        |flat AS (SELECT label, unnest(v) AS x,
        |    generate_subscripts(v, 1) AS pos FROM e),
        |cent AS (SELECT label AS c_label, pos, avg(x) AS c
        |  FROM flat GROUP BY 1, 2),
        |cv AS (SELECT c_label, list(c ORDER BY pos) AS c_v
        |  FROM cent GROUP BY 1),
        |scored AS (
        |  SELECT e.vec_id, e.label, cv.c_label,
        |    round(list_dot_product(e.v, cv.c_v) /
        |      (sqrt(list_dot_product(e.v, e.v)) *
        |       sqrt(list_dot_product(cv.c_v, cv.c_v))), 6) AS cos
        |  FROM e CROSS JOIN cv)
        |SELECT vec_id, label, c_label AS pred_label, cos
        |FROM scored
        |QUALIFY row_number() OVER (PARTITION BY vec_id
        |  ORDER BY cos DESC, c_label) = 1
        |ORDER BY vec_id""".stripMargin),

    // IVF with k-means-refined centroids: md5-rank hash init (no
    // count() pre-pass), two SAMPLE-BASED Lloyd iterations
    // (argmax-dot assignment + quantized-mean update over the
    // deterministic md5-fraction half of the corpus — the 100 TB
    // shape), then ONE full-corpus assignment inside the standard
    // inverted-list probe. Every step is deterministic
    // integer-or-IEEE math, so the oracle replays the full refinement
    // — sample membership included; a drifted centroid anywhere
    // changes list membership and hash-mismatches.
    "q_ann_kmeans" -> QueryDef(
      (s, dir) => {
        val e = table(s, dir, "embeddings")
        kmeansTopK(e, e.filter(col("vec_id") < 32), k = 3, sampleFrac = 0.5)
          .orderBy("query_id", "neighbor_id")
      },
      kmeansOracleSql),

    // The build-once-probe-many twin of q_ann_kmeans: the Lloyd
    // refinement + full-corpus assignment persist as a list-partitioned
    // index (first run per source builds it; every run after — this
    // process or the next — reads only the probed list directories).
    // SAME oracle string as q_ann_kmeans: index reuse must be
    // invisible in the results.
    "q_ann_kmeans_indexed" -> QueryDef(
      (s, dir) => {
        val e = table(s, dir, "embeddings")
        probeIvfIndex(s, ensureIvfIndex(s, dir),
            e.filter(col("vec_id") < 32), k = 3)
          .orderBy("query_id", "neighbor_id")
      },
      kmeansOracleSql),

    // Incremental index MAINTENANCE (round 11): the corpus lands as
    // two disjoint increments appended against the frozen quantizer —
    // no rebuild, postings grow batch by batch, probes read the
    // union. SAME oracle string as q_ann_kmeans{,_indexed}: an
    // incrementally-grown index must answer bit-for-bit like the
    // batch-built one, which is the entire contract of append-only
    // maintenance.
    "q_ann_ivf_incremental" -> QueryDef(
      (s, dir) => {
        val e = table(s, dir, "embeddings")
        probeIvfIncremental(s, ensureIvfIncremental(s, dir),
            ensureKmeansQuantizer(s, dir),
            e.filter(col("vec_id") < 32), k = 3)
          .orderBy("query_id", "neighbor_id")
      },
      kmeansOracleSql),

    // Index DELETION + COMPACTION (round 11): tombstone every
    // `vec_id % 7 == 3` vector, compact, probe — the oracle replays
    // the batch build over the corpus MINUS the deleted ids, so it
    // grades the physically-rewritten postings (the
    // right-to-be-forgotten path: after compaction the bytes are
    // gone, not just masked). The pre-compaction tombstone mask is
    // spec-pinned equal to this result.
    "q_ann_ivf_delete" -> QueryDef(
      (s, dir) => {
        val e = table(s, dir, "embeddings")
        probeIvfIncremental(s, ensureIvfDeleted(s, dir),
            ensureKmeansQuantizer(s, dir),
            e.filter(col("vec_id") < 32), k = 3)
          .orderBy("query_id", "neighbor_id")
      },
      kmeansDeleteOracleSql),

    // CDC UPSERT through the index (round 11): one change batch
    // re-embeds every vec_id % 5 == 1 document (tombstone + same-batch
    // re-append with the new vector) and takes down every
    // vec_id % 7 == 3. The oracle replays the mutation in SQL against
    // the FROZEN quantizer — probes must rank re-embedded docs by
    // their new vectors and never surface a takedown.
    "q_ann_ivf_upsert" -> QueryDef(
      (s, dir) => {
        val e = table(s, dir, "embeddings")
        probeIvfIncremental(s, ensureIvfUpserted(s, dir),
            ensureKmeansQuantizer(s, dir),
            e.filter(col("vec_id") < 32), k = 3)
          .orderBy("query_id", "neighbor_id")
      },
      kmeansUpsertOracleSql),

    // Index-health monitor #1 (round 11): per-list posting counts and
    // the max/mean imbalance of the maintained index — a probe opens
    // nprobe lists, so one hot list IS the tail latency, and growing
    // imbalance is the quantizer-retrain signal alongside
    // q_centroid_drift. |lists| rows at any corpus size.
    "q_index_stats" -> QueryDef(
      (s, dir) =>
        ivfIndexStats(s, ensureIvfIncremental(s, dir))
          .orderBy("list_id"),
      s"""$kmeansListsSql,
          |lc AS (SELECT list_id, CAST(count(*) AS BIGINT) AS n_postings
          |  FROM lists GROUP BY 1),
          |t AS (SELECT CAST(sum(n_postings) AS BIGINT) AS total,
          |  max(n_postings) AS mx, count(*) AS k FROM lc)
          |SELECT list_id, n_postings,
          |  round(n_postings * 1.0 / total, 4) AS share,
          |  round(mx * k * 1.0 / total, 4) AS imbalance
          |FROM lc, t ORDER BY list_id""".stripMargin),

    // Index-health monitor #2 (round 11): recall@3 of the CHURNED
    // (upserted+deleted) index's probe against an exhaustive brute
    // ranking over the same mutated corpus — "did churn silently
    // degrade my index" is THE production question an incremental ANN
    // deployment asks, and this is its scheduled answer. Per-query
    // rows; the panel is fixed, the brute side is the deliberate
    // eval-sized exhaustive pass (32 queries, not the corpus²).
    "q_recall_churn" -> QueryDef(
      (s, dir) => {
        val e = table(s, dir, "embeddings")
        val panel = e.filter(col("vec_id") < 32)
        val got = probeIvfIncremental(s, ensureIvfUpserted(s, dir),
            ensureKmeansQuantizer(s, dir), panel, k = 3)
          .select(col("query_id"), col("neighbor_id"))
        val next = e.select((col("vec_id") - 1).as("vec_id"),
          col("embedding").as("__new_emb"))
        val mutated = e.join(next, Seq("vec_id"), "left")
          .filter(pmod(col("vec_id"), lit(7)) =!= 3)
          .select(col("vec_id"),
            when(pmod(col("vec_id"), lit(5)) === 1 &&
                col("__new_emb").isNotNull,
              col("__new_emb")).otherwise(col("embedding")).as("embedding"))
        val truth = bruteForceTopK(mutated, panel, k = 3)
          .select(col("query_id"), col("neighbor_id"))
        val hits = truth.join(got, Seq("query_id", "neighbor_id"))
          .groupBy("query_id").agg(count(lit(1)).as("hits"))
        panel.select(col("vec_id").as("query_id"))
          .join(hits, Seq("query_id"), "left")
          .select(col("query_id"),
            coalesce(col("hits"), lit(0L)).as("hits"),
            round(coalesce(col("hits"), lit(0L)) / lit(3.0), 4).as("recall"))
          .orderBy("query_id")
      },
      recallChurnOracleSql),

    // SemDeDup (Abbas et al. 2023, arXiv:2303.09540): semantic
    // dedup = cluster the embedding space, then keep one exemplar per
    // within-cluster epsilon-ball. Re-expressed Spark-first: the SAME
    // sample-refined Lloyd quantizer as q_ann_kmeans assigns every
    // vector a cluster id; candidate pairs are an EQUI-join on that
    // id (Σ|cluster|² pairs, bounded by the quantizer's balance —
    // never n², and at 100 TB the clusters are the IVF partition keys
    // so the dedup runs list-local with AQE splitting any fat
    // cluster); a vector drops when a lower-id cluster-mate clears
    // the cosine bar. The paper leaves the per-ball exemplar choice
    // free — keep-min-id makes it deterministic, so the WHOLE
    // operator (quantizer, assignment, pairs, survivors) replays in
    // the oracle. The assignment persists: it feeds both pair sides
    // and the survivor anti-join.
    "q_semdedup" -> QueryDef(
      (s, dir) => {
        val e = spreadScan(table(s, dir, "embeddings"))
        val cents = ensureKmeansQuantizer(s, dir)
        val assigned = graft.InternalCaches.track(
          e.select(col("vec_id"), col("embedding"))
            .withColumn("cid", nearestCentroid(col("embedding"), cents))
            .withColumn("nrm", sqrt(fdot(col("embedding"), col("embedding"))))
            .persist())
        val a = assigned.select(col("cid"), col("vec_id").as("id_a"),
          col("embedding").as("v_a"), col("nrm").as("n_a"))
        val b = assigned.select(col("cid"), col("vec_id").as("id_b"),
          col("embedding").as("v_b"), col("nrm").as("n_b"))
        val dropped = a.join(b, Seq("cid"))
          .filter(col("id_a") < col("id_b"))
          // threshold on the RAW double, same expression as the oracle
          .filter(fdot(col("v_a"), col("v_b")) / (col("n_a") * col("n_b"))
            >= lit(0.4))
          .select(col("id_b").as("vec_id")).distinct()
        assigned.join(dropped, Seq("vec_id"), "left_anti")
          .select(col("vec_id"), col("cid"))
          .orderBy("vec_id")
      },
      semdedupOracleSql),

    // Corpus composition map over the SHARED quantizer (the third
    // consumer after q_ann_kmeans and q_semdedup — one oracle prefix
    // proves all of them replay the same clustering): per cluster,
    // the size, corpus share, majority label, and label purity — the
    // domain-discovery table a mixture planner (DoReMi-style) reads
    // before setting sampling weights. 16-row output at any corpus
    // size; the label histogram is one map-side-combined groupBy.
    "q_corpus_map" -> QueryDef(
      (s, dir) => {
        val e = spreadScan(table(s, dir, "embeddings"))
        val cents = ensureKmeansQuantizer(s, dir)
        val lc = graft.InternalCaches.track(
          e.select(col("vec_id"), col("label"), col("embedding"))
            .withColumn("cid", nearestCentroid(col("embedding"), cents))
            .groupBy("cid", "label").agg(count(lit(1)).as("c"))
            .persist())
        val cn = lc.groupBy("cid").agg(sum("c").cast("long").as("n"))
        val w = Window.partitionBy("cid").orderBy(col("c").desc, col("label"))
        val mj = lc.withColumn("rn", row_number().over(w))
          .filter(col("rn") === 1)
          .select(col("cid"), col("label").as("maj_label"),
            col("c").as("n_maj"))
        val tot = broadcast(lc.agg(sum("c").cast("long").as("t")))
        cn.join(mj, "cid").crossJoin(tot)
          .select(col("cid"), col("n"),
            round(col("n") * lit(1.0) / col("t"), 4).as("share"),
            col("maj_label"),
            round(col("n_maj") * lit(1.0) / col("n"), 4).as("purity"))
          .orderBy("cid")
      },
      s"""$kmeansListsSql,
         |lab AS (
         |  SELECT l.list_id AS cid, u2.label
         |  FROM lists l JOIN embeddings u2 ON u2.vec_id = l.vec_id),
         |lc AS (SELECT cid, label, count(*) AS c FROM lab GROUP BY 1, 2),
         |tot AS (SELECT CAST(sum(c) AS BIGINT) AS t FROM lc),
         |cn AS (SELECT cid, CAST(sum(c) AS BIGINT) AS n FROM lc GROUP BY 1),
         |mj AS (
         |  SELECT cid, label AS maj_label, c AS n_maj FROM lc
         |  QUALIFY row_number() OVER (PARTITION BY cid
         |    ORDER BY c DESC, label) = 1)
         |SELECT cn.cid, n, round(n * 1.0 / t, 4) AS share,
         |  maj_label, round(n_maj * 1.0 / n, 4) AS purity
         |FROM cn JOIN mj USING (cid), tot ORDER BY cid""".stripMargin),

    // IVF-bucketed ANN. The index is fully deterministic (md5-rank
    // hash centroids — one TakeOrderedAndProject job, no count()
    // pre-pass — then argmax-dot assignment), so the oracle rebuilds
    // the same inverted lists and replays the probe — approximation
    // and all. Cluster-recovery behavior is additionally asserted in
    // SimilaritySpec.
    "q_ann_ivf" -> QueryDef(
      (s, dir) => {
        val e = table(s, dir, "embeddings")
        ivfTopK(e, e.filter(col("vec_id") < 32), k = 3)
          .orderBy("query_id", "neighbor_id")
      },
      """WITH u AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        |cents AS (
        |  SELECT CAST(row_number() OVER (ORDER BY md5(CAST(vec_id AS VARCHAR))) - 1
        |      AS BIGINT) AS centroid_id, v AS cent
        |  FROM u
        |  QUALIFY row_number() OVER (ORDER BY md5(CAST(vec_id AS VARCHAR))) <= 16),
        |assign AS (
        |  SELECT u.vec_id, u.v, c.centroid_id,
        |    row_number() OVER (PARTITION BY u.vec_id
        |      ORDER BY list_dot_product(u.v, c.cent) DESC, c.centroid_id) AS rn
        |  FROM u CROSS JOIN cents c),
        |lists AS (
        |  SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS nrm,
        |    centroid_id AS list_id
        |  FROM assign WHERE rn = 1),
        |sims AS (
        |  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
        |    list_dot_product(q.v, c.v) / (q.nrm * c.nrm) AS cos_raw
        |  FROM lists q JOIN lists c USING (list_id)
        |  WHERE q.vec_id < 32 AND c.vec_id != q.vec_id)
        |SELECT query_id, neighbor_id, round(cos_raw, 4) AS cos
        |FROM sims
        |QUALIFY row_number() OVER (PARTITION BY query_id
        |  ORDER BY cos_raw DESC, neighbor_id) <= 3
        |ORDER BY query_id, neighbor_id""".stripMargin),

    // IVF-PQ: inverted lists from the md5-rank coarse quantizer,
    // in-list ranking by product-quantized approximate inner product
    // (8 subspaces × 16-entry codebooks = the hash-sampled vectors'
    // slices). The oracle rebuilds the codebooks, re-encodes every
    // vector (argmax RAW dot, tie → smaller code), re-quantizes the
    // LUT to the 1/2^20 grid, and replays the integer ADC sum — the
    // approximation pipeline is checked end to end, compression
    // included.
    "q_ann_pq" -> QueryDef(
      (s, dir) => {
        val e = table(s, dir, "embeddings")
        pqTopK(e, e.filter(col("vec_id") < 32), k = 3)
          .orderBy("query_id", "neighbor_id")
      },
      pqOracleSql),

    // The build-once-probe-many twin of q_ann_pq over the persisted
    // compressed index (codes + sidecar, versioned LATEST pointer).
    // SAME oracle string as q_ann_pq: the persisted codes must rank
    // identically to a fresh encode.
    "q_ann_pq_indexed" -> QueryDef(
      (s, dir) => {
        val e = table(s, dir, "embeddings")
        probePqIndex(s, ensurePqIndex(s, dir),
            e.filter(col("vec_id") < 32), k = 3)
          .orderBy("query_id", "neighbor_id")
      },
      pqOracleSql),

    // PQ-index DELETION + COMPACTION (round 11): the q_ann_ivf_delete
    // lifecycle on the versioned compressed-code index — tombstone
    // every vec_id % 7 == 3 row, compact into v2, probe. The oracle
    // replays the PQ pipeline minus the deleted ids against the
    // physically-rewritten codes.
    "q_ann_pq_delete" -> QueryDef(
      (s, dir) => {
        val e = table(s, dir, "embeddings")
        probePqIndex(s, ensurePqDeleted(s, dir),
            e.filter(col("vec_id") < 32), k = 3)
          .orderBy("query_id", "neighbor_id")
      },
      pqDeleteOracleSql),

    // Incremental PQ ingest (round 11): the COMPRESSED index grows by
    // frozen-codebook increments — each one map-only encode pass, cost
    // ∝ batch, existing codes untouched. SAME oracle string as
    // q_ann_pq: however many increments landed, probes must rank
    // identically to a fresh full encode.
    "q_ann_pq_incremental" -> QueryDef(
      (s, dir) => {
        val e = table(s, dir, "embeddings")
        probePqIncremental(s, ensurePqIncremental(s, dir),
            e.filter(col("vec_id") < 32), k = 3)
          .orderBy("query_id", "neighbor_id")
      },
      pqOracleSql),

    // CDC UPSERT on the compressed index (round 11): the
    // q_ann_ivf_upsert change batch applied through tombstone +
    // same-batch re-ENCODE. The oracle replays the mutation through
    // the full PQ pipeline — codebook and query side frozen on the
    // original corpus, candidate assignment AND subspace codes
    // re-derived from the mutated one — so the compression itself is
    // re-checked on the churned rows.
    "q_ann_pq_upsert" -> QueryDef(
      (s, dir) => {
        val e = table(s, dir, "embeddings")
        probePqIncremental(s, ensurePqUpserted(s, dir),
            e.filter(col("vec_id") < 32), k = 3)
          .orderBy("query_id", "neighbor_id")
      },
      pqUpsertOracleSql),

    // Index-health monitor #3 (round 11): recall@3 of the PERSISTED
    // compressed index's ADC ranking against the exact brute ranking —
    // what M-byte-per-vector compression costs in recall, measured on
    // a schedule over the production artifact. Completes the monitor
    // trio: balance (q_index_stats), churn (q_recall_churn),
    // compression (this).
    "q_recall_pq" -> QueryDef(
      (s, dir) => {
        val e = table(s, dir, "embeddings")
        val panel = e.filter(col("vec_id") < 32)
        val got = probePqIndex(s, ensurePqIndex(s, dir), panel, k = 3)
          .select(col("query_id"), col("neighbor_id"))
        val truth = bruteForceTopK(e, panel, k = 3)
          .select(col("query_id"), col("neighbor_id"))
        val hits = truth.join(got, Seq("query_id", "neighbor_id"))
          .groupBy("query_id").agg(count(lit(1)).as("hits"))
        panel.select(col("vec_id").as("query_id"))
          .join(hits, Seq("query_id"), "left")
          .select(col("query_id"),
            coalesce(col("hits"), lit(0L)).as("hits"),
            round(coalesce(col("hits"), lit(0L)) / lit(3.0), 4).as("recall"))
          .orderBy("query_id")
      },
      recallPqOracleSql),

    // Brute-force cosine top-3 for a fixed 32-query panel — exact,
    // oracle-checked.
    "q_ann_brute" -> QueryDef(
      (s, dir) => {
        val e = table(s, dir, "embeddings")
        bruteForceTopK(e, e.filter(col("vec_id") < 32), k = 3)
          .orderBy("query_id", "neighbor_id")
      },
      """WITH u AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        |sims AS (
        |  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
        |    list_dot_product(q.v, c.v) /
        |      (sqrt(list_dot_product(q.v, q.v)) * sqrt(list_dot_product(c.v, c.v))) AS cos_raw
        |  FROM u q JOIN u c ON q.vec_id < 32 AND c.vec_id != q.vec_id)
        |SELECT query_id, neighbor_id, round(cos_raw, 4) AS cos
        |FROM sims
        |QUALIFY row_number() OVER (PARTITION BY query_id
        |  ORDER BY cos_raw DESC, neighbor_id) <= 3
        |ORDER BY query_id, neighbor_id""".stripMargin),

    // LSH-bucketed ANN. The hyperplanes are embedded as double
    // literals (exact round-trip), so the oracle rebuilds identical
    // 8-bit signatures, replays the Hamming-1 multi-probe, and ranks
    // the same candidates — the approximation itself is checked, not
    // just plausibility. Recall vs brute force is additionally
    // asserted in SimilaritySpec.
    "q_ann_lsh" -> QueryDef(
      (s, dir) => {
        val e = table(s, dir, "embeddings")
        lshTopK(e, e.filter(col("vec_id") < 32), k = 3)
          .orderBy("query_id", "neighbor_id")
      },
      s"""WITH u AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        |sigs AS (
        |  SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS nrm,
        |    CAST(list_sum(list_transform(range(1, 9), i ->
        |      CASE WHEN list_dot_product(v, (${planesLit()})[i]) >= 0
        |        THEN 1 << (i - 1) ELSE 0 END)) AS BIGINT) AS sig
        |  FROM u),
        |q AS (
        |  SELECT vec_id AS query_id, v AS qv, nrm AS qn, xor(sig, m) AS bucket
        |  FROM sigs CROSS JOIN (SELECT unnest([0,1,2,4,8,16,32,64,128]) AS m) ms
        |  WHERE vec_id < 32),
        |sims AS (
        |  SELECT query_id, c.vec_id AS neighbor_id,
        |    list_dot_product(qv, c.v) / (qn * c.nrm) AS cos_raw
        |  FROM q JOIN sigs c ON c.sig = q.bucket AND c.vec_id != query_id)
        |SELECT query_id, neighbor_id, round(cos_raw, 4) AS cos
        |FROM sims
        |QUALIFY row_number() OVER (PARTITION BY query_id
        |  ORDER BY cos_raw DESC, neighbor_id) <= 3
        |ORDER BY query_id, neighbor_id""".stripMargin),

    // kNN label propagation — semi-supervised labeling over the
    // embedding corpus: every fifth vector plays the unlabeled query
    // set, the rest the labeled corpus; each query takes the majority
    // label of its 5 cosine-nearest labeled neighbors (ties → smallest
    // label, rank ties → smallest neighbor_id, both pinned). Exact
    // brute-force scoring is the declared baseline (queries broadcast,
    // corpus partition-local — the q_ann_brute shape);
    // q_knn_label_ivf below is the same vote over the IVF probe. The
    // oracle replays scoring, k-cut, and the vote, so a rank flip or
    // tie drift anywhere hash-mismatches. (The synthetic fixture's
    // labels are independent of embedding geometry — chance-level
    // accuracy by construction — so SimilaritySpec pins the vote
    // MECHANICS against a driver-side recomputation, not accuracy.)
    "q_knn_label" -> QueryDef(
      (s, dir) => {
        val e = table(s, dir, "embeddings")
        val corpus = e.filter(col("vec_id") % 5 =!= 0)
        majorityVote(
          bruteForceTopK(corpus, e.filter(col("vec_id") % 5 === 0), k = 5),
          corpus)
      },
      """WITH u AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v, label
        |  FROM embeddings),
        |sims AS (
        |  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id, c.label,
        |    list_dot_product(q.v, c.v) /
        |      (sqrt(list_dot_product(q.v, q.v)) * sqrt(list_dot_product(c.v, c.v))) AS cos_raw
        |  FROM u q JOIN u c ON q.vec_id % 5 = 0 AND c.vec_id % 5 != 0),
        |top AS (
        |  SELECT query_id, label FROM sims
        |  QUALIFY row_number() OVER (PARTITION BY query_id
        |    ORDER BY cos_raw DESC, neighbor_id) <= 5),
        |votes AS (
        |  SELECT query_id, label, count(*) AS votes
        |  FROM top GROUP BY query_id, label)
        |SELECT query_id AS vec_id, label AS pred_label, votes
        |FROM votes
        |QUALIFY row_number() OVER (PARTITION BY query_id
        |  ORDER BY votes DESC, label) = 1
        |ORDER BY vec_id""".stripMargin),

    // The SCALE PATH of q_knn_label: the identical majority vote over
    // IVF-probed candidates — centroids are the md5-rank hash sample
    // of the LABELED corpus, each query reads one inverted list
    // (nprobe=1) instead of the whole corpus. The oracle rebuilds the
    // quantizer, both list assignments, the probe, and the vote, so
    // the approximation itself is hash-checked end to end, not just
    // plausibility.
    "q_knn_label_ivf" -> QueryDef(
      (s, dir) => {
        val e = table(s, dir, "embeddings")
        val corpus = e.filter(col("vec_id") % 5 =!= 0)
        majorityVote(
          ivfTopK(corpus, e.filter(col("vec_id") % 5 === 0), k = 5),
          corpus)
      },
      """WITH u AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v, label
        |  FROM embeddings),
        |c0 AS (SELECT vec_id, v FROM u WHERE vec_id % 5 != 0),
        |cents AS (
        |  SELECT CAST(row_number() OVER (ORDER BY md5(CAST(vec_id AS VARCHAR))) - 1
        |      AS BIGINT) AS centroid_id, v AS cent
        |  FROM c0
        |  QUALIFY row_number() OVER (ORDER BY md5(CAST(vec_id AS VARCHAR))) <= 16),
        |lists AS (
        |  SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS nrm,
        |    centroid_id AS list_id
        |  FROM (
        |    SELECT c0.vec_id, c0.v, c.centroid_id,
        |      row_number() OVER (PARTITION BY c0.vec_id
        |        ORDER BY list_dot_product(c0.v, c.cent) DESC, c.centroid_id) AS rn
        |    FROM c0 CROSS JOIN cents c)
        |  WHERE rn = 1),
        |qlists AS (
        |  SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS nrm,
        |    centroid_id AS list_id
        |  FROM (
        |    SELECT q0.vec_id, q0.v, c.centroid_id,
        |      row_number() OVER (PARTITION BY q0.vec_id
        |        ORDER BY list_dot_product(q0.v, c.cent) DESC, c.centroid_id) AS rn
        |    FROM (SELECT vec_id, v FROM u WHERE vec_id % 5 = 0) q0
        |    CROSS JOIN cents c)
        |  WHERE rn = 1),
        |sims AS (
        |  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
        |    list_dot_product(q.v, c.v) / (q.nrm * c.nrm) AS cos_raw
        |  FROM qlists q JOIN lists c USING (list_id)
        |  WHERE c.vec_id != q.vec_id),
        |top AS (
        |  SELECT query_id, neighbor_id FROM sims
        |  QUALIFY row_number() OVER (PARTITION BY query_id
        |    ORDER BY cos_raw DESC, neighbor_id) <= 5),
        |votes AS (
        |  SELECT t.query_id, u.label, count(*) AS votes
        |  FROM top t JOIN u ON u.vec_id = t.neighbor_id
        |  GROUP BY t.query_id, u.label)
        |SELECT query_id AS vec_id, label AS pred_label, votes
        |FROM votes
        |QUALIFY row_number() OVER (PARTITION BY query_id
        |  ORDER BY votes DESC, label) = 1
        |ORDER BY vec_id""".stripMargin),

    // Hard-negative mining for contrastive training: for each query
    // vector, the 3 cosine-NEAREST corpus vectors carrying a DIFFERENT
    // label — the examples a contrastive loss learns most from. Same
    // broadcast-panel × streamed-corpus shape as q_knn_label (the
    // label-mismatch predicate rides the join, so candidates filter
    // before the top-k window); the IVF probe composes identically
    // when the corpus outgrows brute force (q_knn_label_ivf's shape).
    // The oracle replays scoring, the label filter, and the k-cut, so
    // a rank flip or an own-label leak hash-mismatches.
    "q_hard_negatives" -> QueryDef(
      (s, dir) => {
        val e = table(s, dir, "embeddings")
        bruteForceTopK(
          e.filter(col("vec_id") % 5 =!= 0),
          e.filter(col("vec_id") % 5 === 0), k = 3,
          carryQuery = Seq("label" -> "q_label"),
          carryCorpus = Seq("label" -> "neg_label"),
          pair = Some(col("q_label") =!= col("neg_label")))
          .orderBy("query_id", "neighbor_id")
      },
      """WITH u AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v, label
        |  FROM embeddings),
        |sims AS (
        |  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
        |    c.label AS neg_label,
        |    list_dot_product(q.v, c.v) /
        |      (sqrt(list_dot_product(q.v, q.v)) *
        |       sqrt(list_dot_product(c.v, c.v))) AS cos_raw
        |  FROM u q JOIN u c
        |    ON q.vec_id % 5 = 0 AND c.vec_id % 5 != 0
        |    AND q.label != c.label)
        |SELECT query_id, neighbor_id, neg_label,
        |  round(cos_raw, 4) AS cos
        |FROM sims
        |QUALIFY row_number() OVER (PARTITION BY query_id
        |  ORDER BY cos_raw DESC, neighbor_id) <= 3
        |ORDER BY query_id, neighbor_id""".stripMargin),

    // The SCALE PATH of q_hard_negatives (its brute twin measured
    // 32.7× at the 10× checkpoint — quadratic BY SHAPE, the exact
    // cross-label baseline): the identical label-filtered k-cut over
    // the IVF probe, each query reading one inverted list instead of
    // the whole corpus. Same composition contract as q_knn_label →
    // q_knn_label_ivf; the oracle rebuilds the quantizer, both
    // assignments, the label filter, and the k-cut.
    "q_hard_negatives_ivf" -> QueryDef(
      (s, dir) => {
        val e = table(s, dir, "embeddings")
        ivfTopK(
          e.filter(col("vec_id") % 5 =!= 0),
          e.filter(col("vec_id") % 5 === 0), k = 3,
          carryQuery = Seq("label" -> "q_label"),
          carryCorpus = Seq("label" -> "neg_label"),
          pair = Some(col("q_label") =!= col("neg_label")))
          .orderBy("query_id", "neighbor_id")
      },
      """WITH u AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v, label
        |  FROM embeddings),
        |c0 AS (SELECT vec_id, v, label FROM u WHERE vec_id % 5 != 0),
        |cents AS (
        |  SELECT CAST(row_number() OVER (ORDER BY md5(CAST(vec_id AS VARCHAR))) - 1
        |      AS BIGINT) AS centroid_id, v AS cent
        |  FROM c0
        |  QUALIFY row_number() OVER (ORDER BY md5(CAST(vec_id AS VARCHAR))) <= 16),
        |lists AS (
        |  SELECT vec_id, v, label, sqrt(list_dot_product(v, v)) AS nrm,
        |    centroid_id AS list_id
        |  FROM (
        |    SELECT c0.vec_id, c0.v, c0.label, c.centroid_id,
        |      row_number() OVER (PARTITION BY c0.vec_id
        |        ORDER BY list_dot_product(c0.v, c.cent) DESC, c.centroid_id) AS rn
        |    FROM c0 CROSS JOIN cents c)
        |  WHERE rn = 1),
        |qlists AS (
        |  SELECT vec_id, v, label, sqrt(list_dot_product(v, v)) AS nrm,
        |    centroid_id AS list_id
        |  FROM (
        |    SELECT q0.vec_id, q0.v, q0.label, c.centroid_id,
        |      row_number() OVER (PARTITION BY q0.vec_id
        |        ORDER BY list_dot_product(q0.v, c.cent) DESC, c.centroid_id) AS rn
        |    FROM (SELECT vec_id, v, label FROM u WHERE vec_id % 5 = 0) q0
        |    CROSS JOIN cents c)
        |  WHERE rn = 1),
        |sims AS (
        |  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
        |    c.label AS neg_label,
        |    list_dot_product(q.v, c.v) / (q.nrm * c.nrm) AS cos_raw
        |  FROM qlists q JOIN lists c USING (list_id)
        |  WHERE q.label != c.label)
        |SELECT query_id, neighbor_id, neg_label,
        |  round(cos_raw, 4) AS cos
        |FROM sims
        |QUALIFY row_number() OVER (PARTITION BY query_id
        |  ORDER BY cos_raw DESC, neighbor_id) <= 3
        |ORDER BY query_id, neighbor_id""".stripMargin),

    // Greedy MMR panel (k=5, λ=0.7, diversity 0.3): the oracle unrolls
    // all five greedy steps as chained argmax CTEs and replays every
    // cosine, subtraction, and tie-break — a drifted seed, a wrong
    // "max over selected", or a λ/weight rounding mismatch anywhere in
    // the loop hash-mismatches the panel.
    "q_mmr_select" -> QueryDef(
      // the batched-greedy path (provably ≡ sequential, ~k/8 driver
      // round-trips; SimilaritySpec pins the equivalence) against the
      // oracle's 5 replayed sequential steps
      (s, dir) => mmrSelectBatched(table(s, dir, "embeddings"), k = 5)
        .orderBy("rank"),
      """WITH u AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
        |  FROM embeddings),
        |n AS (SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS nrm FROM u),
        |q0 AS (SELECT v, nrm FROM n
        |  ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id LIMIT 1),
        |r AS (SELECT n.vec_id, n.v, n.nrm,
        |    list_dot_product(n.v, q0.v) / (n.nrm * q0.nrm) AS rel
        |  FROM n, q0),
        |s1 AS (SELECT vec_id, v, nrm, 0.7 * rel - 0.3 * 0.0 AS mmr
        |  FROM r ORDER BY rel DESC, vec_id LIMIT 1),
        |c2 AS (SELECT r.vec_id, r.v, r.nrm, r.rel,
        |    list_dot_product(r.v, s1.v) / (r.nrm * s1.nrm) AS dv
        |  FROM r, s1 WHERE r.vec_id != s1.vec_id),
        |s2 AS (SELECT vec_id, v, nrm, 0.7 * rel - 0.3 * dv AS mmr
        |  FROM c2 ORDER BY 0.7 * rel - 0.3 * dv DESC, vec_id LIMIT 1),
        |c3 AS (SELECT r.vec_id, r.v, r.nrm, r.rel, greatest(
        |    list_dot_product(r.v, s1.v) / (r.nrm * s1.nrm),
        |    list_dot_product(r.v, s2.v) / (r.nrm * s2.nrm)) AS dv
        |  FROM r, s1, s2 WHERE r.vec_id NOT IN (s1.vec_id, s2.vec_id)),
        |s3 AS (SELECT vec_id, v, nrm, 0.7 * rel - 0.3 * dv AS mmr
        |  FROM c3 ORDER BY 0.7 * rel - 0.3 * dv DESC, vec_id LIMIT 1),
        |c4 AS (SELECT r.vec_id, r.v, r.nrm, r.rel, greatest(
        |    list_dot_product(r.v, s1.v) / (r.nrm * s1.nrm),
        |    list_dot_product(r.v, s2.v) / (r.nrm * s2.nrm),
        |    list_dot_product(r.v, s3.v) / (r.nrm * s3.nrm)) AS dv
        |  FROM r, s1, s2, s3
        |  WHERE r.vec_id NOT IN (s1.vec_id, s2.vec_id, s3.vec_id)),
        |s4 AS (SELECT vec_id, v, nrm, 0.7 * rel - 0.3 * dv AS mmr
        |  FROM c4 ORDER BY 0.7 * rel - 0.3 * dv DESC, vec_id LIMIT 1),
        |c5 AS (SELECT r.vec_id, r.v, r.nrm, r.rel, greatest(
        |    list_dot_product(r.v, s1.v) / (r.nrm * s1.nrm),
        |    list_dot_product(r.v, s2.v) / (r.nrm * s2.nrm),
        |    list_dot_product(r.v, s3.v) / (r.nrm * s3.nrm),
        |    list_dot_product(r.v, s4.v) / (r.nrm * s4.nrm)) AS dv
        |  FROM r, s1, s2, s3, s4
        |  WHERE r.vec_id NOT IN (s1.vec_id, s2.vec_id, s3.vec_id, s4.vec_id)),
        |s5 AS (SELECT vec_id, v, nrm, 0.7 * rel - 0.3 * dv AS mmr
        |  FROM c5 ORDER BY 0.7 * rel - 0.3 * dv DESC, vec_id LIMIT 1)
        |SELECT rank, vec_id, round(mmr, 4) AS mmr FROM (
        |  SELECT 1 AS rank, vec_id, mmr FROM s1
        |  UNION ALL SELECT 2, vec_id, mmr FROM s2
        |  UNION ALL SELECT 3, vec_id, mmr FROM s3
        |  UNION ALL SELECT 4, vec_id, mmr FROM s4
        |  UNION ALL SELECT 5, vec_id, mmr FROM s5)
        |ORDER BY rank""".stripMargin)
  )
}
