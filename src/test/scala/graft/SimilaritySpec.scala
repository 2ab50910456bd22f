package graft

import graft.operators.Similarity._
import org.apache.spark.sql.functions._

/** ANN search: brute-force exactness on a hand-built corpus; LSH
  * bucketing recall on clustered data (seed-42 hyperplanes →
  * deterministic).
  */
class SimilaritySpec extends SparkSpec {
  import spark.implicits._

  test("bruteForceTopK returns the exact nearest neighbors in order") {
    // 2-d corpus with known geometry around the x axis
    val corpus = Seq(
      (0L, Array(1.0f, 0.0f)),
      (1L, Array(0.99f, 0.14f)),   // ~8° off
      (2L, Array(0.7f, 0.7f)),     // 45°
      (3L, Array(0.0f, 1.0f)),     // 90°
      (4L, Array(-1.0f, 0.0f))     // 180°
    ).toDF("vec_id", "embedding")
    val res = bruteForceTopK(corpus, corpus.filter(col("vec_id") === 0L), k = 3)
      .orderBy(desc("cos"))
      .collect().map(r => r.getAs[Long]("neighbor_id"))
    assert(res.toSeq == Seq(1L, 2L, 3L))
  }

  test("brute-force top-k never exceeds k and excludes self") {
    val e = graft.sources.Tables.table(spark, sfDir, "embeddings")
    val res = bruteForceTopK(e, e.filter(col("vec_id") < 8), k = 3)
    val byQuery = res.collect().groupBy(_.getAs[Long]("query_id"))
    assert(byQuery.values.forall(_.length <= 3))
    assert(res.filter(col("query_id") === col("neighbor_id")).count() == 0)
  }

  test("lshTopK recovers true neighbors on clustered data (the LSH contract)") {
    // 10 tight clusters of 10 vectors: true neighbors are
    // near-identical, so they share a signature bucket and recall is
    // total. (On *uniformly random* vectors hyperplane LSH has no
    // contract — nearest cosines are noise-level — so that is not the
    // property to test.)
    val rnd = new scala.util.Random(7)
    val dim = 16
    val centers = Array.fill(10)(Array.fill(dim)(rnd.nextGaussian().toFloat))
    val rows = for {
      c <- centers.indices
      i <- 0 until 10
    } yield (c * 10L + i,
      centers(c).map(v => v + 0.01f * rnd.nextGaussian().toFloat))
    val corpus = rows.toDF("vec_id", "embedding")
    val queries = corpus.filter(col("vec_id") % 10 === 0) // one per cluster
    def pairs(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"))).toSet
    val brute = pairs(bruteForceTopK(corpus, queries, k = 3))
    val lsh = pairs(lshTopK(corpus, queries, k = 3, numPlanes = 8, dim = dim))
    val recall = (brute & lsh).size.toDouble / brute.size
    assert(recall == 1.0, s"recall $recall")
    assert(lsh.forall { case (a, b) => a != b })
  }

  test("ivfTopK recovers true neighbors on clustered data and bounds candidates") {
    val rnd = new scala.util.Random(11)
    val dim = 16
    val centers = Array.fill(8)(Array.fill(dim)(rnd.nextGaussian().toFloat))
    // the hash quantizer's 8 picks over ids 0..79 are the 8 smallest
    // md5(id) values — 27,63,60,59,69,6,43,33; pin each to a distinct
    // cluster (remaining ids round-robin) so every inverted list seeds
    // in its own cluster, the same arrangement the stride quantizer got
    // for free from block membership
    val pickCluster = Map(27 -> 0, 63 -> 1, 60 -> 2, 59 -> 3,
      69 -> 4, 6 -> 5, 43 -> 6, 33 -> 7)
    def clusterOf(i: Int): Int = pickCluster.getOrElse(i, i % 8)
    val rows = for (i <- 0 until 80)
      yield (i.toLong,
        centers(clusterOf(i)).map(v => v + 0.01f * rnd.nextGaussian().toFloat))
    val corpus = rows.toDF("vec_id", "embedding")
    // one query per cluster (id 6 is a pick pinned to cluster 5, so
    // cluster 6's query is id 14)
    val queries = corpus.filter(col("vec_id")
      .isin(0L, 1L, 2L, 3L, 4L, 5L, 14L, 7L))
    def pairs(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"))).toSet
    val brute = pairs(bruteForceTopK(corpus, queries, k = 3))
    val ivf = pairs(ivfTopK(corpus, queries, k = 3, numLists = 8))
    val recall = (brute & ivf).size.toDouble / brute.size
    assert(recall == 1.0, s"recall $recall")
    // widening nprobe can only add candidates — recall is monotone
    val ivf2 = pairs(ivfTopK(corpus, queries, k = 3, numLists = 8, nprobe = 2))
    val recall2 = (brute & ivf2).size.toDouble / brute.size
    assert(recall2 >= recall, s"nprobe=2 recall $recall2 < $recall")
  }

  test("kmeansCentroids moves hash centroids to cluster means; probe keeps recall") {
    val rnd = new scala.util.Random(13)
    val dim = 16
    val centers = Array.fill(4)(Array.fill(dim)(rnd.nextGaussian().toFloat * 3f))
    // the hash quantizer's initial picks over ids 0..79 (the 4
    // smallest md5(id): 27, 63, 60, 59) are pinned to distinct true
    // clusters — Lloyd's job is then to move each pick (a noisy
    // member) onto its cluster MEAN
    val pickCluster = Map(27 -> 0, 63 -> 1, 60 -> 2, 59 -> 3)
    def clusterOf(i: Int): Int = pickCluster.getOrElse(i, i % 4)
    val rows = for (i <- 0 until 80)
      yield (i.toLong,
        centers(clusterOf(i)).map(v => v + 0.01f * rnd.nextGaussian().toFloat))
    val corpus = rows.toDF("vec_id", "embedding")
    val refined = kmeansCentroids(corpus, k = 4, iters = 2)
    assert(refined.size == 4)
    // every true center is recovered by some refined centroid
    // (max dim distance far below inter-center spacing)
    centers.foreach { tc =>
      val best = refined.map { case (_, c) =>
        tc.zip(c).map { case (a, b) => math.abs(a - b) }.max }.min
      assert(best < 0.05, s"no refined centroid near a true center ($best)")
    }
    val queries = corpus.filter(col("vec_id") < 4)
    def pairs(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"))).toSet
    val brute = pairs(bruteForceTopK(corpus, queries, k = 3))
    val km = pairs(kmeansTopK(corpus, queries, k = 3, numLists = 4, iters = 2))
    assert((brute & km).size.toDouble / brute.size == 1.0)
    // sample-based Lloyd (the 100 TB shape: refine on the md5-half,
    // one full assignment in the probe) keeps the same recall — tight
    // clusters mean the sampled means sit next to the full means
    val kmS = pairs(kmeansTopK(corpus, queries, k = 3, numLists = 4,
      iters = 2, sampleFrac = 0.5))
    assert((brute & kmS).size.toDouble / brute.size == 1.0)
  }

  test("pqTopK: ADC ranking stays inside the true cluster and the " +
      "quantized score tracks the exact inner product") {
    val rnd = new scala.util.Random(11)
    val dim = 16
    val centers = Array.fill(8)(Array.fill(dim)(rnd.nextGaussian().toFloat))
    // same pinned-pick arrangement as the ivf test: each of the hash
    // quantizer's 8 picks seeds a distinct cluster
    val pickCluster = Map(27 -> 0, 63 -> 1, 60 -> 2, 59 -> 3,
      69 -> 4, 6 -> 5, 43 -> 6, 33 -> 7)
    def clusterOf(i: Int): Int = pickCluster.getOrElse(i, i % 8)
    val rows = for (i <- 0 until 80)
      yield (i.toLong,
        centers(clusterOf(i)).map(v => v + 0.01f * rnd.nextGaussian().toFloat))
    val corpus = rows.toDF("vec_id", "embedding")
    val queries = corpus.filter(col("vec_id")
      .isin(0L, 1L, 2L, 3L, 4L, 5L, 14L, 7L))
    val res = pqTopK(corpus, queries, k = 3, numLists = 8,
      numSubspaces = 4, dim = dim).collect()
    assert(res.nonEmpty)
    val byQuery = res.groupBy(_.getAs[Long]("query_id"))
    assert(byQuery.size == 8 && byQuery.values.forall(_.length == 3))
    // cluster purity: with near-identical in-cluster vectors PQ codes
    // can tie (that is the point of quantization), so the contract is
    // "every returned neighbor is a true cluster-mate", not an exact
    // brute-force match
    res.foreach { r =>
      val q = r.getAs[Long]("query_id").toInt
      val n = r.getAs[Long]("neighbor_id").toInt
      assert(clusterOf(q) == clusterOf(n),
        s"neighbor $n of query $q crossed clusters")
      assert(q != n)
    }
    // the quantized ADC score tracks the exact inner product. Max-dot
    // encoding is upward-biased (a subvector may encode to a codebook
    // entry with a HIGHER dot than its own cluster-mate — inherent to
    // inner-product PQ), so the bound is relative, not the in-cluster
    // noise floor: within ~15% on cluster-scale dots
    val vecs = rows.toMap
    res.foreach { r =>
      val q = vecs(r.getAs[Long]("query_id"))
      val n = vecs(r.getAs[Long]("neighbor_id"))
      val exact = q.zip(n).map { case (a, b) => a.toDouble * b }.sum
      assert(math.abs(r.getAs[Double]("adot") - exact) <
        0.15 * math.abs(exact) + 0.75,
        s"ADC ${r.getAs[Double]("adot")} far from exact $exact")
    }
  }

  test("persisted PQ index: probe equals the direct path and prunes to " +
      "the probed list partitions") {
    val e = graft.sources.Tables.table(spark, sfDir, "embeddings")
    val queries = e.filter(col("vec_id") < 8)
    val dir = java.nio.file.Files.createTempDirectory("graft_pq").toString
    val direct = pqTopK(e, queries, k = 3)
      .orderBy("query_id", "neighbor_id").collect().toSeq
    writePqIndex(e, dir)
    val probed = probePqIndex(spark, dir, queries, k = 3)
    assert(probed.orderBy("query_id", "neighbor_id").collect().toSeq == direct)
    // the sidecar rebuilds bit-identical centroids and records the
    // build params the probe derives its schema from
    val (cents, m, d) = readPqSidecar(spark, dir)
    assert(cents == hashCentroids(e, 16) && m == 8 && d == 64)
    // pruning: the probe join must carry a DYNAMIC partition filter on
    // list_id (isnotnull alone appears for any join key and proves
    // nothing), so only the probed lists' directories are read
    val plan = probed.queryExecution.executedPlan.toString.toLowerCase
    assert(plan.contains("dynamicpruning"),
      s"no dynamic partition pruning on the codes scan:\n$plan")
    // versioned publication: rebuilds flip LATEST and retain only the
    // previous version for in-flight readers
    writePqIndex(e, dir)
    writePqIndex(e, dir)
    val versions = {
      val it = java.nio.file.Files.list(java.nio.file.Paths.get(dir)).iterator()
      Iterator.continually(it).takeWhile(_.hasNext).map(_.next())
        .map(_.getFileName.toString).filter(_.startsWith("v")).toSeq.sorted
    }
    assert(versions == Seq("v2", "v3"), s"version retention broke: $versions")
    assert(probePqIndex(spark, dir, queries, k = 3)
      .orderBy("query_id", "neighbor_id").collect().toSeq == direct)
  }

  test("persisted IVF index: probe equals kmeansTopK and prunes to the " +
      "probed list partitions") {
    val e = graft.sources.Tables.table(spark, sfDir, "embeddings")
    val queries = e.filter(col("vec_id") < 8)
    val dir = java.nio.file.Files.createTempDirectory("graft_ivf").toString
    val direct = kmeansTopK(e, queries, k = 3, iters = 2, sampleFrac = 0.5)
      .orderBy("query_id", "neighbor_id").collect().toSeq
    writeIvfIndex(e, dir, numLists = 16, iters = 2, sampleFrac = 0.5)
    val probed = probeIvfIndex(spark, dir, queries, k = 3)
    assert(probed.orderBy("query_id", "neighbor_id").collect().toSeq == direct)
    val plan = probed.queryExecution.executedPlan.toString.toLowerCase
    assert(plan.contains("dynamicpruning"),
      s"no dynamic partition pruning on the IVF codes scan:\n$plan")
  }

  test("appendToIvfIndex grows the index under frozen centroids") {
    val e = graft.sources.Tables.table(spark, sfDir, "embeddings")
    val half = e.filter(col("vec_id") % 2 === 0)
    val rest = e.filter(col("vec_id") % 2 === 1)
    val queries = e.filter(col("vec_id") < 8)
    val dir = java.nio.file.Files.createTempDirectory("graft_ivfa").toString
    writeIvfIndex(half, dir, numLists = 16, iters = 1)
    appendToIvfIndex(rest, dir)
    // index covers the whole corpus exactly once
    val indexed = spark.read.parquet(s"$dir/v1/codes")
      .select("vec_id").as[Long].collect().sorted.toSeq
    assert(indexed == e.select("vec_id").as[Long].collect().sorted.toSeq)
    // probing equals assigning the full corpus against the SAME frozen
    // (half-built) centroids — append is pure growth, no re-clustering
    val cents = kmeansCentroids(half, 16, iters = 1)
    val expected = ivfTopKWithCentroids(e, queries, cents, k = 3)
      .orderBy("query_id", "neighbor_id").collect().toSeq
    val got = probeIvfIndex(spark, dir, queries, k = 3)
      .orderBy("query_id", "neighbor_id").collect().toSeq
    assert(got == expected)
  }

  test("appendToPqIndex grows the index under frozen codebooks; probes " +
      "see appended vectors immediately") {
    val e = graft.sources.Tables.table(spark, sfDir, "embeddings")
    val half = e.filter(col("vec_id") % 2 === 0)
    val rest = e.filter(col("vec_id") % 2 === 1)
    val queries = e.filter(col("vec_id") < 8)
    val dir = java.nio.file.Files.createTempDirectory("graft_pqa").toString
    writePqIndex(half, dir)
    appendToPqIndex(rest, dir)
    // the index now covers the whole corpus exactly once
    val (cents, m, d) = readPqSidecar(spark, dir)
    val indexed = spark.read.parquet(s"$dir/v1/codes")
      .select("vec_id").as[Long].collect().sorted.toSeq
    val all = e.select("vec_id").as[Long].collect().sorted.toSeq
    assert(indexed == all)
    // probing equals encoding the full corpus against the SAME frozen
    // (half-built) centroids — append is pure growth, no re-clustering
    val expected = pqProbe(pqEncode(e, cents, m, d), queries, cents, k = 3,
      m, d).orderBy("query_id", "neighbor_id").collect().toSeq
    val got = probePqIndex(spark, dir, queries, k = 3)
      .orderBy("query_id", "neighbor_id").collect().toSeq
    assert(got == expected)
  }

  test("lshSignature buckets co-directional vectors together") {
    val planes = hyperplanes(8, 2)
    val df = Seq(
      (0L, Array(1.0f, 0.01f)),
      (1L, Array(0.9f, 0.012f)),   // same direction, different norm
      (2L, Array(-1.0f, -0.01f))   // opposite
    ).toDF("vec_id", "embedding")
      .select(col("vec_id"), lshSignature(col("embedding"), planes).as("sig"))
    val sigs = df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(sigs(0L) == sigs(1L))
    // opposite vector flips every plane
    assert(java.lang.Long.bitCount(sigs(0L) ^ sigs(2L)) == 8)
  }

  test("q_knn_label vote mechanics match a driver-side recomputation") {
    // fdot promotes float→double and accumulates left-to-right; the
    // same loop here reproduces its doubles bitwise, so the k-cut and
    // vote must agree exactly (the fixture's labels are independent of
    // geometry — chance accuracy — which is WHY this pins mechanics)
    val rows = graft.sources.Tables.table(spark, sfDir, "embeddings")
      .collect().map(r => (r.getAs[Long]("vec_id"),
        r.getAs[scala.collection.Seq[Float]]("embedding").toArray,
        r.getAs[Int]("label")))
    def dot(a: Array[Float], b: Array[Float]): Double = {
      var s = 0.0; var i = 0
      while (i < a.length) { s += a(i).toDouble * b(i).toDouble; i += 1 }
      s
    }
    val corpus = rows.filter(_._1 % 5 != 0)
    val expected = rows.filter(_._1 % 5 == 0).map { case (qid, qv, _) =>
      val top = corpus
        .map { case (cid, cv, cl) =>
          (dot(qv, cv) / (math.sqrt(dot(qv, qv)) * math.sqrt(dot(cv, cv))),
            cid, cl)
        }
        .sortBy { case (cos, cid, _) => (-cos, cid) }.take(5)
      val (label, votes) = top.groupBy(_._3).view.mapValues(_.length)
        .toSeq.sortBy { case (l, n) => (-n, l) }.head
      (qid, label, votes.toLong)
    }.sortBy(_._1).toSeq
    val got = SparkEntry.registry("q_knn_label").fn(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSeq
    assert(got == expected)
  }

  test("q_hard_negatives: nearest CROSS-label neighbors, driver replay agrees") {
    val rows = graft.sources.Tables.table(spark, sfDir, "embeddings")
      .collect().map(r => (r.getAs[Long]("vec_id"),
        r.getAs[scala.collection.Seq[Float]]("embedding").toArray,
        r.getAs[Int]("label")))
    def dot(a: Array[Float], b: Array[Float]): Double = {
      var s = 0.0; var i = 0
      while (i < a.length) { s += a(i).toDouble * b(i).toDouble; i += 1 }
      s
    }
    val corpus = rows.filter(_._1 % 5 != 0)
    val expected = rows.filter(_._1 % 5 == 0).flatMap { case (qid, qv, ql) =>
      corpus.filter(_._3 != ql)
        .map { case (cid, cv, cl) =>
          (qid, cid, cl,
            dot(qv, cv) / (math.sqrt(dot(qv, qv)) * math.sqrt(dot(cv, cv))))
        }
        .sortBy { case (_, cid, _, cos) => (-cos, cid) }.take(3)
        .map { case (q, c, l, cos) =>
          (q, c, l, BigDecimal(cos).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble) }
    }.sortBy(t => (t._1, t._2)).toSeq
    val got = SparkEntry.registry("q_hard_negatives").fn(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2),
        r.getDouble(3))).toSeq
    assert(got == expected)
    // structural guard the replay can't miss: no own-label leak
    val labels = rows.map(t => t._1 -> t._3).toMap
    assert(got.forall { case (q, _, nl, _) => labels(q) != nl })
  }

  test("q_hard_negatives_ivf: probed subset of the brute pair space, no own-label leak") {
    val labels = graft.sources.Tables.table(spark, sfDir, "embeddings")
      .collect().map(r => r.getAs[Long]("vec_id") -> r.getAs[Int]("label")).toMap
    val got = SparkEntry.registry("q_hard_negatives_ivf").fn(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getDouble(3)))
    assert(got.nonEmpty)
    // label contract holds through the probe
    assert(got.forall { case (q, _, nl, _) => labels(q) != nl })
    // ≤ 3 negatives per query, scored identically to the brute twin
    // wherever both emit the pair (same cosine arithmetic)
    assert(got.groupBy(_._1).values.forall(_.length <= 3))
    val brute = SparkEntry.registry("q_hard_negatives").fn(spark, sfDir)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(3)).toMap
    got.foreach { case (q, n, _, cos) =>
      brute.get((q, n)).foreach(b => assert(b == cos,
        s"pair ($q,$n) scored $cos via IVF but $b brute"))
    }
  }

  test("q_corpus_map: clusters partition the corpus; ratios reconcile") {
    val rows = SparkEntry.registry("q_corpus_map").fn(spark, sfDir).collect()
    val total = graft.sources.Tables.table(spark, sfDir, "embeddings").count()
    assert(rows.map(_.getLong(1)).sum == total, "cluster sizes must partition")
    assert(math.abs(rows.map(_.getDouble(2)).sum - 1.0) < 0.01)
    rows.foreach { r =>
      assert(r.getLong(0) >= 0 && r.getLong(0) < 16)
      assert(r.getDouble(4) > 0.0 && r.getDouble(4) <= 1.0)
      assert(r.getDouble(2) ==
        math.rint(r.getLong(1).toDouble / total * 10000) / 10000)
    }
    InternalCaches.drain(blocking = true)
  }

  test("q_mmr_select: every greedy step matches a bitwise driver replay") {
    val rows = graft.sources.Tables.table(spark, sfDir, "embeddings")
      .collect().map(r => (r.getAs[Long]("vec_id"),
        r.getAs[scala.collection.Seq[Float]]("embedding")
          .map(_.toDouble).toArray))
    def dot(a: Array[Double], b: Array[Double]): Double = {
      var s = 0.0; var i = 0
      while (i < a.length) { s += a(i) * b(i); i += 1 }
      s
    }
    def cos(a: Array[Double], b: Array[Double]): Double =
      dot(a, b) / (math.sqrt(dot(a, a)) * math.sqrt(dot(b, b)))
    val md5 = java.security.MessageDigest.getInstance("MD5")
    def h(id: Long) = md5.digest(id.toString.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    val seed = rows.minBy(t => (h(t._1), t._1))._2
    val rel = rows.map { case (id, v) => id -> cos(v, seed) }.toMap
    val byId = rows.toMap
    // greedy replay, λ=0.7 / 0.3, ties by vec_id
    var sel = Vector.empty[Long]
    while (sel.size < 5) {
      val cand = rows.filter(t => !sel.contains(t._1)).map { case (id, v) =>
        val div = if (sel.isEmpty) 0.0
          else sel.map(s => cos(v, byId(s))).max
        (id, 0.7 * rel(id) - 0.3 * div)
      }
      sel :+= cand.minBy { case (id, sc) => (-sc, id) }._1
    }
    val got = SparkEntry.registry("q_mmr_select").fn(spark, sfDir)
      .collect().map(_.getLong(1)).toSeq
    assert(got == sel, s"spark $got vs replay $sel")
    InternalCaches.drain()
    spark.catalog.clearCache()
  }

  test("mmrSelectBatched ≡ mmrSelect: same panel, scores, ranks at every batch size") {
    import graft.operators.Similarity
    val emb = graft.sources.Tables.table(spark, sfDir, "embeddings")
    // k past the driver round-trip savings threshold, batch sizes
    // spanning degenerate-sequential (1), partial rounds (3), one
    // round (≥ k), and bound-never-fires (whole corpus collected)
    val seq = Similarity.mmrSelect(emb, k = 9).collect().toSeq
    for (b <- Seq(1, 3, 9, 16, 4096)) {
      val bat = Similarity.mmrSelectBatched(emb, k = 9, batch = b)
        .collect().toSeq
      assert(bat == seq, s"batch=$b: $bat vs sequential $seq")
      InternalCaches.drain()
      spark.catalog.clearCache()
    }
    // diversity-heavy weights on a clustered fixture exercise the
    // intra-round score updates (negative-cosine fold start included)
    val md5 = java.security.MessageDigest.getInstance("MD5")
    def h(id: Long) = md5.digest(id.toString.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    import spark.implicits._
    val rows = (1L to 12L).sortBy(id => (h(id), id)).zipWithIndex.map {
      case (id, i) =>
        // opposing vectors force negative cosines into the div fold
        (id, Seq(0, 1, 2).map(d =>
          (if (i % 2 == 0) 1f else -1f) * (if (d == i % 3) 1f else 0.01f * i)))
    }.toDF("vec_id", "embedding")
    val s2 = Similarity.mmrSelect(rows, k = 7, lambda = 0.3, divWeight = 0.7)
      .collect().toSeq
    for (b <- Seq(2, 5)) {
      val b2 = Similarity.mmrSelectBatched(rows, k = 7, lambda = 0.3,
        divWeight = 0.7, batch = b).collect().toSeq
      assert(b2 == s2, s"clustered batch=$b: $b2 vs $s2")
    }
    InternalCaches.drain()
    spark.catalog.clearCache()
  }

  test("mmrSelect diversifies across clusters where pure relevance stays home") {
    import spark.implicits._
    // the harness embeddings are isotropic noise — the diversity term
    // barely moves ranks there, so the property needs a clustered
    // fixture: three orthogonal clusters, the md5-min id pinned into
    // cluster A so the relevance seed lands there deterministically
    val ids = (1L to 12L)
    val md5 = java.security.MessageDigest.getInstance("MD5")
    def h(id: Long) = md5.digest(id.toString.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    val sorted = ids.sortBy(id => (h(id), id))
    def vec(cluster: Int, jitter: Float): Seq[Float] = cluster match {
      case 0 => Seq(1f, jitter, 0f, 0f)
      case 1 => Seq(0f, 1f, jitter, 0f)
      case _ => Seq(jitter, 0f, 0f, 1f)
    }
    // seed id → pure cluster-A vector; then round-robin the rest
    val rows = sorted.zipWithIndex.map { case (id, i) =>
      if (i == 0) (id, vec(0, 0f))
      else (id, vec(i % 3, 0.01f * (i + 1)))
    }
    val clusterOf = rows.map { case (id, v) =>
      id -> v.zipWithIndex.maxBy(_._1)._2
    }.toMap
    val corpus = rows.toDF("vec_id", "embedding")
    // diversity-heavy weights: after one cluster-A pick the in-cluster
    // penalty (~0.7) swamps in-cluster relevance (~0.3) and the greedy
    // walk must leave home; pure relevance (top-3 cosine) never does
    val picked = graft.operators.Similarity
      .mmrSelect(corpus, k = 3, lambda = 0.3, divWeight = 0.7)
      .collect().map(_.getLong(1)).toSeq
    assert(picked.map(clusterOf).distinct.length == 3,
      s"MMR picked clusters ${picked.map(clusterOf)} — expected all three")
    InternalCaches.drain()
    spark.catalog.clearCache()
  }

  test("nearestCentroid classifies separated clusters perfectly; " +
      "centroids equal the hand-computed means") {
    // 4 tight clusters labeled by cluster id: the class prototype is
    // the cluster mean, so every member's nearest centroid is its own
    // label (geometry-true fixture; the sf tables' labels are random)
    val rnd = new scala.util.Random(11)
    val dim = 8
    val centers = Array.fill(4)(Array.fill(dim)(rnd.nextGaussian().toFloat))
    val rows = for { c <- centers.indices; i <- 0 until 12 } yield
      (c * 12L + i, centers(c).map(v => v + 0.02f * rnd.nextGaussian().toFloat), c)
    val emb = rows.toDF("vec_id", "embedding", "label")
    val pred = nearestCentroid(emb)
      .collect().map(r => r.getLong(0) -> (r.getInt(1), r.getInt(2)))
    assert(pred.length == 48)
    assert(pred.forall { case (_, (lbl, p)) => p == lbl },
      s"misclassified: ${pred.filter { case (_, (l, p)) => l != p }.toSeq}")
    // centroid cells are the plain per-dimension means
    val cent = labelCentroids(emb).collect()
      .map(r => (r.getInt(0), r.getInt(1)) -> r.getDouble(2)).toMap
    assert(cent.size == 4 * dim)
    val byLabel = rows.groupBy(_._3)
    for (((lbl, pos), c) <- cent) {
      val xs = byLabel(lbl).map(_._2(pos - 1).toDouble)
      assert(math.abs(c - xs.sum / xs.length) < 1e-9)
    }
  }

  test("ensureKmeansQuantizer: fit-once artifact, bit-identical to a fresh fit") {
    graft.sources.DerivedCache.vacuumKinds(spark, Set("kmeans-cents"))
    val first = ensureKmeansQuantizer(spark, sfDir)
    val cacheDir = graft.sources.DerivedCache.dirFor(spark,
      s"$sfDir/embeddings.parquet", "kmeans-cents", "16-2-0.5")
    val tsv = new java.io.File(s"$cacheDir/centroids.tsv")
    assert(tsv.exists, "first call must publish the sidecar")
    val mtime = tsv.lastModified
    val second = ensureKmeansQuantizer(spark, sfDir)
    // second call reads the artifact (no rewrite) and the tsv
    // round-trip is bit-exact — Double.toString/toDouble is the
    // shortest round-tripping representation
    assert(tsv.lastModified == mtime, "second call must not rebuild")
    assert(second == first)
    val fresh = kmeansCentroids(
      graft.sources.Tables.table(spark, sfDir, "embeddings"), 16, 2,
      sampleFrac = 0.5)
    assert(first == fresh, "artifact must be indistinguishable from a fresh fit")
  }

  test("incremental IVF: appended index answers identically to the " +
      "batch probe, increments replay idempotently, a crashed build " +
      "re-runs to the same index") {
    graft.sources.DerivedCache.vacuumKinds(spark, Set("index-ivf-inc"))
    val e = graft.sources.Tables.table(spark, sfDir, "embeddings")
    val panel = e.filter(col("vec_id") < 32)
    val cents = ensureKmeansQuantizer(spark, sfDir)
    def probe(dir: String) =
      probeIvfIncremental(spark, dir, cents, panel, k = 3)
        .orderBy("query_id", "neighbor_id").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    val dir = ensureIvfIncremental(spark, sfDir)
    val inc = probe(dir)
    // equivalence: the batch-assigned probe over the same frozen
    // centroids ranks identically — incremental growth is invisible
    val batch = ivfTopKWithCentroids(e, panel, cents, k = 3)
      .orderBy("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(inc == batch, "incremental index diverged from batch build")
    // replay shield: redeliver increment 1 — batch dir overwrites
    // whole, postings don't duplicate, answers unchanged
    appendIvfIncrement(spark, dir,
      e.filter(pmod(col("vec_id"), lit(2)) === 1), cents, 1L)
    assert(probe(dir) == inc)
    val n = spark.read.parquet(s"$dir/g1").count()
    assert(n == e.count(), s"postings duplicated: $n")
    // crash shield: no root marker → ensure re-runs both appends over
    // their Overwrite shields and converges to the same index
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(s"$dir/_SUCCESS"), false)
    assert(ensureIvfIncremental(spark, sfDir) == dir)
    assert(probe(dir) == inc)
  }

  test("incremental IVF deletes + compaction: tombstone mask ≡ " +
      "compacted rewrite ≡ batch probe minus deleted; replays across " +
      "the compaction no-op; new increments still land") {
    val e = graft.sources.Tables.table(spark, sfDir, "embeddings")
    val panel = e.filter(col("vec_id") < 32)
    val cents = ensureKmeansQuantizer(spark, sfDir)
    val dir = java.nio.file.Files.createTempDirectory("graft_ivfdel").toString
    def probe() = probeIvfIncremental(spark, dir, cents, panel, k = 3)
      .orderBy("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    appendIvfIncrement(spark, dir,
      e.filter(pmod(col("vec_id"), lit(2)) === 0), cents, 0L)
    appendIvfIncrement(spark, dir,
      e.filter(pmod(col("vec_id"), lit(2)) === 1), cents, 1L)
    deleteIvfIncrement(spark, dir,
      e.filter(pmod(col("vec_id"), lit(7)) === 3).select("vec_id"), 2L)
    val masked = probe()
    // reference: the batch probe over the corpus minus the deleted ids
    val expect = ivfTopKWithCentroids(
        e.filter(pmod(col("vec_id"), lit(7)) =!= 3), panel, cents, k = 3)
      .orderBy("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(masked == expect, "tombstone mask diverged from batch probe")
    // deleted vectors stay valid queries but are never neighbors
    assert(masked.exists(t => t._1 % 7 == 3))
    assert(!masked.exists(t => t._2 % 7 == 3))
    compactIvfIncremental(spark, dir)
    assert(probe() == expect, "compacted index diverged from the mask")
    // physical removal: gen 2 holds exactly the live rows, no tombstones
    val liveN = spark.read.parquet(s"$dir/g2").count()
    assert(liveN == e.filter(pmod(col("vec_id"), lit(7)) =!= 3).count())
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(!fs.exists(new org.apache.hadoop.fs.Path(s"$dir/g2/_tombstones")))
    // replays straddling the compaction no-op: the _FOLDED horizon
    // covers both the folded increments and the folded tombstones
    appendIvfIncrement(spark, dir,
      e.filter(pmod(col("vec_id"), lit(2)) === 1), cents, 1L)
    deleteIvfIncrement(spark, dir,
      e.filter(pmod(col("vec_id"), lit(7)) === 3).select("vec_id"), 2L)
    assert(spark.read.parquet(s"$dir/g2").count() == liveN,
      "replayed increment re-inserted folded rows")
    assert(probe() == expect)
    // a genuinely NEW increment past the horizon still lands
    appendIvfIncrement(spark, dir,
      e.filter(col("vec_id") < 8)
        .select((col("vec_id") + 1000000L).as("vec_id"), col("embedding")),
      cents, 3L)
    assert(spark.read.parquet(s"$dir/g2").count() == liveN + 8)
  }

  test("incremental IVF compaction crash: a written-but-unpublished " +
      "next generation is invisible to probes until LATEST flips, and " +
      "the re-run compaction overwrites it cleanly") {
    val e = graft.sources.Tables.table(spark, sfDir, "embeddings")
    val panel = e.filter(col("vec_id") < 32)
    val cents = ensureKmeansQuantizer(spark, sfDir)
    val dir = java.nio.file.Files
      .createTempDirectory("graft_ivfcrash").toString
    appendIvfIncrement(spark, dir, e, cents, 0L)
    deleteIvfIncrement(spark, dir,
      e.filter(pmod(col("vec_id"), lit(7)) === 3).select("vec_id"), 1L)
    def probe() = probeIvfIncremental(spark, dir, cents, panel, k = 3)
      .orderBy("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    val before = probe()
    // a compaction that died after writing data but BEFORE the pointer
    // flip: garbage (wrong rows, wrong schema) sits at g2, LATEST
    // still names g1
    e.limit(5).select(col("vec_id"), col("embedding"))
      .write.parquet(s"$dir/g2/batch=0")
    assert(probe() == before,
      "an unpublished generation leaked into a probe")
    // the re-run fold Overwrites the partial g2 and publishes
    compactIvfIncremental(spark, dir)
    assert(probe() == before, "re-run compaction diverged")
    assert(spark.read.parquet(s"$dir/g2").count() ==
      e.count() - e.filter(pmod(col("vec_id"), lit(7)) === 3).count())
  }

  test("PQ index deletes + compaction: tombstone mask ≡ compacted " +
      "codes; sidecar carried forward; physical removal; tombstone " +
      "replay idempotent") {
    val e = graft.sources.Tables.table(spark, sfDir, "embeddings")
    val panel = e.filter(col("vec_id") < 32)
    val doomed = e.filter(pmod(col("vec_id"), lit(7)) === 3).select("vec_id")
    val dir = java.nio.file.Files.createTempDirectory("graft_pqdel").toString
    writePqIndex(e, dir)
    deleteFromPqIndex(spark, dir, doomed, 0L)
    def probe() = probePqIndex(spark, dir, panel, k = 3)
      .orderBy("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    val masked = probe()
    // deleted vectors stay valid queries but are never neighbors
    assert(masked.exists(t => t._1 % 7 == 3))
    assert(!masked.exists(t => t._2 % 7 == 3))
    // replayed tombstone batch overwrites whole — answers unchanged
    deleteFromPqIndex(spark, dir, doomed, 0L)
    assert(probe() == masked)
    val sidecarBefore = readPqSidecar(spark, dir)
    compactPqIndex(spark, dir)
    assert(probe() == masked, "compacted codes diverged from the mask")
    assert(readPqSidecar(spark, dir) == sidecarBefore,
      "compaction must carry the frozen codebook sidecar forward")
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(!fs.exists(new org.apache.hadoop.fs.Path(s"$dir/v2/_tombstones")))
    val liveN = spark.read.parquet(s"$dir/v2/codes").count()
    assert(liveN == e.count() - doomed.count(),
      s"compaction did not remove tombstoned codes: $liveN")
    // a post-compaction re-mask of already-gone ids is a no-op
    deleteFromPqIndex(spark, dir, doomed, 1L)
    assert(probe() == masked)
  }

  test("incremental PQ ingest: frozen-codebook increments probe " +
      "identically to a fresh full encode; replays idempotent; a " +
      "crashed build converges") {
    graft.sources.DerivedCache.vacuumKinds(spark, Set("index-pq-inc"))
    val e = graft.sources.Tables.table(spark, sfDir, "embeddings")
    val panel = e.filter(col("vec_id") < 32)
    def probe(dir: String) = probePqIncremental(spark, dir, panel, k = 3)
      .orderBy("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    val dir = ensurePqIncremental(spark, sfDir)
    val inc = probe(dir)
    // pqTopK fits the same md5-rank codebook on the full corpus, so a
    // fresh full encode must rank identically — incremental growth of
    // the compressed index is invisible to probes
    val batch = pqTopK(e, panel, k = 3)
      .orderBy("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(inc == batch, "incremental PQ index diverged from full encode")
    // replay shield: redelivered increment overwrites whole
    val cents = hashCentroids(e, 16)
    appendPqIncrement(spark, dir,
      e.filter(pmod(col("vec_id"), lit(2)) === 1), cents, 1L)
    assert(probe(dir) == inc)
    assert(spark.read.parquet(s"$dir/g1").count() == e.count(),
      "replayed increment duplicated codes")
    // crash shield: no root marker → ensure re-runs both appends
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(s"$dir/_SUCCESS"), false)
    assert(ensurePqIncremental(spark, sfDir) == dir)
    assert(probe(dir) == inc)
  }

  test("incremental PQ CDC: upsert ranks by the new codes, takedowns " +
      "vanish, compaction is physical, folded replays no-op") {
    val e = graft.sources.Tables.table(spark, sfDir, "embeddings")
    val panel = e.filter(col("vec_id") < 32)
    val cents = hashCentroids(e, 16)
    val dir = java.nio.file.Files.createTempDirectory("graft_pqups").toString
    def probe() = probePqIncremental(spark, dir, panel, k = 3)
      .orderBy("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    appendPqIncrement(spark, dir,
      e.filter(pmod(col("vec_id"), lit(2)) === 0), cents, 0L)
    appendPqIncrement(spark, dir,
      e.filter(pmod(col("vec_id"), lit(2)) === 1), cents, 1L)
    // the q_ann_ivf_upsert mutation on the compressed index: re-embed
    // every vec_id % 5 == 1 doc with vec_id+1's vector, take down
    // every vec_id % 7 == 3
    val next = e.select((col("vec_id") - 1).as("vec_id"),
      col("embedding").as("__new_emb"))
    val ups = e.select("vec_id").join(next, "vec_id")
      .filter(pmod(col("vec_id"), lit(5)) === 1 &&
        pmod(col("vec_id"), lit(7)) =!= 3)
      .select(col("vec_id"), col("__new_emb").as("embedding"),
        lit("upsert").as("op"))
    val dels = e.filter(pmod(col("vec_id"), lit(7)) === 3)
      .select(col("vec_id"), col("embedding"), lit("delete").as("op"))
    upsertPqIncrement(spark, dir, ups.unionByName(dels), cents, 2L)
    val got = probe()
    // reference: a fresh full encode of the MUTATED corpus under the
    // same frozen codebook (queries keep their original vectors)
    val mutated = e.join(next, Seq("vec_id"), "left")
      .filter(pmod(col("vec_id"), lit(7)) =!= 3)
      .select(col("vec_id"),
        when(pmod(col("vec_id"), lit(5)) === 1 && col("__new_emb").isNotNull,
          col("__new_emb")).otherwise(col("embedding")).as("embedding"))
    val expect = pqProbe(pqEncode(mutated, cents), panel, cents, k = 3)
      .orderBy("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(got == expect, "upserted PQ index diverged from mutated encode")
    assert(!got.exists(_._2 % 7 == 3), "a takedown surfaced as a neighbor")
    // compaction: physical removal, probe unchanged
    compactPqIncremental(spark, dir)
    assert(probe() == expect, "compacted codes diverged")
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(!fs.exists(new org.apache.hadoop.fs.Path(s"$dir/g2/_tombstones")))
    val liveN = spark.read.parquet(s"$dir/g2").count()
    assert(liveN == mutated.count(), s"stale codes survived the fold: $liveN")
    // the pre-compaction generation is RETAINED for readers that
    // pinned it mid-probe (the documented publication contract):
    // its batch dirs are still physically readable after the fold
    assert(spark.read.parquet(s"$dir/g1/batch=0").count() ==
      e.filter(pmod(col("vec_id"), lit(2)) === 0).count())
    // folded replay no-ops; a genuinely new increment still lands
    upsertPqIncrement(spark, dir, ups.unionByName(dels), cents, 2L)
    assert(spark.read.parquet(s"$dir/g2").count() == liveN)
    assert(probe() == expect)
    appendPqIncrement(spark, dir,
      e.filter(col("vec_id") < 8)
        .select((col("vec_id") + 1000000L).as("vec_id"), col("embedding")),
      cents, 3L)
    assert(spark.read.parquet(s"$dir/g2").count() == liveN + 8)
  }

  test("centroidDrift: counts reconcile on harness data; clustered fixture separates stable from shifted") {
    val emb = graft.sources.Tables.table(spark, sfDir, "embeddings")
    val rows = SparkEntry.queries("q_centroid_drift")(spark, sfDir).collect()
    val total = rows.map(r =>
      r.getAs[Long]("n_old") + r.getAs[Long]("n_new")).sum
    assert(total == emb.count())
    // harness labels are NOT clustered: both halves' prototypes are
    // noise means, so |drift| stays far from ±1 — the audit reads
    // "no stable prototype", which is itself the finding
    assert(rows.forall(r => math.abs(r.getAs[Double]("drift_cos")) < 0.9))
    // clustered fixture: label prototypes are real, so
    // same-distribution halves sit near 1...
    val rnd = new scala.util.Random(5)
    val centers = Array.fill(3)(Array.fill(16)(rnd.nextGaussian().toFloat))
    val fix = (0 until 120).map { i =>
      (i.toLong, i % 3,
        centers(i % 3).map(v => v + 0.05f * rnd.nextGaussian().toFloat))
    }.toDF("vec_id", "label", "embedding")
    val stable = centroidDrift(fix, pmod(col("vec_id"), lit(2)) === 1)
      .collect()
    assert(stable.length == 3 &&
      stable.forall(_.getAs[Double]("drift_cos") > 0.99))
    // ...and a genuinely shifted new half (negated vectors) flips the
    // prototype: cosine −1
    val shifted = fix.withColumn("embedding",
      when(pmod(col("vec_id"), lit(2)) === 1,
        transform(col("embedding"), x => -x)).otherwise(col("embedding")))
    assert(centroidDrift(shifted, pmod(col("vec_id"), lit(2)) === 1)
      .collect().forall(_.getAs[Double]("drift_cos") < -0.99))
  }

  test("q_semdedup survivors match an independent driver replay") {
    // straight-line reference: collect the harness embeddings, assign
    // each to its argmax-dot centroid (tie -> smaller cid, the same
    // contract nearestCentroid implements in codegen), then drop any
    // vector with a lower-id cluster-mate at cosine >= 0.4 — computed
    // with plain Scala doubles, no Spark expressions shared with the
    // operator under test.
    val dir = sfDir
    val got = SparkEntry.queries("q_semdedup")(spark, dir)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val rows = graft.sources.Tables.table(spark, dir, "embeddings")
      .select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toArray)
      .sortBy(_._1)
    val cents = kmeansCentroids(
      graft.sources.Tables.table(spark, dir, "embeddings"), 16, 2,
      sampleFrac = 0.5)
    def dot(a: Array[Double], b: Seq[Double]): Double =
      a.indices.map(i => a(i) * b(i)).sum
    val assign = rows.map { case (id, v) =>
      val best = cents.map { case (cid, c) => (-dot(v, c), cid) }.min._2
      id -> best
    }.toMap
    val byCluster = rows.groupBy { case (id, _) => assign(id) }
    def norm(v: Array[Double]): Double = math.sqrt(v.map(x => x * x).sum)
    val dropped = byCluster.values.flatMap { members =>
      val sorted = members.sortBy(_._1)
      sorted.filter { case (idB, vB) =>
        sorted.exists { case (idA, vA) =>
          idA < idB && dot(vB, vA.toSeq) / (norm(vA) * norm(vB)) >= 0.4
        }
      }.map(_._1)
    }.toSet
    val expected = rows.collect {
      case (id, _) if !dropped(id) => id -> assign(id)
    }.toMap
    assert(got == expected,
      s"survivor sets differ: spark-only=${(got.keySet -- expected.keySet).toSeq.sorted.take(5)} " +
        s"replay-only=${(expected.keySet -- got.keySet).toSeq.sorted.take(5)}")
    assert(dropped.nonEmpty, "fixture never exercises the drop direction")
    InternalCaches.drain()
    spark.catalog.clearCache()
  }

  test("versioned PQ index: delete-then-re-append of the same id is an " +
      "upsert — the fresh codes survive the tombstone mask, survive " +
      "compaction PHYSICALLY, and only a LATER tombstone removes them") {
    val e = graft.sources.Tables.table(spark, sfDir, "embeddings")
    val panel = e.filter(col("vec_id") < 32)
    val dir = java.nio.file.Files.createTempDirectory("graft_pqups").toString
    writePqIndex(e, dir)
    val (cents, m, d) = readPqSidecar(spark, dir)
    def probe() = probePqIndex(spark, dir, panel, k = 3)
      .orderBy("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    def expectOver(corpus: org.apache.spark.sql.DataFrame) =
      pqProbe(pqEncode(corpus, cents, m, d), panel, cents, k = 3, m, d)
        .orderBy("query_id", "neighbor_id").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    // upsert doc 5 with doc 6's embedding: tombstone at batch 0 + a
    // SAME-batch re-append. An orderless mask (the pre-fix behavior)
    // would hide the fresh codes behind their own tombstone.
    val mutated = e.filter(col("vec_id") === 6L)
      .select(lit(5L).as("vec_id"), col("embedding"))
    val mutCorpus = e.filter(col("vec_id") =!= 5L)
      .select("vec_id", "embedding").unionByName(mutated)
    deleteFromPqIndex(spark, dir, mutated.select("vec_id"), 0L)
    appendToPqIndex(mutated, dir, 0L)
    val upserted = expectOver(mutCorpus)
    assert(probe() == upserted,
      "re-appended codes did not survive their own tombstone")
    // the mutation is visible, not a silent no-op
    assert(upserted != expectOver(e.select("vec_id", "embedding")))
    // compaction must carry the re-appended codes into the new version
    // physically — the ADVICE failure mode was dropping them forever
    compactPqIndex(spark, dir)
    assert(probe() == upserted, "compaction dropped the upserted codes")
    val v = spark.read.textFile(s"$dir/LATEST").collect().head.trim
    val rows5 = spark.read.parquet(s"$dir/v$v/codes")
      .filter(col("vec_id") === 5L).count()
    assert(rows5 == 1L, s"expected exactly one live code row for id 5: $rows5")
    // a LATER tombstone still deletes the id outright
    deleteFromPqIndex(spark, dir, mutated.select("vec_id"), 1L)
    assert(probe() == expectOver(e.filter(col("vec_id") =!= 5L)
      .select("vec_id", "embedding")))
  }

  test("versioned PQ index self-heals pre-batch-column layouts: codes " +
      "written without the log column read as base rows") {
    val e = graft.sources.Tables.table(spark, sfDir, "embeddings")
    val panel = e.filter(col("vec_id") < 32)
    val dirA = java.nio.file.Files.createTempDirectory("graft_pqnew").toString
    val dirB = java.nio.file.Files.createTempDirectory("graft_pqold").toString
    writePqIndex(e, dirA)
    // replicate dirA as a legacy layout: same codes minus the batch
    // column, same sidecar, same pointer
    spark.read.parquet(s"$dirA/v1/codes").drop("batch")
      .write.partitionBy("list_id").parquet(s"$dirB/v1/codes")
    val fs = new org.apache.hadoop.fs.Path(dirB)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    for (f <- Seq("v1/centroids.tsv", "LATEST")) {
      org.apache.hadoop.fs.FileUtil.copy(fs,
        new org.apache.hadoop.fs.Path(s"$dirA/$f"), fs,
        new org.apache.hadoop.fs.Path(s"$dirB/$f"), false,
        spark.sparkContext.hadoopConfiguration)
    }
    def probe(dir: String) = probePqIndex(spark, dir, panel, k = 3)
      .orderBy("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(probe(dirB) == probe(dirA),
      "legacy codes (no batch column) diverged from the current layout")
    // legacy rows coalesce to the base position −1, so any tombstone
    // masks them — the exact semantics they were written under
    val doomed = e.filter(pmod(col("vec_id"), lit(7)) === 3)
      .select("vec_id")
    deleteFromPqIndex(spark, dirA, doomed, 0L)
    deleteFromPqIndex(spark, dirB, doomed, 0L)
    assert(probe(dirB) == probe(dirA))
    assert(!probe(dirB).exists(t => t._2 % 7 == 3))
  }

  test("compaction skips TORN batches (no _SUCCESS witness): partial " +
      "rows stay out of the fold, the horizon leaves them replayable, " +
      "and the replay converges in the new generation") {
    val e = graft.sources.Tables.table(spark, sfDir, "embeddings")
    val panel = e.filter(col("vec_id") < 32)
    val cents = ensureKmeansQuantizer(spark, sfDir)
    val dir = java.nio.file.Files.createTempDirectory("graft_torn").toString
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    def probe() = probeIvfIncremental(spark, dir, cents, panel, k = 3)
      .orderBy("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    def reference(corpus: org.apache.spark.sql.DataFrame) =
      ivfTopKWithCentroids(corpus, panel, cents, k = 3)
        .orderBy("query_id", "neighbor_id").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    val even = e.filter(pmod(col("vec_id"), lit(2)) === 0)
    val odd = e.filter(pmod(col("vec_id"), lit(2)) === 1)
    appendIvfIncrement(spark, dir, even, cents, 0L)
    appendIvfIncrement(spark, dir, odd, cents, 1L)
    // simulate the crash: batch 1 landed its rows but died before the
    // _SUCCESS witness — indistinguishable from a half-written batch
    fs.delete(new org.apache.hadoop.fs.Path(s"$dir/g1/batch=1/_SUCCESS"),
      false)
    compactIvfIncremental(spark, dir)
    // the fold froze ONLY the complete batch…
    assert(spark.read.parquet(s"$dir/g2").count() == even.count(),
      "torn batch was folded into the new generation")
    assert(probe() == reference(even))
    // …and left the torn id BELOW the horizon, so its replay fires
    // instead of no-opping — the pre-fix behavior lost it forever
    appendIvfIncrement(spark, dir, odd, cents, 1L)
    assert(probe() == reference(e), "torn batch replay did not converge")
    assert(spark.read.parquet(s"$dir/g2").count() == e.count())
  }

  test("compaction skips a torn UPSERT batch on BOTH sides: a complete " +
      "tombstone whose same-id data half tore is not applied, so the " +
      "replayed upsert restores the re-append") {
    val e = graft.sources.Tables.table(spark, sfDir, "embeddings")
    val panel = e.filter(col("vec_id") < 32)
    val cents = ensureKmeansQuantizer(spark, sfDir)
    val dir = java.nio.file.Files.createTempDirectory("graft_tornup").toString
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    def probe() = probeIvfIncremental(spark, dir, cents, panel, k = 3)
      .orderBy("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    appendIvfIncrement(spark, dir, e, cents, 0L)
    val before = probe()
    // upsert batch 1: re-embed doc 1 as doc 2's vector. The tombstone
    // write completed; the data write tore (witness gone).
    val change = e.filter(col("vec_id") === 2L)
      .select(lit(1L).as("vec_id"), col("embedding"))
    upsertIvfIncrement(spark, dir,
      change.withColumn("op", lit("upsert")), cents, 1L)
    val upserted = probe()
    assert(upserted != before, "fixture upsert must change the ranking")
    fs.delete(new org.apache.hadoop.fs.Path(s"$dir/g1/batch=1/_SUCCESS"),
      false)
    compactIvfIncremental(spark, dir)
    // folding the delete half alone would vanish doc 1 with no replay
    // able to bring it back; skipping the whole batch keeps the
    // pre-upsert state — converged, not corrupted
    assert(probe() == before,
      "torn upsert was half-applied by the compaction")
    // the replayed upsert lands in the new generation and converges
    upsertIvfIncrement(spark, dir,
      change.withColumn("op", lit("upsert")), cents, 1L)
    assert(probe() == upserted, "replayed torn upsert did not converge")
  }

  test("compaction REFUSES a torn batch sitting BELOW a completed " +
      "one: the single-sequential-writer contract broke, and folding " +
      "would swallow the replay — fail loudly, replay heals, then fold") {
    val e = graft.sources.Tables.table(spark, sfDir, "embeddings")
    val cents = ensureKmeansQuantizer(spark, sfDir)
    val dir = java.nio.file.Files.createTempDirectory("graft_tornlow").toString
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val third = (r: Int) => e.filter(pmod(col("vec_id"), lit(3)) === r)
    appendIvfIncrement(spark, dir, third(0), cents, 0L)
    appendIvfIncrement(spark, dir, third(1), cents, 1L)
    appendIvfIncrement(spark, dir, third(2), cents, 2L)
    // the contract violation: batch 1 tore, yet batch 2 committed
    // after it (two writers, or an out-of-order retry)
    fs.delete(new org.apache.hadoop.fs.Path(s"$dir/g1/batch=1/_SUCCESS"),
      false)
    val ex = intercept[IllegalArgumentException] {
      compactIvfIncremental(spark, dir)
    }
    assert(ex.getMessage.contains("torn"), ex.getMessage)
    // nothing moved: no new generation was published
    assert(!fs.exists(new org.apache.hadoop.fs.Path(s"$dir/g2")),
      "refused compaction still published a generation")
    // the replay overwrites the torn dir whole (witness restored) and
    // compaction then proceeds with every batch intact
    appendIvfIncrement(spark, dir, third(1), cents, 1L)
    compactIvfIncremental(spark, dir)
    assert(spark.read.parquet(s"$dir/g2").count() == e.count(),
      "healed fold lost rows")
  }
}
