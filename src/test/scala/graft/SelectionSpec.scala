package graft

import graft.operators.Selection
import graft.sources.Tables.table
import org.apache.spark.sql.functions._

/** Data-selection operators: DSIR importance weights, perplexity
  * tiers, temperature quotas. The DuckDB oracle pins exact values;
  * these tests pin the PROPERTIES the oracle can't express — that the
  * selection math does what the method claims.
  */
class SelectionSpec extends SparkSpec {

  test("dsirWeights: target slice outscores raw per token on average") {
    val docs = table(spark, sfDir, "documents")
    val w = Selection.dsirWeights(docs, "doc_id", "text",
        col("source") === "src0")
      .join(docs.select(col("doc_id"), col("source")), "doc_id")
    // compare PER-TOKEN means: the raw total is length-proportional
    // (src0 docs run ~10% longer in the harness corpus, which flips
    // the unnormalized comparison), and the log-ratio signal lives in
    // the per-token rate — the slice the target model was FIT ON must
    // rate higher than the rest, else the ratio is inverted somewhere
    val m = w.groupBy(col("source") === "src0")
      .agg(avg(col("dsir_logw") / col("n_tokens")).as("m"))
      .collect().map(r => r.getBoolean(0) -> r.getDouble(1)).toMap
    assert(m(true) > m(false),
      s"target per-token avg ${m(true)} not above raw ${m(false)}")
  }

  test("dsirWeights: n_tokens matches the tokenizer; weights are finite") {
    val docs = table(spark, sfDir, "documents")
    val w = Selection.dsirWeights(docs, "doc_id", "text",
      col("source") === "src0")
    assert(w.count() == docs.count(), "every doc must be scored")
    val mismatch = w.join(docs, "doc_id")
      .filter(col("n_tokens") =!=
        size(split(trim(lower(col("text"))), "\\s+")))
      .count()
    assert(mismatch == 0, s"$mismatch docs with wrong token count")
    assert(w.filter(col("dsir_logw").isNull ||
      isnan(col("dsir_logw"))).count() == 0)
  }

  test("dsirWeights: deterministic across runs") {
    val docs = table(spark, sfDir, "documents")
    def run() = Selection.dsirWeights(docs, "doc_id", "text",
        col("source") === "src0")
      .orderBy("doc_id").collect().toSeq
    assert(run() == run())
  }

  test("sqrtQuota: α=1/2 damping — smaller sources keep larger fractions") {
    // the harness corpus has perfectly uniform sources (25 docs each),
    // so the damping property needs a skewed fixture: 64/16/4 docs
    import spark.implicits._
    val skewed = (0 until 84).map { i =>
      (i.toLong, if (i < 64) "big" else if (i < 80) "mid" else "small")
    }.toDF("doc_id", "source")
    val kept = Selection.sqrtQuota(skewed, "doc_id", "source")
      .groupBy("source").agg(count(lit(1)).as("k"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // T = ⌈0.4·84⌉ = 34, √n weights 8:4:2 → quotas ⌈34·8/14⌉=20,
    // ⌈34·4/14⌉=10, ⌈34·2/14⌉=5 (capped at n=4)
    assert(kept == Map("big" -> 20L, "mid" -> 10L, "small" -> 4L),
      s"quotas drifted: $kept")
    val frac = Map("big" -> 20.0 / 64, "mid" -> 10.0 / 16, "small" -> 4.0 / 4)
    assert(frac("small") > frac("mid") && frac("mid") > frac("big"),
      "kept fraction must decrease with source size")
  }

  test("sqrtQuota: total kept tracks the 40% budget on the real corpus") {
    val docs = table(spark, sfDir, "documents")
    val kept = Selection.sqrtQuota(docs, "doc_id", "source")
    val n = docs.count()
    val nSources = docs.select("source").distinct().count()
    val total = kept.count()
    // Σ⌈T·qs/qt⌉ ∈ [T, T + #sources]; quota-over-size caps can only
    // shrink it, and the uniform harness corpus never caps
    assert(total >= 2L * n / 5 && total <= (2L * n + 4) / 5 + nSources,
      s"kept $total of $n across $nSources sources")
  }

  test("sqrtQuota: raising the keep fraction only grows the kept set") {
    val docs = table(spark, sfDir, "documents")
    val at40 = Selection.sqrtQuota(docs, "doc_id", "source", 2L, 5L)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val at60 = Selection.sqrtQuota(docs, "doc_id", "source", 3L, 5L)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    // md5-rank prefixes: a bigger budget may only extend each source's
    // kept prefix, never swap members — the same replay-safety contract
    // as Sampling's hash cuts
    assert(at40.subsetOf(at60),
      s"${(at40 -- at60).size} docs dropped when the budget grew")
    assert(at60.size > at40.size)
  }

  test("pplBucketsByCutpoints: the no-sort scale path agrees ≥90% with ntile") {
    val exact = SparkEntry.queries("q_ppl_buckets")(spark, sfDir)
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getString(3))).toMap
    InternalCaches.drain(); spark.catalog.clearCache()
    val cut = Selection.pplBucketsByCutpoints(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2),
        r.getString(3)))
    assert(cut.length == exact.size, "both paths must score the same docs")
    // cutpoint assignment differs from ntile only where boundary ties
    // force ntile to split equal scores across tiers
    val agree = cut.count { case (id, _, _, b) => exact(id)._2 == b }
    assert(agree.toDouble / cut.length >= 0.9,
      s"only $agree/${cut.length} agree with the exact terciles")
    // the cutpoint path's own contract: within a language, every head
    // score ≥ every middle score ≥ every tail score (no count balance,
    // but strict score ordering — ties never straddle tiers here)
    cut.groupBy(_._2).foreach { case (lang, rs) =>
      def scores(b: String) = rs.filter(_._4 == b).map(_._3)
      for (Seq(hi, lo) <- Seq("head", "middle", "tail").sliding(2))
        if (scores(hi).nonEmpty && scores(lo).nonEmpty)
          assert(scores(hi).min >= scores(lo).max,
            s"$lang: $hi min ${scores(hi).min} < $lo max ${scores(lo).max}")
    }
    InternalCaches.drain(); spark.catalog.clearCache()
  }

  test("dsirWeights: an empty target slice still yields finite weights") {
    val docs = table(spark, sfDir, "documents")
    val w = Selection.dsirWeights(docs, "doc_id", "text", lit(false))
    // ct = 0 in every bucket: per-token terms are ln(1)-ln(cr+1) plus
    // the total-count constant — all defined; nothing NaN/null
    assert(w.count() == docs.count())
    assert(w.filter(col("dsir_logw").isNull ||
      isnan(col("dsir_logw"))).count() == 0)
  }

  test("q_curriculum: phases partition the scored corpus, positions dense") {
    val out = SparkEntry.queries("q_curriculum")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getInt(3)))
    // every scored doc appears exactly once, phases limited to 1..3
    assert(out.map(_._1).distinct.length == out.length)
    assert(out.forall(t => t._2 >= 1 && t._2 <= 3))
    assert(out.forall(t => t._3 >= 0 && t._3 < 4))
    // positions are dense 1..n within every (phase, shard) — the
    // "read shards in pos order" replay contract
    out.groupBy(t => (t._2, t._3)).foreach { case (ps, rs) =>
      assert(rs.map(_._4).sorted.toSeq == (1 to rs.length),
        s"positions not dense in $ps")
    }
    InternalCaches.drain(blocking = true)
    spark.catalog.clearCache()
  }

  test("q_ppl_buckets: terciles balanced per language, scores ordered") {
    val out = SparkEntry.queries("q_ppl_buckets")(spark, sfDir)
    val rows = out.collect()
    val byLang = rows.groupBy(_.getString(1))
    byLang.foreach { case (lang, rs) =>
      val sizes = rs.groupBy(_.getString(3)).map { case (b, g) => b -> g.length }
      // ntile: bucket sizes differ by at most 1 within a language
      assert(sizes.values.max - sizes.values.min <= 1,
        s"$lang tercile sizes $sizes")
      // every head score ≥ every tail score within the language
      val head = rs.filter(_.getString(3) == "head").map(_.getDouble(2))
      val tail = rs.filter(_.getString(3) == "tail").map(_.getDouble(2))
      if (head.nonEmpty && tail.nonEmpty)
        assert(head.min >= tail.max,
          s"$lang head min ${head.min} < tail max ${tail.max}")
    }
    InternalCaches.drain(blocking = true)
    spark.catalog.clearCache()
  }
}
