package graft

import graft.operators.{RangeJoin, Sampling}
import org.apache.spark.sql.functions._
import java.sql.Timestamp

/** Deterministic hash splits and the bucketed range join. */
class SamplingRangeSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("assignSplit is stable, total, and roughly proportioned") {
    val ids = (1L to 2000L).toDF("id")
    val split = ids.select(col("id"), Sampling.assignSplit(col("id")).as("s"))
    val counts = split.groupBy("s").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts.values.sum == 2000)
    assert(counts("train") > 1500 && counts("train") < 1700) // ~80%
    assert(counts("val") > 120 && counts("val") < 280)       // ~10%
    // rerun gives the identical assignment (no rand() anywhere)
    val again = ids.select(col("id"), Sampling.assignSplit(col("id")).as("s"))
    assert(split.exceptAll(again).count() == 0)
  }

  test("hashSample keeps a stable subset of about p") {
    val ids = (1L to 2000L).toDF("id")
    val n = Sampling.hashSample(ids, "id", 0.25).count()
    assert(n > 400 && n < 600)
    // subset property: sampling at a higher p contains the lower-p set
    val small = Sampling.hashSample(ids, "id", 0.1)
    val big = Sampling.hashSample(ids, "id", 0.5)
    assert(small.exceptAll(big).count() == 0)
  }

  test("mixtureSample applies per-source rates; raising a rate only " +
      "grows that source's kept set") {
    val rows = (for (i <- 1L to 3000L)
      yield (i, s"src${i % 3}")).toDF("id", "source")
    val rates = Map("src0" -> 1.0, "src1" -> 0.4, "src2" -> 0.0)
    val kept = Sampling.mixtureSample(rows, "id", "source", rates)
    val bySrc = kept.groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(bySrc("src0") == 1000)            // rate 1.0 keeps everything
    assert(!bySrc.contains("src2"))          // rate 0.0 keeps nothing
    assert(bySrc("src1") > 300 && bySrc("src1") < 500) // ~40%
    // unknown sources fall to defaultRate
    val other = Seq((1L, "srcX")).toDF("id", "source")
    assert(Sampling.mixtureSample(other, "id", "source", rates).count() == 0)
    assert(Sampling.mixtureSample(other, "id", "source", rates,
      defaultRate = 1.0).count() == 1)
    // monotone: the 0.4 sample is a prefix of the 0.8 sample, so a
    // rate bump never swaps which rows survive
    val bumped = Sampling.mixtureSample(rows, "id", "source",
      rates + ("src1" -> 0.8))
    assert(kept.exceptAll(bumped).count() == 0)
  }

  test("rangeJoin: containment honored across bucket boundaries") {
    val points = Seq(
      (1L, ts("2024-01-01 10:14:00"), "in-w1"),
      (1L, ts("2024-01-01 10:46:00"), "in-w2-crossbucket"),
      (1L, ts("2024-01-01 11:30:00"), "outside"),
      (2L, ts("2024-01-01 10:14:00"), "wrong-key")
    ).toDF("k", "t", "tag")
    val intervals = Seq(
      (1L, ts("2024-01-01 10:00:00"), ts("2024-01-01 10:15:00"), "w1"),
      (1L, ts("2024-01-01 10:40:00"), ts("2024-01-01 11:10:00"), "w2")
    ).toDF("k", "s", "e", "w")
    val got = RangeJoin.rangeJoin(points, "t", intervals, "s", "e",
        Seq("k"), bucketMicros = 30L * 60 * 1000000)
      .select("tag", "w").collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(got == Set(("in-w1", "w1"), ("in-w2-crossbucket", "w2")))
  }

  test("rangeJoin leftOpen excludes the start instant, includes the end") {
    val points = Seq((1L, ts("2024-01-01 10:00:00"), "at-start"),
      (1L, ts("2024-01-01 10:30:00"), "at-end")).toDF("k", "t", "tag")
    val intervals = Seq((1L, ts("2024-01-01 10:00:00"),
      ts("2024-01-01 10:30:00"), "w")).toDF("k", "s", "e", "w")
    def tags(leftOpen: Boolean) = RangeJoin.rangeJoin(points, "t", intervals,
        "s", "e", Seq("k"), 30L * 60 * 1000000, leftOpen)
      .select("tag").as[String].collect().toSet
    assert(tags(leftOpen = true) == Set("at-end"))
    assert(tags(leftOpen = false) == Set("at-start", "at-end"))
  }

  test("hashSampleK is an exact-k md5-rank prefix via TakeOrdered, no full sort") {
    val docs = graft.sources.Tables.table(spark, sfDir, "documents")
    val sampled = Sampling.hashSampleK(docs, "doc_id", 20)
    val plan = sampled.queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"),
      s"expected per-partition top-k, got:\n$plan")
    val got = sampled.select("doc_id").as[Long].collect().toSet
    assert(got.size == 20)
    // the k-sample is a prefix of the md5 ranking: growing k only adds
    val got30 = Sampling.hashSampleK(docs, "doc_id", 30)
      .select("doc_id").as[Long].collect().toSet
    assert(got.subsetOf(got30))
  }

  test("stratifiedSampleK: exactly k per group, growing k only adds") {
    val docs = graft.sources.Tables.table(spark, sfDir, "documents")
    val per5 = Sampling.stratifiedSampleK(docs, "doc_id", "source", 5)
    val counts = per5.groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val nSources = docs.select("source").distinct().count()
    assert(counts.size == nSources)
    assert(counts.values.forall(_ == 5L),
      s"not exactly 5 per source: $counts")
    // per-group prefix property: the k=5 panel is inside the k=8 panel
    val ids5 = per5.select("doc_id").as[Long].collect().toSet
    val ids8 = Sampling.stratifiedSampleK(docs, "doc_id", "source", 8)
      .select("doc_id").as[Long].collect().toSet
    assert(ids5.subsetOf(ids8))
  }

  test("weightedSampleK favors heavy rows and replays deterministically") {
    // equal-sized populations, weights 1000 vs 10: the heavy side must
    // dominate the sample (md5 ranks are fixed, so this is exact, not
    // flaky-statistical)
    val rows = ((1L to 500L).map(i => (i, 1000L)) ++
      (501L to 1000L).map(i => (i, 10L))).toDF("id", "w")
    val picked = Sampling.weightedSampleK(rows, "id", "w", 100)
      .select("id", "w").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(picked.length == 100)
    val heavy = picked.count(_._2 == 1000L)
    assert(heavy > 80, s"heavy side underrepresented: $heavy/100")
    // bit-identical on rerun (no rand() anywhere)
    val again = Sampling.weightedSampleK(rows, "id", "w", 100)
      .select("id", "w").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(picked.sorted.sameElements(again.sorted))
    // zero/negative weights are clamped, not divide-by-zero
    val degenerate = Seq((1L, 0L), (2L, -5L)).toDF("id", "w")
    assert(Sampling.weightedSampleK(degenerate, "id", "w", 2).count() == 2)
    // null weights clamp to 1 too (Spark's greatest SKIPS nulls) —
    // NOT a null rank key, which would sort first and hijack the
    // sample; pinned because engines differ on greatest(NULL, x)
    val withNull = Seq((1L, Some(1000L)), (2L, None), (3L, Some(1000L)))
      .toDF("id", "w")
    val picked2 = Sampling.weightedSampleK(withNull, "id", "w", 2)
      .select("id").as[Long].collect().toSet
    val unweighted = Seq((1L, 1L), (2L, 1L), (3L, 1L)).toDF("id", "w")
    val nullAsOne = Sampling.weightedSampleK(
      withNull.withColumn("w", coalesce(col("w"), lit(1L))), "id", "w", 2)
      .select("id").as[Long].collect().toSet
    assert(picked2 == nullAsOne)
    assert(unweighted.count() == 3) // fixture sanity
  }

  test("tokenBudgetMix: bucketed prefix sum ≡ one plain window; budget " +
      "is a take-while prefix that only grows when raised") {
    import org.apache.spark.sql.expressions.Window
    // 400 docs over 3 sources, varied costs — enough ids to populate
    // many of the 256 md5-prefix buckets so cross-bucket offsets are
    // actually exercised
    val docs = (1L to 400L)
      .map(i => (i, s"src${i % 3}", 50L + i % 97)).toDF("id", "src", "cost")
    val got = Sampling.tokenBudgetMix(docs, "id", "src", "cost",
      Map("src0" -> 5000L, "src1" -> 3000L), defaultBudget = 1000L)
      .select("id", "src", "cost", "cum_cost")
    // reference: the contract, written as the naive single window
    val ref = docs
      .withColumn("cum_cost", sum("cost").over(
        Window.partitionBy("src")
          .orderBy(md5(col("id").cast("string")), col("id"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .filter(col("cum_cost") <= when(col("src") === "src0", 5000L)
        .when(col("src") === "src1", 3000L).otherwise(1000L))
      .select(col("id"), col("src"), col("cost"), col("cum_cost"))
    assert(got.exceptAll(ref).count() == 0 && ref.exceptAll(got).count() == 0)
    // take-while: within each source the kept set is a rank-order
    // PREFIX — max kept cum ≤ budget and every kept row's cum is
    // below every dropped row's cum (monotone cut, no jump-the-queue)
    val keptMax = got.groupBy("src").agg(max("cum_cost").as("m"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(keptMax("src1") <= 3000L && keptMax.getOrElse("src2", 0L) <= 1000L)
    // raising a budget strictly grows the kept set, never swaps it
    val raised = Sampling.tokenBudgetMix(docs, "id", "src", "cost",
      Map("src0" -> 5000L, "src1" -> 9000L), defaultBudget = 1000L)
      .select("id", "src", "cost", "cum_cost")
    assert(got.exceptAll(raised).count() == 0)
    assert(raised.count() > got.count())
  }
}
