package graft

import graft.operators.Sampling
import graft.streaming.{BudgetDoc, BudgetStream}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, Trigger}

/** Streaming per-source budget gate: strict-prefix semantics, state
  * survival across micro-batches, and exact parity with the batch
  * tokenBudgetMix when fed in rank order.
  */
class BudgetStreamSpec extends SparkSpec {
  import spark.implicits._

  test("rankKey mirrors Spark's md5(cast(id as string)) bit-for-bit") {
    val ids = Seq(0L, 1L, 42L, 999999L)
    val viaSpark = ids.toDF("id")
      .select(col("id"), md5(col("id").cast("string")).as("h"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    ids.foreach(i => assert(BudgetStream.rankKey(i) == viaSpark(i)))
  }

  test("foldBudget: strict prefix — an overflowing doc spends its cost " +
      "and closes the source for later smaller docs") {
    val docs = Seq(BudgetDoc(1, "a", 40), BudgetDoc(2, "a", 70),
      BudgetDoc(3, "a", 5))
    val (cum, admitted) = BudgetStream.foldBudget(0L, docs, budget = 100)
    // doc 2 overflows (110 > 100) but its cost still counts, so doc 3
    // (115 > 100) cannot jump the queue
    assert(admitted.map(_.doc_id) == Seq(1L))
    assert(cum == 115L)
    // the counter carries into the next batch: nothing fits anymore
    val (_, later) = BudgetStream.foldBudget(cum,
      Seq(BudgetDoc(4, "a", 1)), budget = 100)
    assert(later.isEmpty)
  }

  test("streamed gate ≡ batch tokenBudgetMix when fed in rank order " +
      "across micro-batches; spend survives the batch boundary") {
    implicit val sqlCtx = spark.sqlContext
    val fixture = (1L to 90L).map(i => (i, s"src${i % 3}", 10L + i % 7))
    val staticDf = fixture.toDF("doc_id", "source", "cost")
    val budgets = Map("src0" -> 200L, "src1" -> 120L)
    val expected = Sampling.tokenBudgetMix(staticDf, "doc_id", "source",
      "cost", budgets, defaultBudget = 60L)
      .select(col("doc_id"), col("cum_cost")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // feed in GLOBAL rank order, split mid-stream: per-source order is
    // then rank order too, and every source's spend must survive the
    // micro-batch boundary for the tails to be cut identically
    val ranked = fixture.sortBy { case (id, _, _) =>
      (BudgetStream.rankKey(id), id)
    }
    val mem = MemoryStream[(Long, String, Long)]
    val gate = BudgetStream.admitWithinBudget(
      mem.toDF().toDF("doc_id", "source", "cost"),
      budgets, defaultBudget = 60L)
    val query = gate.writeStream.format("memory").queryName("budget")
      .outputMode(OutputMode.Append()).trigger(Trigger.ProcessingTime(0))
      .start()
    try {
      mem.addData(ranked.take(45): _*)
      query.processAllAvailable()
      mem.addData(ranked.drop(45): _*)
      query.processAllAvailable()
      val got = spark.table("budget")
        .select("doc_id", "cum_cost").collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got == expected && expected.nonEmpty,
        s"stream admitted ${got.size}, batch kept ${expected.size}")
    } finally query.stop()
  }
}
