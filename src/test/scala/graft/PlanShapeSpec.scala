package graft

/** Structural guarantee over the ENTIRE declared surface: no query
  * may plan a cross product or nested-loop join unless it is on the
  * explicit whitelist below (each entry is a deliberate, documented
  * design choice — a scalar broadcast or an oracle fixture). A new
  * operator that accidentally plans an unblocked n² fails here before
  * it ever reaches a big corpus.
  */
class PlanShapeSpec extends SparkSpec {

  /** Queries allowed to contain BroadcastNestedLoopJoin/Cartesian:
    *  - q_ngram_jaccard: deliberately-blocked cross join, the oracle
    *    ground-truth fixture for the LSH math (documented);
    *  - q_ann_brute: broadcast query panel × streamed corpus with a
    *    non-equi predicate — the exact baseline, corpus never
    *    materializes;
    *  - q_tfidf / q_watermark_filter: scalar (1-row) broadcast factors
    *    joined without a key.
    *
    * Known boundary: joins INSIDE eagerly-checkpointed iterative loops
    * (clusterPairs' label-propagation rounds) have already executed by
    * the time executedPlan is read — the checkpoint truncates them out
    * of the plan text. Those joins are equi-joins by construction
    * (groupBy/join on id); the guard covers every non-iterative stage.
    */
  private val allowed = Set(
    "q_ngram_jaccard", "q_ann_brute", "q_tfidf", "q_watermark_filter")

  test("no declared query plans an unlisted cross product or nested loop") {
    val offenders = SparkEntry.queries.toSeq.flatMap { case (name, fn) =>
      val plan =
        try fn(spark, sfDir).queryExecution.executedPlan.toString
        catch { case e: Throwable => fail(s"$name failed to plan: $e") }
      val bad = plan.contains("BroadcastNestedLoopJoin") ||
        plan.contains("CartesianProduct")
      if (bad && !allowed.contains(name)) Some(name) else None
    }
    assert(offenders.isEmpty,
      s"unlisted cross-product plans in: ${offenders.sorted.mkString(", ")}")
  }
}
