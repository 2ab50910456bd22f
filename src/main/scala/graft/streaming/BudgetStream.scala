package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** A doc offered to the budget gate: stable id, source, and its cost
  * in the budget's unit (chars, tokens — caller's choice).
  */
case class BudgetDoc(doc_id: Long, source: String, cost: Long)

/** Per-source gate state: cost consumed so far, ADMITTED OR NOT. */
case class BudgetSpent(spent: Long)

/** An admitted doc with its running position in the source's spend. */
case class BudgetAdmit(doc_id: Long, source: String, cost: Long,
    cum_cost: Long)

/** Streaming twin of `operators.Sampling.tokenBudgetMix`: admit each
  * source's docs until that source's cost budget is exhausted — the
  * ingest-time form of "2B tokens of crawl, 500M of curated", where
  * the batch operator is the backfill form over a finished corpus.
  *
  * SEMANTICS (parity with the batch operator): the running cost
  * accumulates over EVERY offered doc, admitted or not, so the kept
  * set is a strict prefix of the offer order — one oversized doc
  * consumes its cost and an overflowing source stays closed even for
  * later small docs. Offer order is md5-rank WITHIN a micro-batch
  * (sorted here, the same rank key the batch operator uses) and
  * arrival order ACROSS batches; a stream fed in global rank order
  * therefore admits exactly the batch operator's kept set
  * (BudgetStreamSpec pins it), while a production stream reads as
  * first-come-first-served per source.
  *
  * STATE: one counter per source ever offered — |sources| longs,
  * NoTimeout by design (a source's spend must never forget, or the
  * budget reopens); bounding state means bounding the source
  * vocabulary, not time.
  */
object BudgetStream {

  /** The rank key the batch operator sorts by: hex md5 of the id's
    * decimal string (bit-identical to Spark's `md5(cast(id))`).
    */
  def rankKey(id: Long): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(id.toString.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString

  /** Pure per-batch fold: docs in offer order against the spent
    * counter. Returns the new counter and the admitted rows.
    * Unit-testable without Spark.
    */
  def foldBudget(spent: Long, ordered: Seq[BudgetDoc],
      budget: Long): (Long, Seq[BudgetAdmit]) = {
    var cum = spent
    val out = Seq.newBuilder[BudgetAdmit]
    ordered.foreach { d =>
      cum += d.cost
      if (cum <= budget)
        out += BudgetAdmit(d.doc_id, d.source, d.cost, cum)
    }
    (cum, out.result())
  }

  /** The gate. `docs` needs `doc_id`, `source`, `cost` columns
    * (stream or batch — the handler is identical).
    */
  def admitWithinBudget(docs: DataFrame, budgets: Map[String, Long],
      defaultBudget: Long = 0L): Dataset[BudgetAdmit] = {
    import docs.sparkSession.implicits._
    docs.selectExpr("doc_id", "source", "cost").as[BudgetDoc]
      .groupByKey(_.source)
      .flatMapGroupsWithState[BudgetSpent, BudgetAdmit](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (source: String, batch: Iterator[BudgetDoc],
            state: GroupState[BudgetSpent]) =>
          val budget = budgets.getOrElse(source, defaultBudget)
          val ordered = batch.toSeq
            .sortBy(d => (rankKey(d.doc_id), d.doc_id))
          val (cum, admitted) = foldBudget(
            state.getOption.map(_.spent).getOrElse(0L), ordered, budget)
          state.update(BudgetSpent(cum))
          admitted.iterator
      }
  }
}
