package graft.operators

import graft.QueryDef
import graft.sources.Tables.table
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Ordered-funnel analysis over an event stream: how many users reach
  * each stage of `stages` IN ORDER — stage k counts only events
  * strictly after the user's earliest completion of stage k−1 (an
  * out-of-order click before the first view does not convert, matching
  * the standard product-analytics definition).
  *
  * Scale shape: one pass over the events per stage, each pruned to its
  * stage type at the scan (pushed filter), joined and aggregated on
  * the user key — k user-keyed shuffles for a k-stage funnel, no
  * windows over unbounded partitions, no per-user event arrays
  * materialized (a collect_list + fold formulation would carry every
  * user's full history through one shuffle; this shape carries one
  * timestamp per user per stage).
  */
object Funnel {

  /** Earliest in-order completion time per user per stage:
    * (id, __t, __t0) frames, one per funnel prefix, aggregated by
    * [[funnelCounts]]. `maxSpanMicros` bounds the whole conversion:
    * stage k counts only events within that span of the user's
    * FIRST-stage completion (the standard "converted within N hours"
    * definition); 0 means unbounded.
    */
  def stageTimes(events: DataFrame, idCol: String, tsCol: String,
      typeCol: String, stages: Seq[String],
      maxSpanMicros: Long = 0L): Seq[DataFrame] = {
    require(stages.nonEmpty, "funnel needs at least one stage")
    stages.zipWithIndex.foldLeft(Seq.empty[DataFrame]) {
      case (acc, (stage, k)) =>
        val evts = events.filter(col(typeCol) === stage)
          .select(col(idCol), unix_micros(col(tsCol)).as("__ets"))
        val reached =
          if (k == 0)
            evts.groupBy(col(idCol))
              .agg(min("__ets").as("__t"))
              .withColumn("__t0", col("__t"))
          else {
            val within =
              if (maxSpanMicros > 0)
                col("__ets") <= col("__t0") + maxSpanMicros
              else lit(true)
            evts
              .join(acc.last.select(col(idCol), col("__t"), col("__t0")),
                Seq(idCol))
              .filter(col("__ets") > col("__t") && within)
              .groupBy(col(idCol))
              // __t0 is constant per id (one row per id in the prior
              // frame) — min() just carries it through the aggregate
              .agg(min("__ets").as("__t"), min("__t0").as("__t0"))
          }
        // non-final stage frames persist (one short row per reached
        // user): stage k's plan contains every prior stage's subtree,
        // and the caller unions ALL prefixes — without the persist,
        // stage 0's events scan re-ran once per downstream consumer
        // (6 scans for a 3-stage funnel; round-8 plan review). With
        // it, each stage reads the events table exactly once, filter
        // pushed. The LAST frame has exactly one consumer, so caching
        // it would be a pure materialization barrier.
        acc :+ (if (k < stages.length - 1)
          graft.InternalCaches.track(reached.persist(
            org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
        else reached)
    }
  }

  /** (stage_idx, stage, n_users) — the funnel conversion table. */
  def funnelCounts(events: DataFrame, idCol: String, tsCol: String,
      typeCol: String, stages: Seq[String],
      maxSpanMicros: Long = 0L): DataFrame =
    stageTimes(events, idCol, tsCol, typeCol, stages, maxSpanMicros)
      .zipWithIndex
      .map { case (reached, k) =>
        reached.agg(count(lit(1)).as("n_users"))
          .select(lit(k).as("stage_idx"), lit(stages(k)).as("stage"),
            col("n_users"))
      }
      .reduce(_.unionByName(_))

  def defs: Map[String, QueryDef] = Map(

    // view → click → purchase over the events table; the oracle
    // rebuilds the strictly-after chaining stage by stage.
    "q_funnel" -> QueryDef(
      (s, dir) => funnelCounts(table(s, dir, "events"),
        "user_id", "ts", "event_type", Seq("view", "click", "purchase"))
        .orderBy("stage_idx"),
      """WITH s0 AS (
        |  SELECT user_id, min(ts) AS t FROM events
        |  WHERE event_type = 'view' GROUP BY 1),
        |s1 AS (
        |  SELECT e.user_id, min(e.ts) AS t FROM events e
        |  JOIN s0 ON e.user_id = s0.user_id AND e.ts > s0.t
        |  WHERE e.event_type = 'click' GROUP BY 1),
        |s2 AS (
        |  SELECT e.user_id, min(e.ts) AS t FROM events e
        |  JOIN s1 ON e.user_id = s1.user_id AND e.ts > s1.t
        |  WHERE e.event_type = 'purchase' GROUP BY 1)
        |SELECT 0 AS stage_idx, 'view' AS stage,
        |  CAST((SELECT count(*) FROM s0) AS BIGINT) AS n_users
        |UNION ALL SELECT 1, 'click', CAST((SELECT count(*) FROM s1) AS BIGINT)
        |UNION ALL SELECT 2, 'purchase', CAST((SELECT count(*) FROM s2) AS BIGINT)
        |ORDER BY stage_idx""".stripMargin),

    // The same funnel bounded to a 2-hour conversion window from the
    // user's first view — "converted within N hours", the form real
    // product funnels use. Micros arithmetic on both sides.
    "q_funnel_windowed" -> QueryDef(
      (s, dir) => funnelCounts(table(s, dir, "events"),
        "user_id", "ts", "event_type", Seq("view", "click", "purchase"),
        maxSpanMicros = 2L * 3600 * 1000000)
        .orderBy("stage_idx"),
      """WITH s0 AS (
        |  SELECT user_id, min(epoch_us(ts)) AS t, min(epoch_us(ts)) AS t0
        |  FROM events WHERE event_type = 'view' GROUP BY 1),
        |s1 AS (
        |  SELECT e.user_id, min(epoch_us(e.ts)) AS t, min(s0.t0) AS t0
        |  FROM events e JOIN s0 ON e.user_id = s0.user_id
        |    AND epoch_us(e.ts) > s0.t
        |    AND epoch_us(e.ts) <= s0.t0 + 7200000000
        |  WHERE e.event_type = 'click' GROUP BY 1),
        |s2 AS (
        |  SELECT e.user_id, min(epoch_us(e.ts)) AS t
        |  FROM events e JOIN s1 ON e.user_id = s1.user_id
        |    AND epoch_us(e.ts) > s1.t
        |    AND epoch_us(e.ts) <= s1.t0 + 7200000000
        |  WHERE e.event_type = 'purchase' GROUP BY 1)
        |SELECT 0 AS stage_idx, 'view' AS stage,
        |  CAST((SELECT count(*) FROM s0) AS BIGINT) AS n_users
        |UNION ALL SELECT 1, 'click', CAST((SELECT count(*) FROM s1) AS BIGINT)
        |UNION ALL SELECT 2, 'purchase', CAST((SELECT count(*) FROM s2) AS BIGINT)
        |ORDER BY stage_idx""".stripMargin),

    // Cohort retention: users grouped by the week of their first
    // event, counted distinct per whole-weeks-since-cohort offset.
    // Two user-keyed shuffles (first-event, then the distinct count) —
    // the cohort frame is one row per user, broadcast-sized relative
    // to events at any scale. Offsets are day-arithmetic
    // (floor(days/7) from the user's own first day), so no engine's
    // week-boundary convention is load-bearing; the cohort LABEL uses
    // Monday-start date_trunc, which Spark and DuckDB share.
    "q_cohort_retention" -> QueryDef(
      (s, dir) => {
        val e = table(s, dir, "events")
          .select(col("user_id"), to_date(col("ts")).as("d"))
        val first = e.groupBy("user_id").agg(min("d").as("cohort_d"))
        e.join(first, "user_id")
          .groupBy(
            date_format(date_trunc("week", col("cohort_d")), "yyyy-MM-dd")
              .as("cohort_week"),
            floor(datediff(col("d"), col("cohort_d")) / 7).cast("int")
              .as("week_offset"))
          .agg(countDistinct(col("user_id")).as("n_active"))
          .orderBy("cohort_week", "week_offset")
      },
      """WITH e AS (
        |  SELECT user_id, CAST(ts AS DATE) AS d FROM events),
        |f AS (SELECT user_id, min(d) AS cohort_d FROM e GROUP BY 1)
        |SELECT strftime(date_trunc('week', cohort_d), '%Y-%m-%d')
        |    AS cohort_week,
        |  CAST(floor((d - cohort_d) / 7) AS INT) AS week_offset,
        |  CAST(count(DISTINCT user_id) AS BIGINT) AS n_active
        |FROM e JOIN f USING (user_id)
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin)
  )
}
