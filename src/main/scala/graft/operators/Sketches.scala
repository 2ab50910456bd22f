package graft.operators

import graft.QueryDef
import graft.sources.Tables.table
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Fixed-size mergeable frequency sketches — the aggregation shapes
  * that stay O(1) in state however large the corpus grows (the HLL
  * distinct sketch is declared as `q_approx_distinct`; this adds the
  * point-frequency side). The count-min sketch here is 4×1024 counters
  * built by ONE map-side-combinable groupBy: at 100 TB the sketch
  * table is still 4096 rows, merging shards is elementwise addition,
  * and a frequency point-query joins the tiny sketch instead of
  * re-scanning the corpus.
  *
  * Hashes are the engine-portable md5-prefix trick
  * (TextAnalysis.hash32 salted per row of the sketch), so any SQL
  * engine reproduces every counter exactly — the oracle replays the
  * sketch, not just the answers.
  */
object Sketches {

  val Depth = 4
  val Width = 1024

  /** Row-j bucket of a token: 32-bit md5 prefix of "j:token" mod the
    * sketch width. Independent-enough rows via the salt; exactly
    * reproducible anywhere md5 exists.
    */
  def bucket(tok: Column, j: Int): Column =
    pmod(conv(substring(md5(concat(lit(s"$j:"), tok)), 1, 8), 16, 10)
      .cast("long"), lit(Width.toLong))

  private def allBuckets(tok: Column): Column =
    array((0 until Depth).map(j => bucket(tok, j)): _*)

  /** The sketch itself: (j, bucket) → count over a one-column token
    * frame. One shuffle of ≤ Depth×Width rows after map-side partials.
    *
    * Streaming-safe as-is: on an unbounded token stream this plans as
    * a stateful streaming aggregation whose state is capped at
    * Depth×Width rows forever — the frequency tracker that needs no
    * watermark, no eviction, and no scale tuning (SketchesSpec pins
    * micro-batch ≡ batch parity and the state bound).
    */
  def countMin(toks: DataFrame): DataFrame = {
    val t = toks.columns.head
    toks
      .select(posexplode(allBuckets(col(t))).as(Seq("j", "bucket")))
      .groupBy("j", "bucket").agg(count(lit(1)).as("cnt"))
  }

  /** CMS point estimate for each row of `items` (one string column):
    * min over the Depth rows of the sketch — ≥ the true count always,
    * ≈ it when the item dominates its buckets.
    */
  def cmsEstimate(items: DataFrame, cms: DataFrame): DataFrame = {
    val t = items.columns.head
    val others = items.columns.drop(1).map(col)
    items
      .select(col(t) +: others :+
        posexplode(allBuckets(col(t))).as(Seq("j", "bucket")): _*)
      .join(cms, Seq("j", "bucket"))
      .groupBy(col(t) +: others: _*)
      .agg(min("cnt").as("n_cms"))
  }

  /** Mergeable integer-grid histogram quantiles — the fixed-state
    * percentile shape for unbounded data (the quantile counterpart of
    * [[countMin]]): values bucket to `floor(x)` (EXACT in any engine —
    * no transcendental math, no rank nondeterminism), the sketch is a
    * (key, bucket) → count table bounded by the value RANGE rather
    * than the row count, shards merge by adding counters, and
    * `quantile(p)` reads off as the smallest bucket whose cumulative
    * count reaches `ceil(p·n)` — within one grid unit of the exact
    * p-quantile (SketchesSpec pins both properties). An exact
    * percentile sorts every group (`q_percentile`); at 100 TB the
    * histogram is one map-side-combinable groupBy plus a window over
    * the tiny bucket table.
    */
  def gridQuantiles(df: DataFrame, keyCol: String, valCol: String,
      ps: Seq[Double]): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val hist = df
      .groupBy(col(keyCol), floor(col(valCol)).cast("long").as("b"))
      .agg(count(lit(1)).as("cnt"))
    val wCum = Window.partitionBy(keyCol).orderBy("b")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = Window.partitionBy(keyCol)
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val cum = hist
      .withColumn("cum", sum("cnt").over(wCum))
      .withColumn("n", sum("cnt").over(wAll))
    val aggs = ps.map { p =>
      min(when(col("cum") >= ceil(lit(p) * col("n")), col("b")))
        .as(s"p${math.round(p * 100)}")
    }
    cum.groupBy(keyCol).agg(aggs.head, aggs.tail: _*)
  }

  def defs: Map[String, QueryDef] = Map(
    // Histogram-sketch percentiles of lineitem prices per return
    // flag: the oracle rebuilds the floor-grid histogram, both window
    // sums, and the ceil(p·n) read-off — every counter and cut is
    // integer-exact across engines.
    "q_quantile_sketch" -> QueryDef(
      (s, dir) => gridQuantiles(table(s, dir, "lineitem"),
        "l_returnflag", "l_extendedprice", Seq(0.5, 0.95, 0.99))
        .orderBy("l_returnflag"),
      """WITH h AS (
        |  SELECT l_returnflag, CAST(floor(l_extendedprice) AS BIGINT) AS b,
        |    count(*) AS cnt
        |  FROM lineitem GROUP BY 1, 2),
        |c AS (
        |  SELECT *,
        |    sum(cnt) OVER (PARTITION BY l_returnflag ORDER BY b
        |      ROWS UNBOUNDED PRECEDING) AS cum,
        |    sum(cnt) OVER (PARTITION BY l_returnflag) AS n
        |  FROM h)
        |SELECT l_returnflag,
        |  CAST(min(CASE WHEN cum >= ceil(0.5 * n) THEN b END) AS BIGINT) AS p50,
        |  CAST(min(CASE WHEN cum >= ceil(0.95 * n) THEN b END) AS BIGINT) AS p95,
        |  CAST(min(CASE WHEN cum >= ceil(0.99 * n) THEN b END) AS BIGINT) AS p99
        |FROM c GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin),

    // Exact top-20 tokens with their count-min estimates side by
    // side. The oracle rebuilds all 4096 counters and the min-probe,
    // so a drifted hash, width, or a lost counter anywhere
    // hash-mismatches; the ≥-exact sketch invariant is additionally
    // asserted in SketchesSpec.
    // Sketch-based join-size estimation (the classic CMS/AMS inner
    // product): |A ⋈ B| = Σ_k cA(k)·cB(k), and the per-row bucket
    // inner product Σ_b cmsA(j,b)·cmsB(j,b) overestimates it by
    // exactly the collision mass — min over the Depth rows is the
    // estimate. This is the join the OPTIMIZER runs before the real
    // join at 100 TB: two map-side-combinable groupBys into 4×1024
    // counters each, one 4096-row sketch join — the actual join's
    // cost is never paid to predict it. The oracle rebuilds both
    // sketches counter-for-counter and replays the inner products,
    // the min, the exact Σ cA·cB, and the relative error.
    "q_join_estimate" -> QueryDef(
      (s, dir) => {
        import graft.functions.Functions.spreadScan
        val ek = spreadScan(table(s, dir, "events"))
          .select(col("user_id").cast("string").as("k"))
        val ok = spreadScan(table(s, dir, "orders"))
          .select(col("o_custkey").cast("string").as("k"))
        val ip = countMin(ek).toDF("j", "bucket", "ca")
          .join(countMin(ok).toDF("j", "bucket", "cb"), Seq("j", "bucket"))
          .groupBy("j").agg(sum(col("ca") * col("cb")).as("ip"))
          .agg(min("ip").as("est"))
        val exact = ek.groupBy("k").agg(count(lit(1)).as("ca"))
          .join(ok.groupBy("k").agg(count(lit(1)).as("cb")), "k")
          .agg(coalesce(sum(col("ca") * col("cb")), lit(0L)).as("n_exact"))
        ip.crossJoin(exact) // two 1-row frames
          .select(col("est"), col("n_exact"),
            round((col("est") - col("n_exact")) * lit(1.0) / col("n_exact"), 4)
              .as("rel_err"))
      },
      s"""WITH ek AS (SELECT CAST(user_id AS VARCHAR) AS k FROM events),
        |ok AS (SELECT CAST(o_custkey AS VARCHAR) AS k FROM orders),
        |js AS (SELECT unnest(range(0, $Depth)) AS j),
        |ca AS (
        |  SELECT j, CAST(CAST(('0x' || substr(md5(CAST(j AS VARCHAR) || ':' || k), 1, 8))
        |      AS UINT32) AS BIGINT) % $Width AS bucket, count(*) AS cnt
        |  FROM ek CROSS JOIN js GROUP BY 1, 2),
        |cb AS (
        |  SELECT j, CAST(CAST(('0x' || substr(md5(CAST(j AS VARCHAR) || ':' || k), 1, 8))
        |      AS UINT32) AS BIGINT) % $Width AS bucket, count(*) AS cnt
        |  FROM ok CROSS JOIN js GROUP BY 1, 2),
        |ip AS (
        |  SELECT ca.j, CAST(sum(ca.cnt * cb.cnt) AS BIGINT) AS ip
        |  FROM ca JOIN cb ON ca.j = cb.j AND ca.bucket = cb.bucket
        |  GROUP BY 1),
        |est AS (SELECT CAST(min(ip) AS BIGINT) AS est FROM ip),
        |ex AS (
        |  SELECT CAST(coalesce(sum(a.ca * b.cb), 0) AS BIGINT) AS n_exact
        |  FROM (SELECT k, count(*) AS ca FROM ek GROUP BY 1) a
        |  JOIN (SELECT k, count(*) AS cb FROM ok GROUP BY 1) b USING (k))
        |SELECT est, n_exact,
        |  round((est - n_exact) * 1.0 / n_exact, 4) AS rel_err
        |FROM est, ex""".stripMargin),

    "q_heavy_hitters" -> QueryDef(
      (s, dir) => {
        val toks = graft.functions.Functions.explodeOnce(
          table(s, dir, "documents"), Seq.empty,
          TextAnalysis.tokens(col("text")), "t")
        val exact = toks.groupBy("t").agg(count(lit(1)).as("n_exact"))
          .orderBy(col("n_exact").desc, col("t")).limit(20)
        cmsEstimate(exact, countMin(toks))
          .select(col("t").as("token"), col("n_exact"), col("n_cms"))
          .orderBy(col("n_exact").desc, col("token"))
      },
      s"""WITH toks AS (
        |  SELECT unnest(regexp_split_to_array(trim(text), '\\s+')) AS t
        |  FROM documents),
        |js AS (SELECT unnest(range(0, $Depth)) AS j),
        |cms AS (
        |  SELECT j, CAST(CAST(('0x' || substr(md5(CAST(j AS VARCHAR) || ':' || t), 1, 8))
        |      AS UINT32) AS BIGINT) % $Width AS bucket,
        |    count(*) AS cnt
        |  FROM toks CROSS JOIN js
        |  GROUP BY 1, 2),
        |exact AS (
        |  SELECT t, count(*) AS n_exact FROM toks GROUP BY t
        |  ORDER BY n_exact DESC, t LIMIT 20)
        |SELECT e.t AS token, CAST(e.n_exact AS BIGINT) AS n_exact,
        |  CAST(min(c.cnt) AS BIGINT) AS n_cms
        |FROM exact e CROSS JOIN js
        |JOIN cms c ON c.j = js.j AND c.bucket =
        |  CAST(CAST(('0x' || substr(md5(CAST(js.j AS VARCHAR) || ':' || e.t), 1, 8))
        |    AS UINT32) AS BIGINT) % $Width
        |GROUP BY e.t, e.n_exact
        |ORDER BY n_exact DESC, token""".stripMargin))
}
