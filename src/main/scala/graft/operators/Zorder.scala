package graft.operators

import graft.QueryDef
import graft.sources.Tables.table
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Z-order (Morton-curve) data layout: interleave the bits of two
  * column buckets into one sort key so that range predicates on
  * EITHER dimension prune most blocks — the multi-dimensional
  * clustering a lakehouse runs before writing large fact tables
  * (Delta/Iceberg OPTIMIZE ZORDER). A single-column sort gives
  * perfect min/max pruning on that column and none on any other; the
  * Z-curve gives ~√ pruning on both.
  *
  * The declared query computes the layout ASSIGNMENT and its pruning
  * evidence: each row's 16-bit z-value from 8+8-bit buckets of
  * (l_partkey, l_suppkey), grouped into 256 z-contiguous blocks, with
  * each block's min/max bucket per dimension — the exact metadata a
  * scan planner consults. Under z-order both spans come out ≈ 16 of
  * 256 (each block covers a 16×16 tile of the grid); under a
  * part-only sort the supplier span would be the full range. The
  * write path at scale is `repartitionByRange(z)` + sortWithinPartitions
  * over exactly this key; the stats here are what make that write
  * worth it, so they are what the oracle checks.
  *
  * All arithmetic is integer (bucket scaling by integer div against
  * the broadcast maxima, bit interleave by shift/mask) — the result
  * is bit-exact on any engine with 64-bit integers.
  */
object Zorder {

  /** Bit-interleave SQL for two 8-bit buckets `pb`/`sb` (pb in odd
    * positions): shared arithmetic emitted for both engines.
    */
  private def zBitsSql(shl: (String, Int) => String,
      shr: (String, Int) => String): String =
    (0 until 8).map { b =>
      s"${shl(s"(${shr("pb", b)} & 1)", 2 * b + 1)} + " +
        s"${shl(s"(${shr("sb", b)} & 1)", 2 * b)}"
    }.mkString(" + ")

  /** Per-block layout stats for a z-ordered (pk, sk) fact frame:
    * (block, n rows, min/max part bucket, min/max supplier bucket).
    */
  def zorderBlocks(fact: DataFrame): DataFrame = {
    val li = fact
      .select(col("pk").cast("long").as("pk"), col("sk").cast("long").as("sk"))
    val mx = broadcast(li.agg(max("pk").as("pmax"), max("sk").as("smax")))
    val z = zBitsSql(
      (e, n) => s"shiftleft($e, $n)", (e, n) => s"shiftright($e, $n)")
    li.crossJoin(mx)
      .selectExpr("(pk * 256) div (pmax + 1) as pb",
        "(sk * 256) div (smax + 1) as sb")
      .selectExpr("pb", "sb", s"($z) as z")
      .groupBy((col("z") / 256).cast("long").as("block"))
      .agg(count(lit(1)).as("n"),
        min("pb").as("pmin"), max("pb").as("pmax_b"),
        min("sb").as("smin"), max("sb").as("smax_b"))
      .orderBy("block")
  }

  def defs: Map[String, QueryDef] = Map(
    // 256-block Z-order layout stats over lineitem. The oracle
    // replays bucket scaling, all 16 interleaved bit terms, the
    // block grouping, and every min/max — one transposed bit
    // position would shear the curve and hash-mismatch.
    "q_zorder_layout" -> QueryDef(
      (s, dir) => zorderBlocks(table(s, dir, "lineitem")
        .select(col("l_partkey").as("pk"), col("l_suppkey").as("sk"))),
      {
        val z = zBitsSql((e, n) => s"($e << $n)", (e, n) => s"($e >> $n)")
        s"""WITH mx AS (
           |  SELECT max(l_partkey) AS pmax, max(l_suppkey) AS smax
           |  FROM lineitem),
           |b AS (
           |  SELECT (l_partkey * 256) // (pmax + 1) AS pb,
           |    (l_suppkey * 256) // (smax + 1) AS sb
           |  FROM lineitem, mx),
           |zv AS (SELECT pb, sb, ($z) AS z FROM b)
           |SELECT CAST(z // 256 AS BIGINT) AS block, count(*) AS n,
           |  min(pb) AS pmin, max(pb) AS pmax_b,
           |  min(sb) AS smin, max(sb) AS smax_b
           |FROM zv GROUP BY 1 ORDER BY block""".stripMargin
      }))
}
