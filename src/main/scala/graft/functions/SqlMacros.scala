package graft.functions

import org.apache.spark.sql.SparkSession
import java.time.{LocalDate, LocalDateTime}

/** SQL-callable surface of the scalar kit: Spark 4 SQL scalar
  * functions (`CREATE TEMPORARY FUNCTION ... RETURN expr`) for the
  * pure-expression operators — they inline into the calling plan and
  * stay inside codegen — plus one registered Scala UDF for the
  * business-day duration (the single operator with calendar state).
  * `install` once per session; everything is then usable from
  * `spark.sql(...)` exactly like the DataFrame combinators.
  */
object SqlMacros {

  def install(spark: SparkSession): Unit = {
    val stmts = Seq(
      // F3 extract_short_name
      """CREATE OR REPLACE TEMPORARY FUNCTION graft_short_name(s STRING)
        |RETURNS STRING
        |RETURN CASE WHEN size(split(s, '_')) >= 2
        |  THEN concat_ws('_', slice(split(s, '_'), 1, 2)) ELSE s END""",
      // F4 extract_file_storage_name
      """CREATE OR REPLACE TEMPORARY FUNCTION graft_storage_name(p STRING, u STRING)
        |RETURNS STRING
        |RETURN CASE WHEN size(split(p, '_')) >= 2
        |    AND lower(trim(element_at(split(p, '_'), -1))) = lower(trim(u))
        |  THEN concat_ws('_', slice(split(p, '_'), 1, size(split(p, '_')) - 1))
        |  ELSE p END""",
      // F1 BOM strip
      """CREATE OR REPLACE TEMPORARY FUNCTION graft_strip_bom(s STRING)
        |RETURNS STRING RETURN regexp_replace(s, '﻿', '')""",
      // exact-dup fingerprint (normalize + md5)
      """CREATE OR REPLACE TEMPORARY FUNCTION graft_fingerprint(s STRING)
        |RETURNS STRING
        |RETURN md5(regexp_replace(lower(trim(s)), '\\s+', ' '))""",
      // BPE-ish token estimate
      """CREATE OR REPLACE TEMPORARY FUNCTION graft_token_estimate(s STRING)
        |RETURNS BIGINT
        |RETURN aggregate(split(trim(s), '\\s+'), 0L,
        |  (acc, t) -> acc + greatest(CAST(ceil(length(t) / 6.0) AS BIGINT), 1L))""",
      // null-safe case-insensitive contains (pandas str.contains na=False)
      """CREATE OR REPLACE TEMPORARY FUNCTION graft_contains_ci(s STRING, pat STRING)
        |RETURNS BOOLEAN
        |RETURN coalesce(s RLIKE concat('(?iu)', pat), false)""",
      // engine-portable 32-bit hash (md5 hex prefix) — the dedup
      // family's base hash, exposed so SQL users shard/sample/dedup
      // with the exact same key space as the operators
      """CREATE OR REPLACE TEMPORARY FUNCTION graft_hash32(s STRING)
        |RETURNS BIGINT
        |RETURN CAST(conv(substring(md5(s), 1, 8), 16, 10) AS BIGINT)""",
      // exact Jaccard of two (distinct-element) arrays
      """CREATE OR REPLACE TEMPORARY FUNCTION graft_jaccard(
        |    a ARRAY<STRING>, b ARRAY<STRING>)
        |RETURNS DOUBLE
        |RETURN CASE WHEN size(array_union(a, b)) > 0
        |  THEN CAST(size(array_intersect(a, b)) AS DOUBLE) / size(array_union(a, b))
        |  ELSE 0.0 END""",
      // cosine over float embeddings, riding the codegen'd native dot
      """CREATE OR REPLACE TEMPORARY FUNCTION graft_cosine(
        |    a ARRAY<FLOAT>, b ARRAY<FLOAT>)
        |RETURNS DOUBLE
        |RETURN graft_fdot(a, b) / (sqrt(graft_fdot(a, a)) * sqrt(graft_fdot(b, b)))""")
    // native expressions first: graft_cosine's macro body references
    // graft_fdot, which must resolve when the CREATE FUNCTION runs
    graft.GraftExtensions.functions.foreach { case (id, _, builder) =>
      org.apache.spark.sql.GraftColumnBridge
        .registerFunction(spark, id.funcName, builder)
    }

    stmts.foreach(s => spark.sql(s.stripMargin))

    spark.udf.register("graft_workdays_diff",
      (start: LocalDateTime, end: LocalDateTime) =>
        Workdays.workdaysDiffScala(start, end, defaultHolidaySet))
  }

  private lazy val defaultHolidaySet: Set[LocalDate] =
    Workdays.ruHolidays(1995, 2030).map(LocalDate.parse).toSet
}
