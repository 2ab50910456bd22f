package graft

import graft.functions.{SqlMacros, Workdays}
import org.apache.spark.sql.functions._

/** SQL-callable kit: macros agree with the Column combinators, and the
  * registered workdays UDF agrees with the closed-form column math
  * over a dense grid of timestamp pairs (incl. holidays, weekends,
  * clipped edges).
  */
class SqlMacrosSpec extends SparkSpec {

  SqlMacros.install(spark)

  test("SQL macros match the Column kit") {
    val row = spark.sql(
      """SELECT
        |  graft_short_name('a_b_c') AS sn,
        |  graft_storage_name('proj_x_IVAN', 'ivan ') AS stn,
        |  graft_strip_bom('﻿x') AS bom,
        |  graft_fingerprint('A   b') = graft_fingerprint('a b') AS fp_eq,
        |  graft_token_estimate('hi abcdefghijkl') AS te,
        |  graft_contains_ci(NULL, 'x') AS ci_null,
        |  graft_contains_ci('ОТСОЕДИНЕНО', 'отсоединено') AS ci_ru
        |""".stripMargin).head()
    assert(row.getString(0) == "a_b")
    assert(row.getString(1) == "proj_x")
    assert(row.getString(2) == "x")
    assert(row.getBoolean(3))
    assert(row.getLong(4) == 3L)
    assert(!row.getBoolean(5))
    assert(row.getBoolean(6))
  }

  test("native fdot expression is SQL-callable after install") {
    val row = spark.sql(
      "SELECT graft_fdot(array(1.0F, 2.0F), array(3.0F, 4.0F)) AS d").head()
    assert(row.getDouble(0) == 11.0)
  }

  test("workdays UDF matches the column closed form over a timestamp grid") {
    import spark.implicits._
    // pairs spanning new-year holidays, weekends, clipped hours
    val starts = for {
      day <- 25 to 31; hour <- Seq(6, 9, 16)
    } yield f"2023-12-$day%02d $hour%02d:30:00"
    val ends = for {
      day <- 1 to 12; hour <- Seq(7, 12, 18)
    } yield f"2024-01-$day%02d $hour%02d:00:00"
    val pairs = starts.flatMap(s => ends.map(e => (s, e))).toDF("s", "e")
      .select(to_timestamp(col("s")).as("s"), to_timestamp(col("e")).as("e"))
    val both = pairs.select(
      Workdays.workdaysDiff(col("s"), col("e"),
        Workdays.ruHolidayColumn(2023, 2024)).as("col_math"),
      expr("graft_workdays_diff(s, e)").as("udf"))
    val mismatches = both.filter(col("col_math") =!= col("udf")).count()
    assert(mismatches == 0, s"$mismatches of ${both.count()} pairs disagree")
  }

  test("hash32 / jaccard / cosine macros match their operator twins") {
    import spark.implicits._
    val r = spark.sql("""SELECT
      graft_hash32('alpha beta') AS h,
      graft_jaccard(array('a','b','c'), array('b','c','d')) AS j,
      graft_jaccard(array(), array()) AS j0,
      graft_cosine(array(CAST(1.0 AS FLOAT), CAST(0.0 AS FLOAT)),
                   array(CAST(1.0 AS FLOAT), CAST(1.0 AS FLOAT))) AS c
    """).head()
    // same value as the operators' hash32 column
    val viaCol = Seq("alpha beta").toDF("s")
      .select(graft.operators.TextAnalysis.hash32(org.apache.spark.sql.functions.col("s")))
      .head().getLong(0)
    assert(r.getLong(0) == viaCol)
    assert(math.abs(r.getDouble(1) - 0.5) < 1e-12)
    assert(r.getDouble(2) == 0.0)
    assert(math.abs(r.getDouble(3) - 1.0 / math.sqrt(2)) < 1e-12)
  }
}
