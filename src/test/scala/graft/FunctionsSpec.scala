package graft

import graft.functions.Functions._
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Scalar-function kit (SURVEY.md §2.6) against the reference's
  * documented edge cases.
  */
class FunctionsSpec extends SparkSpec {
  import spark.implicits._

  private def one(c: org.apache.spark.sql.Column): Row =
    spark.range(1).select(c.as("v")).head()

  test("shortName keeps first two parts, identity when fewer") {
    val df = Seq("a_b_c_d", "a_b", "single", "").toDF("s")
      .select(shortName(col("s")).as("v"))
    assert(df.collect().map(_.getString(0)).toSeq == Seq("a_b", "a_b", "single", ""))
  }

  test("fileStorageName strips last part only when it equals username (ci, trimmed)") {
    val df = Seq(
      ("proj_alpha_IVAN", "ivan"),     // stripped
      ("proj_alpha_ivan ", " IVAN"),   // stripped after trim
      ("proj_alpha_petr", "ivan"),     // untouched
      ("ivan", "ivan")                 // single part — untouched
    ).toDF("p", "u").select(fileStorageName(col("p"), col("u")).as("v"))
    assert(df.collect().map(_.getString(0)).toSeq ==
      Seq("proj_alpha", "proj_alpha", "proj_alpha_petr", "ivan"))
  }

  test("whenChain is first-match-wins in declared order") {
    val c = whenChain(
      Seq(lit(true) -> lit("first"), lit(true) -> lit("second")),
      lit("default"))
    assert(one(c).getString(0) == "first")
    val d = whenChain(Seq(lit(false) -> lit("first")), lit("default"))
    assert(one(d).getString(0) == "default")
  }

  test("containsCi is case-insensitive (incl. Cyrillic) and null-safe") {
    val df = Seq(Some("отсоединено от центра"), Some("ОТСОЕДИНЕНО"),
      Some("other"), None)
      .toDF("s").select(containsCi(col("s"), "отсоединено").as("v"))
    assert(df.collect().map(_.getBoolean(0)).toSeq ==
      Seq(true, true, false, false))
  }

  test("fromEpochMs coerces garbage to null like to_iso") {
    val df = Seq("1700000000000", "garbage").toDF("s")
      .select(fromEpochMs(col("s")).as("v"))
    val rows = df.collect()
    assert(rows(0).getTimestamp(0).toInstant.toEpochMilli == 1700000000000L)
    assert(rows(1).isNullAt(0))
  }

  test("fillByType: strings, numerics, booleans filled; non-nulls untouched") {
    val schema = StructType(Seq(
      StructField("s", StringType), StructField("n", LongType),
      StructField("d", DoubleType), StructField("b", BooleanType)))
    val df = spark.createDataFrame(
      java.util.List.of(
        Row("keep", 7L, 1.5, true),
        Row(null, null, null, null)),
      schema)
    val filled = fillByType(df).collect()
    assert(filled(0) == Row("keep", 7L, 1.5, true))
    assert(filled(1) == Row("Нет данных", 0L, 0.0, false))
  }

  test("dropAllNullColumns drops only fully-null columns") {
    val df = Seq((1, Option.empty[String], Option("x")),
      (2, Option.empty[String], Option.empty[String]))
      .toDF("id", "all_null", "some_null")
    assert(dropAllNullColumns(df).columns.toSeq == Seq("id", "some_null"))
  }

  test("dropColumnsWhere drops by name predicate") {
    val df = Seq((1, "a", "b")).toDF("id", "raw_x", "raw_y")
    assert(dropColumnsWhere(df, _.startsWith("raw")).columns.toSeq == Seq("id"))
  }

  test("mapLookup falls back to default") {
    val m = typedlit(Map("a" -> "A"))
    val df = Seq("a", "z").toDF("k")
      .select(mapLookup(m, col("k"), col("k")).as("v"))
    assert(df.collect().map(_.getString(0)).toSeq == Seq("A", "z"))
  }

  test("string kit: stripBom, flattenNewlines, stripPrefix, firstToken, sheetIdFormat") {
    assert(one(stripBom(lit("﻿name"))).getString(0) == "name")
    assert(one(flattenNewlines(lit("a\r\nb"))).getString(0) == "a  b")
    assert(one(stripPrefix(lit("plugins/revit/tool"), "plugins/revit/")).getString(0) == "tool")
    assert(one(firstToken(lit("first second third"))).getString(0) == "first")
    assert(one(sheetIdFormat(lit("123"))).getString(0) == "123.0")
  }
}
