package graft

import graft.sources.Tables
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** Source/sink layer: harness-table loads, CSV/JSON roundtrips with the
  * reference's option sets (header, BOM, multiline, nested flatten).
  */
class TablesSpec extends SparkSpec {
  import spark.implicits._

  test("all harness tables load with rows at sf0.001") {
    Tables.harnessTables.foreach { t =>
      assert(Tables.table(spark, sfDir, t).count() > 0, t)
    }
  }

  test("events.ts surfaces as a usable timestamp (nanos parquet)") {
    val e = Tables.table(spark, sfDir, "events")
    assert(e.schema("ts").dataType.typeName == "timestamp")
    assert(e.filter(year(col("ts")) > 2000).count() > 0)
  }

  test("CSV roundtrip: header, quotes, Cyrillic survive") {
    val dir = Files.createTempDirectory("graft_csv").resolve("out").toString
    val df = Seq((1L, "Нет данных", "with,comma"), (2L, "plain", "line\nbreak"))
      .toDF("id", "ru", "tricky")
    df.write.mode("overwrite").option("header", "true")
      .option("quoteAll", "true").option("escape", "\"").csv(dir)
    val back = Tables.csv(spark, dir).orderBy("id")
    assert(back.collect().map(r => (r.getInt(0), r.getString(1), r.getString(2))).toSeq ==
      Seq((1, "Нет данных", "with,comma"), (2, "plain", "line\nbreak")))
  }

  test("JSON roundtrip with nested struct flatten (json_normalize shape)") {
    val dir = Files.createTempDirectory("graft_json").resolve("out").toString
    val df = Seq((1L, ("scala", 100L)), (2L, ("python", 50L)))
      .toDF("id", "loc_by_language")
    df.write.mode("overwrite").json(dir)
    val back = spark.read.json(dir)
      .select(col("id"), col("loc_by_language.*"))
      .orderBy("id")
    assert(back.columns.toSeq == Seq("id", "_1", "_2"))
    assert(back.count() == 2)
  }
}
