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

  test("events.ts surfaces as a usable timestamp (whatever the file encoding)") {
    val e = Tables.table(spark, sfDir, "events")
    assert(e.schema("ts").dataType.typeName == "timestamp")
    assert(e.filter(year(col("ts")) > 2000).count() > 0)
  }

  // The harness regenerated events.parquet between rounds, flipping ts
  // from INT64 TIMESTAMP(NANOS) to native timestamp[us] and killing 19
  // queries at analysis. This fixture pins both encodings so the next
  // format drift fails HERE, in a unit test, not in a driver round.
  test("dual-encoding events fixture: nanos-long and timestamp[us] normalize identically") {
    import org.apache.spark.sql.types.{TimestampNTZType, TimestampType}
    val root = Files.createTempDirectory("graft_events_enc")
    val nanosDir = root.resolve("nanos").toString
    val ntzDir = root.resolve("ntz").toString
    // micros-aligned instants so the nanos path's div-1000 truncation is lossless
    val rows = Seq((1L, 1700000000123456000L), (2L, 1700003600987654000L))
    rows.toDF("event_id", "ts").write.parquet(nanosDir)
    rows.toDF("event_id", "ts_ns")
      .withColumn("ts", timestamp_micros(expr("ts_ns div 1000")).cast(TimestampNTZType))
      .select("event_id", "ts")
      .write.parquet(ntzDir)
    def load(d: String) = Tables.normalizeEventsTs(spark.read.parquet(d))
      .select("event_id", "ts").orderBy("event_id")
    val a = load(nanosDir)
    val b = load(ntzDir)
    assert(a.schema("ts").dataType == TimestampType)
    assert(b.schema("ts").dataType == TimestampType)
    // read-back sanity: the NTZ file really carries the new encoding
    assert(spark.read.parquet(ntzDir).schema("ts").dataType == TimestampNTZType)
    assert(a.collect().toSeq == b.collect().toSeq)
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
