package graft

import graft.sources.{Sinks, Tables}
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** Sink layer (SURVEY.md §2.2): CSV overwrite/append/BOM variants,
  * JSON write, and the K6 unmapped-key writeback protocol.
  */
class SinksSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(name: String): String =
    Files.createTempDirectory("graft_sink").resolve(name).toString

  test("csvOverwrite with quoteAll quotes every field") {
    val dir = tmp("quoted")
    Sinks.csvOverwrite(Seq((1, "plain")).toDF("id", "s"), dir, quoteAll = true)
    val line = Files.list(java.nio.file.Paths.get(dir)).toArray
      .map(_.toString).filter(_.endsWith(".csv"))
      .flatMap(p => scala.io.Source.fromFile(p).getLines().toList)
      .find(_.contains("plain")).get
    assert(line == "\"1\",\"plain\"")
  }

  test("csvOverwriteWithBom prepends the utf-8-sig marker") {
    val dir = tmp("bom")
    Sinks.csvOverwriteWithBom(Seq((1, "x")).toDF("id", "s"), dir)
    val bytes = Files.list(java.nio.file.Paths.get(dir)).toArray
      .map(_.toString).filter(_.endsWith(".csv"))
      .map(p => Files.readAllBytes(java.nio.file.Paths.get(p))).head
    assert(bytes.take(3).toSeq == Seq(0xEF.toByte, 0xBB.toByte, 0xBF.toByte))
    // and the reader strips it back out via stripBom semantics
    val hdr = new String(bytes, "UTF-8").linesIterator.next()
    assert(hdr.replace("﻿", "") == "id,s")
  }

  test("csvAppend accumulates rows across writes") {
    val dir = tmp("append")
    Sinks.csvAppend(Seq((1, "a")).toDF("id", "s"), dir)
    Sinks.csvAppend(Seq((2, "b")).toDF("id", "s"), dir)
    assert(Tables.csv(spark, dir).count() == 2)
  }

  test("jsonWrite roundtrips") {
    val dir = tmp("json")
    Sinks.jsonWrite(Seq((1L, "Привет")).toDF("id", "s"), dir)
    val back = spark.read.json(dir)
    assert(back.head().getAs[String]("s") == "Привет")
  }

  test("unmappedKeys + writebackUnmapped: anti-join survivors reach the callback once") {
    val facts = Seq("p1", "p2", "p3", "p2").toDF("plugin_name")
    val mapping = Seq("p1").toDF("known_name")
    val unmapped = Sinks.unmappedKeys(facts, mapping, "plugin_name", "known_name")
    var seen = Vector.empty[String]
    val n = Sinks.writebackUnmapped(unmapped,
      rows => seen = rows.map(_.getString(0)).toVector)
    assert(n == 2)
    assert(seen.sorted == Vector("p2", "p3"))
  }
}
