package graft

import graft.sources.RepoScan
import org.apache.spark.sql.functions._
import java.nio.file.{Files, Paths}

/** S8 tree scan: language attribution, blank-line and brace-line
  * rules, binary sniff — over a synthesized mini-tree plus this
  * repo's own sources.
  */
class RepoScanSpec extends SparkSpec {

  test("counting rules: blanks never count, cs brace-only lines never count") {
    val root = Files.createTempDirectory("graft_tree")
    Files.createDirectories(root.resolve("sub"))
    Files.writeString(root.resolve("A.cs"),
      "class A\n{\n   \nint x = 1;\n}\n")          // 2 countable lines
    Files.writeString(root.resolve("sub/b.py"),
      "def f():\n\n    return {\n")                 // 2 countable ({ counts — py)
    Files.write(root.resolve("blob.bin"),
      Array[Byte](0x50, 0x4b, 0x00, 0x01, 0x0a))   // NUL → sniffed out
    val got = RepoScan.locByLanguage(spark, root.toString)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got("cs") == 2L, got.toString)
    assert(got("py") == 2L, got.toString)
    assert(!got.contains("bin"))
  }

  test("scans this repo's own source tree distributed") {
    val got = RepoScan.locByLanguage(spark, "/root/repo/src")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val scala = got.find(_._1 == "scala").get
    assert(scala._2 > 2000, s"scala loc ${scala._2}")
    assert(scala._3 > 30, s"scala files ${scala._3}")
  }

  test("per-file grain supports the reference's argmax (A4) downstream") {
    val byFile = RepoScan.locByFile(spark, "/root/repo/src")
    val top = byFile.orderBy(desc("loc")).limit(1).head()
    assert(top.getLong(2) > 100)
  }
}
