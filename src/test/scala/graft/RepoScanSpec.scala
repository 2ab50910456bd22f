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

  test("multi-branch fixture: eligible set is default ∪ master ∪ *dev*, " +
      "argmax picks the fattest branch per project") {
    import spark.implicits._
    val root = Files.createTempDirectory("graft_branches")
    def write(rel: String, text: String): Unit = {
      val p = root.resolve(rel)
      Files.createDirectories(p.getParent)
      Files.writeString(p, text)
    }
    // projA: default=main (3 loc), dev-feature (10 loc), release (100
    // loc but NOT eligible — must never be chosen)
    write("projA/main/src/a.py", (1 to 3).map(i => s"x = $i").mkString("\n"))
    write("projA/dev-feature/src/a.py", (1 to 10).map(i => s"x = $i").mkString("\n"))
    write("projA/release/big.py", (1 to 100).map(i => s"x = $i").mkString("\n"))
    // projB: master only, C# brace-only lines don't count (2 of 5)
    write("projB/master/b.cs", "class B\n{\nint x;\nint y;\n}")
    val defaults = Seq(("projA", "main"), ("projB", "master"))
      .toDF("project", "default_branch")

    // exercise the URI-anchored split through an explicit scheme too
    val viaScheme = RepoScan.locByProjectBranchLang(spark, "file://" + root)
      .collect()
    assert(viaScheme.nonEmpty && viaScheme.forall(r => r.getString(1) != null))

    val got = RepoScan.chosenBranchLoc(spark, root.toString, defaults)
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(2), r.getLong(3)))
    assert(got.toSet == Set(
      ("projA", "dev-feature", "py", 10L),
      ("projB", "master", "cs", 3L)))
  }
}
