package graft

import graft.sources.Resilient
import java.nio.file.{Files, Paths}

class ResilientSpec extends SparkSpec {
  import spark.implicits._

  private def writeDir(): String = {
    val dir = Files.createTempDirectory("graft_resilient").toString
    (1L to 100L).map(i => (i, s"v$i")).toDF("k", "v")
      .repartition(4).write.mode("overwrite").parquet(dir)
    dir
  }

  private def corruptOne(dir: String): String = {
    val part = new java.io.File(dir).listFiles()
      .filter(f => f.getName.endsWith(".parquet") && !f.getName.startsWith("_"))
      .minBy(_.getName)
    // truncate mid-file: magic bytes survive at the head, the footer
    // (written last) is gone — the realistic crashed-writer shape
    val bytes = Files.readAllBytes(part.toPath)
    Files.write(part.toPath, bytes.take(math.max(8, bytes.length / 3)))
    part.getAbsolutePath
  }

  test("a plain read dies on one truncated shard; scanResilient reads the rest and names it") {
    val dir = writeDir()
    val before = spark.read.parquet(dir).count()
    assert(before == 100L)
    val badPath = corruptOne(dir)
    // the failure mode the quarantine exists for
    intercept[Exception] {
      spark.read.parquet(dir).count()
    }
    val (df, quarantined) = Resilient.scanResilient(spark, dir)
    assert(quarantined.size == 1 &&
      quarantined.head.endsWith(Paths.get(badPath).getFileName.toString))
    val n = df.count()
    assert(n < 100L && n > 0L, s"expected partial rows, got $n")
    // readable rows are intact, not merely 'some rows': every row
    // read agrees with the original generator
    assert(df.as[(Long, String)].collect().forall { case (k, v) => v == s"v$k" })
  }

  test("clean directory: empty quarantine, full rows") {
    val dir = writeDir()
    val (df, quarantined) = Resilient.scanResilient(spark, dir)
    assert(quarantined.isEmpty && df.count() == 100L)
  }

  test("nothing readable throws instead of returning an empty frame") {
    val dir = writeDir()
    new java.io.File(dir).listFiles()
      .filter(f => f.getName.endsWith(".parquet") && !f.getName.startsWith("_"))
      .foreach(f => Files.write(f.toPath, Array[Byte](0, 1, 2, 3)))
    intercept[IllegalArgumentException] {
      Resilient.scanResilient(spark, dir)
    }
  }
}
