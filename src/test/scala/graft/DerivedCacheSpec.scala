package graft

import graft.sources.DerivedCache
import java.nio.file.{Files, Paths}

/** The content-keyed cache layer under the memoized cluster assignment
  * and the persisted ANN indexes: identical sources share a key,
  * any change to content (mtime/size) or parameters misses.
  */
class DerivedCacheSpec extends SparkSpec {

  test("key is stable for an unchanged source and splits on content or params") {
    val f = Files.createTempFile("graft_dc", ".parquet")
    Files.write(f, "abc".getBytes)
    val d1 = DerivedCache.dirFor(spark, f.toString, "k", "p=1")
    assert(d1 == DerivedCache.dirFor(spark, f.toString, "k", "p=1"))
    // parameter change → different key
    assert(d1 != DerivedCache.dirFor(spark, f.toString, "k", "p=2"))
    // kind change → different key
    assert(d1 != DerivedCache.dirFor(spark, f.toString, "k2", "p=1"))
    // content change (size) → different key: a stale artifact can
    // never answer for new data
    Files.write(f, "abcdef".getBytes)
    assert(d1 != DerivedCache.dirFor(spark, f.toString, "k", "p=1"))
  }

  test("isComplete is the _SUCCESS witness — absent for partial builds") {
    val dir = Files.createTempDirectory("graft_dc2").toString
    assert(!DerivedCache.isComplete(spark, dir))
    // a crashed build leaves files but no marker → still incomplete
    Files.write(Paths.get(dir, "part-0000.parquet"), Array[Byte](1))
    assert(!DerivedCache.isComplete(spark, dir))
    Files.write(Paths.get(dir, "_SUCCESS"), Array.emptyByteArray)
    assert(DerivedCache.isComplete(spark, dir))
  }
}
