package graft

/** Z-order layout: known bit-interleave values land in the expected
  * blocks, and the full 256×256 grid partitions into 256 exact 16×16
  * tiles — the bounded-both-dims pruning property that is the whole
  * point of the curve.
  */
class ZorderSpec extends SparkSpec {
  import operators.Zorder

  private def fact(rows: (Int, Int)*) = {
    import spark.implicits._
    rows.toDF("pk", "sk")
  }

  test("known interleave values: extremes and unit steps") {
    // pmax = smax = 255 ⇒ buckets are the identity; z div 256 = block
    val anchor = Seq((255, 255)) // pins the maxima
    def blockOf(pk: Int, sk: Int): Long = {
      val rows = Zorder.zorderBlocks(fact(anchor :+ ((pk, sk)): _*))
        .collect().map(r => (r.getLong(0), r.getLong(2), r.getLong(4)))
      rows.find { case (_, pmin, smin) => pmin == pk && smin == sk }.get._1
    }
    // part bits occupy odd positions: (255, 0) → 0b1010…10 = 43690
    assert(blockOf(255, 0) == 43690L / 256)
    assert(blockOf(0, 255) == 21845L / 256)
    assert(blockOf(0, 0) == 0L)
    assert(blockOf(1, 0) == 0L) // z = 2
    assert(blockOf(16, 0) == 2L) // z = 512
  }

  test("full grid partitions into 256 blocks of exact 16×16 tiles") {
    import spark.implicits._
    val grid = spark.range(256L * 256L)
      .select(((org.apache.spark.sql.functions.col("id") / 256)
        .cast("int")).as("pk"),
        (org.apache.spark.sql.functions.col("id") % 256)
          .cast("int").as("sk"))
    val blocks = Zorder.zorderBlocks(grid).collect()
    assert(blocks.length == 256)
    blocks.foreach { r =>
      assert(r.getLong(1) == 256L, s"block ${r.getLong(0)} row count")
      assert(r.getLong(3) - r.getLong(2) == 15L, "part-bucket span")
      assert(r.getLong(5) - r.getLong(4) == 15L, "supplier-bucket span")
    }
  }

  test("q_zorder_layout: harness lineitem blocks bound BOTH dims") {
    val rows = SparkEntry.registry("q_zorder_layout").fn(spark, sfDir).collect()
    assert(rows.nonEmpty && rows.length <= 256)
    // every block's per-dimension bucket span ≤ the 16-wide tile (the
    // pruning contract a single-column sort cannot give on dim 2)
    rows.foreach { r =>
      assert(r.getLong(3) - r.getLong(2) <= 15L)
      assert(r.getLong(5) - r.getLong(4) <= 15L)
    }
  }
}
