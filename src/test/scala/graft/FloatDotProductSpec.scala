package graft

import graft.functions.FloatDotProduct.fdot
import graft.operators.Dedup
import graft.sources.Tables
import org.apache.spark.sql.functions._

/** The codegen'd dot product must be bit-identical to the interpreted
  * aggregate(zip_with(...)) form — the oracle thresholds on raw values.
  */
class FloatDotProductSpec extends SparkSpec {
  import spark.implicits._

  test("fdot equals the higher-order-function dot bit-for-bit on harness embeddings") {
    val e = Tables.table(spark, sfDir, "embeddings")
    val a = e.select(col("vec_id").as("ia"), col("embedding").as("va"))
    val b = e.select(col("vec_id").as("ib"), col("embedding").as("vb"))
    val pairs = a.crossJoin(b).filter(col("ia") < col("ib"))
      .select(
        fdot(col("va"), col("vb")).as("native"),
        Dedup.dot(col("va"), col("vb")).as("hof"))
    assert(pairs.filter(col("native") =!= col("hof")).count() == 0)
    assert(pairs.count() > 0)
  }

  test("fdot handles nulls and known values") {
    val df = Seq(
      (Some(Array(1.0f, 2.0f)), Some(Array(3.0f, 4.0f))),
      (None, Some(Array(1.0f))),
      (Some(Array(1.0f)), None)
    ).toDF("x", "y").select(fdot(col("x"), col("y")).as("d"))
    val rows = df.collect()
    assert(rows(0).getDouble(0) == 11.0)
    assert(rows(1).isNullAt(0))
    assert(rows(2).isNullAt(0))
  }

  test("fdot accepts double and mixed-width arrays with exact double math") {
    val df = Seq((Array(1.5, -2.0, 0.25), Array(2.0f, 3.0f, 8.0f)))
      .toDF("x", "y")
      .select(
        fdot(col("x"), col("y")).as("mixed"),
        fdot(col("x"), col("x")).as("dd"),
        fdot(col("y"), col("y")).as("ff"))
    val r = df.head()
    assert(r.getDouble(0) == 1.5 * 2.0 + -2.0 * 3.0 + 0.25 * 8.0)
    assert(r.getDouble(1) == 1.5 * 1.5 + 4.0 + 0.0625)
    assert(r.getDouble(2) == 4.0 + 9.0 + 64.0)
  }

  test("fdot rejects non-numeric-array inputs at analysis") {
    val bad = Seq((Array("a", "b"), Array(1.0f))).toDF("x", "y")
    intercept[org.apache.spark.sql.AnalysisException] {
      bad.select(fdot(col("x"), col("y"))).collect()
    }
  }
}
