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

  test("fdot rejects non-float-array inputs at analysis") {
    val bad = Seq((Array(1.0, 2.0), Array(1.0f))).toDF("x", "y")
    intercept[org.apache.spark.sql.AnalysisException] {
      bad.select(fdot(col("x"), col("y"))).collect()
    }
  }
}
