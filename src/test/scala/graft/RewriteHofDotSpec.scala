package graft

import graft.functions.FloatDotProduct
import graft.operators.Dedup
import graft.plans.RewriteHofDotProduct
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The injected optimizer rule: declarative HOF dot products become
  * the native codegen'd expression.
  */
class RewriteHofDotSpec extends SparkSpec {
  import spark.implicits._

  private def hasNativeDot(df: DataFrame): Boolean =
    df.queryExecution.optimizedPlan
      .collect { case p => p.expressions }.flatten
      .exists(_.exists(_.isInstanceOf[FloatDotProduct]))

  private lazy val pairs = {
    val e = spark.read.parquet(s"$sfDir/embeddings.parquet").limit(50)
    e.select(col("vec_id").as("id_a"), col("embedding").as("v_a"))
      .crossJoin(e.select(col("vec_id").as("id_b"), col("embedding").as("v_b")))
      .filter(col("id_a") < col("id_b")).limit(200)
  }

  test("Dedup.dot rewrites to FloatDotProduct and agrees bitwise " +
      "with the interpreted HOF") {
    val df = pairs.select(col("id_a"), col("id_b"),
      Dedup.dot(col("v_a"), col("v_b")).as("d"))
    assert(hasNativeDot(df), df.queryExecution.optimizedPlan.toString)
    val native = df.collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    spark.conf.set(RewriteHofDotProduct.ConfKey, "false")
    try {
      val off = pairs.select(col("id_a"), col("id_b"),
        Dedup.dot(col("v_a"), col("v_b")).as("d"))
      assert(!hasNativeDot(off))
      val interp = off.collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
      assert(native == interp) // bit-identical, not approximately
    } finally spark.conf.unset(RewriteHofDotProduct.ConfKey)
  }

  test("the SQL HOF form rewrites too") {
    spark.read.parquet(s"$sfDir/embeddings.parquet").limit(10)
      .createOrReplaceTempView("emb_hof")
    val df = spark.sql(
      """SELECT aggregate(zip_with(embedding, embedding,
        |    (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)),
        |  CAST(0.0 AS DOUBLE), (s, v) -> s + v) AS sq
        |FROM emb_hof""".stripMargin)
    assert(hasNativeDot(df), df.queryExecution.optimizedPlan.toString)
    // self-dot = squared L2 norm, strictly positive for real vectors
    assert(df.collect().forall(_.getDouble(0) > 0))
  }

  test("near-miss aggregates are never touched") {
    // repartition keeps ConvertToLocalRelation from pre-evaluating the
    // project before injected rules run (plan asserts stay meaningful)
    val arrs = Seq((Array(1.0f, 2.0f), Array(3.0f, 4.0f)))
      .toDF("a", "b").repartition(1)
    // wrong combine: sum of pairwise SUMS
    val sums = arrs.select(aggregate(
      zip_with(col("a"), col("b"), (p, q) => p.cast("double") + q.cast("double")),
      lit(0.0), (acc, v) => acc + v).as("s"))
    assert(!hasNativeDot(sums))
    assert(sums.head().getDouble(0) == 10.0)
    // wrong seed: starts at 1.0
    val seeded = arrs.select(aggregate(
      zip_with(col("a"), col("b"), (p, q) => p.cast("double") * q.cast("double")),
      lit(1.0), (acc, v) => acc + v).as("s"))
    assert(!hasNativeDot(seeded))
    assert(seeded.head().getDouble(0) == 12.0)
    // non-float arrays (strings) keep their lambda
    val strs = Seq((Array("x"), Array("y"))).toDF("a", "b").repartition(1)
    val conc = strs.select(aggregate(
      zip_with(col("a"), col("b"), (p, q) => concat(p, q)),
      lit(""), (acc, v) => concat(acc, v)).as("s"))
    assert(!hasNativeDot(conc))
    assert(conc.head().getString(0) == "xy")
  }

  test("documented divergence boundary: mismatched lengths null the " +
      "HOF, prefix-dot the native form") {
    val arrs = Seq((Array(1.0f, 2.0f, 9.0f), Array(3.0f, 4.0f)))
      .toDF("a", "b").repartition(1)
    def dotDf = arrs.select(Dedup.dot(col("a"), col("b")).as("d"))
    assert(dotDf.head().getDouble(0) == 11.0) // native: common prefix
    spark.conf.set(RewriteHofDotProduct.ConfKey, "false")
    try assert(dotDf.head().isNullAt(0)) // HOF: zip_with null-pads
    finally spark.conf.unset(RewriteHofDotProduct.ConfKey)
  }
}
