package graft

import graft.sources.SchemaGuard
import org.apache.spark.sql.types._

/** Bronze-ingest schema-drift guard semantics. */
class SchemaGuardSpec extends SparkSpec {

  private val declared = StructType(Seq(
    StructField("id", LongType),
    StructField("name", StringType),
    StructField("value", DoubleType)))

  test("identical schemas: no drift, nullability ignored") {
    val actual = StructType(declared.fields.map(_.copy(nullable = false)))
    assert(SchemaGuard.diff(declared, actual).isEmpty)
    assert(SchemaGuard.requireCompatible(declared, actual).isEmpty)
  }

  test("added column tolerated by default, refusable on demand") {
    val actual = declared.add(StructField("extra", StringType))
    val d = SchemaGuard.requireCompatible(declared, actual)
    assert(d.added.map(_.name) == Seq("extra") && !d.breaking)
    intercept[IllegalStateException](
      SchemaGuard.requireCompatible(declared, actual, allowAdded = false))
  }

  test("removed and retyped columns fail fast with both named") {
    val actual = StructType(Seq(
      StructField("id", StringType), // retyped
      StructField("value", DoubleType))) // name removed
    val d = SchemaGuard.diff(declared, actual)
    assert(d.removed.map(_.name) == Seq("name"))
    assert(d.retyped == Seq(("id", LongType, StringType)))
    val e = intercept[IllegalStateException](
      SchemaGuard.requireCompatible(declared, actual))
    assert(e.getMessage.contains("name") && e.getMessage.contains("id"))
  }

  test("guards a real inferred read against the declared contract") {
    val dir = java.nio.file.Files.createTempDirectory("graft_guard")
    import spark.implicits._
    Seq((1L, "a", 1.5)).toDF("id", "name", "value")
      .write.mode("overwrite").parquet(dir.toString)
    val inferred = spark.read.parquet(dir.toString).schema
    assert(SchemaGuard.requireCompatible(declared, inferred).isEmpty)
  }
}
