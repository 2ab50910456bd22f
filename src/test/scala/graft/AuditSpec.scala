package graft

import graft.operators.Audit
import org.apache.spark.sql.functions._

/** Snapshot diff and FK-orphan audit semantics. */
class AuditSpec extends SparkSpec {
  import spark.implicits._

  test("snapshotDiff classifies added/removed/changed and is " +
      "null-safe on compared columns") {
    val prev = Seq(
      (1L, Some("a"), 10.0), (2L, Some("b"), 20.0),
      (3L, None: Option[String], 30.0), (4L, Some("d"), 40.0))
      .toDF("k", "s", "v")
    val next = Seq(
      (2L, Some("b"), 20.0),               // unchanged -> silent
      (3L, None: Option[String], 30.0),    // null == null -> silent
      (4L, None: Option[String], 40.0),    // d -> null = changed
      (5L, Some("e"), 50.0))               // added
      .toDF("k", "s", "v")
    val got = Audit.snapshotDiff(prev, next, "k", Seq("s", "v"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got == Map(1L -> "removed", 4L -> "changed", 5L -> "added"))
  }

  test("fkOrphans counts unresolved non-null keys only") {
    val fact = Seq(Some(1L), Some(2L), Some(9L), Some(9L), None)
      .toDF("fk_key")
    val dim = Seq(1L, 2L, 3L).toDF("pk")
    val row = Audit.fkOrphans(fact, "fk_key", dim, "pk", "t.fk")
      .collect().head
    assert(row.getString(0) == "t.fk")
    assert(row.getLong(1) == 2) // the two 9s; the null FK is not an orphan
  }
  test("q_psi_drift: mirrored snapshots score zero; a shifted one drifts") {
    import spark.implicits._
    def run(shift: Boolean): (Double, Seq[Double]) = {
      // even ids = reference, odd ids = current; each ref doc has a
      // paired cur doc — identical lengths unless shifted
      val docs = (0L until 30L).flatMap { i =>
        val refLen = 5 + (i % 10).toInt
        val curLen = if (shift) refLen + 10 else refLen
        Seq((2 * i, ("w " * refLen).trim), (2 * i + 1, ("w " * curLen).trim))
      }.toDF("doc_id", "text")
      val dir = java.nio.file.Files.createTempDirectory("graft_psifix").toString
      docs.write.mode("overwrite").parquet(s"$dir/documents.parquet")
      val rows = SparkEntry.registry("q_psi_drift").fn(spark, dir).collect()
      (rows.head.getDouble(4), rows.map(_.getDouble(3)).toSeq)
    }
    val (same, terms) = run(shift = false)
    assert(same == 0.0 && terms.forall(_ == 0.0),
      "identical distributions must score exactly zero")
    val (drifted, _) = run(shift = true)
    assert(drifted > 0.25, s"shifted snapshot scored $drifted (stable < 0.1)")
  }
  test("q_corpus_expectations: all rules pass on clean data; damage flips the right rule") {
    import spark.implicits._
    val clean = SparkEntry.registry("q_corpus_expectations").fn(spark, sfDir)
      .collect().map(r => r.getString(0) -> r.getBoolean(2)).toMap
    assert(clean.values.forall(identity), s"clean harness data failed: $clean")
    assert(clean.keySet == Set("doc_id_unique", "lang_in_set",
      "n_chars_consistent", "rows_nonempty", "source_complete", "text_nonblank"))
    // stale n_chars metadata must flip ONLY its own rule
    val dir = java.nio.file.Files.createTempDirectory("graft_expfix").toString
    graft.sources.Tables.table(spark, sfDir, "documents")
      .withColumn("n_chars", org.apache.spark.sql.functions.col("n_chars") +
        org.apache.spark.sql.functions.when(
          org.apache.spark.sql.functions.col("doc_id") === 7, 1).otherwise(0))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val damaged = SparkEntry.registry("q_corpus_expectations").fn(spark, dir)
      .collect().map(r => r.getString(0) -> r.getBoolean(2)).toMap
    assert(!damaged("n_chars_consistent"))
    assert((damaged - "n_chars_consistent").values.forall(identity))
  }
  test("q_embedding_expectations: clean corpus passes; a NaN flips only its rule") {
    import spark.implicits._
    val clean = SparkEntry.registry("q_embedding_expectations").fn(spark, sfDir)
      .collect().map(r => r.getString(0) -> r.getBoolean(2)).toMap
    assert(clean.values.forall(identity), s"clean embeddings failed: $clean")
    val dir = java.nio.file.Files.createTempDirectory("graft_embfix").toString
    import org.apache.spark.sql.functions._
    graft.sources.Tables.table(spark, sfDir, "embeddings")
      .withColumn("embedding",
        when(col("vec_id") === 5,
          transform(col("embedding"), (x, i) =>
            when(i === 0, lit(Float.NaN)).otherwise(x)))
          .otherwise(col("embedding")))
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val damaged = SparkEntry.registry("q_embedding_expectations").fn(spark, dir)
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getBoolean(2))).toMap
    assert(damaged("elements_finite") == ((1.0, false)))
    assert((damaged - "elements_finite").values.forall(_._2))
  }
}
