package graft

import graft.operators.WebCorpus
import graft.streaming.{BenchmarkGate, DocGate, UrlGate}
import org.apache.spark.sql.functions._

class UrlGateSpec extends SparkSpec {
  import spark.implicits._

  /** Independent replay of the synthesized-URL canonical form: every
    * doc_id % 6 variant collapses to this, so the expected gate
    * decision derives in plain Scala with no shared Spark expression.
    */
  private def expectedCanon(docId: Long): String = {
    val g = docId % 211
    s"https://ex${g % 13}.org/a/$g?id=$g&ref=home"
  }

  private def docsWithUrls() =
    spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), col("text"),
        WebCorpus.synthUrl(col("doc_id")).as("url"))

  test("gate ≡ the canonical-set cut, against a plain-Scala replay") {
    val all = docsWithUrls()
    val corpus = all.filter(pmod(col("doc_id"), lit(5)) === 0)
    val arriving = all.filter(pmod(col("doc_id"), lit(5)) =!= 0)
    val gate = UrlGate.fromCorpus(corpus)
    val kept = gate.scrubDocs(arriving).select("doc_id")
      .as[Long].collect().toSet
    val corpusCanon = corpus.select("doc_id").as[Long].collect()
      .map(expectedCanon).toSet
    val expected = arriving.select("doc_id").as[Long].collect()
      .filterNot(id => corpusCanon(expectedCanon(id))).toSet
    assert(kept == expected)
    assert(kept.nonEmpty && kept.size <
      arriving.count(), "fixture must exercise both keep and drop")
  }

  test("micro-batch boundaries are invisible; replay is idempotent") {
    val all = docsWithUrls()
    val corpus = all.filter(pmod(col("doc_id"), lit(5)) === 0)
    val arriving = all.filter(pmod(col("doc_id"), lit(5)) =!= 0)
    val gate = UrlGate.fromCorpus(corpus)
    def ids(df: org.apache.spark.sql.DataFrame) =
      gate.scrubDocs(df).select("doc_id").as[Long].collect().toSet
    val whole = ids(arriving)
    val b1 = arriving.filter(col("doc_id") < 250)
    val b2 = arriving.filter(col("doc_id") >= 250)
    assert((ids(b1) ++ ids(b2)) == whole)
    assert(ids(b1) == ids(b1), "replayed batch must drop the same rows")
  }

  test("null urls pass; composition with another gate intersects") {
    val corpus = Seq((1L, "a", "https://ex.org/p")).toDF("doc_id", "text", "url")
    val batch = Seq(
      (2L, "keep me", "https://WWW.ex.org/p/"),  // canon-dup of corpus
      (3L, "keep me", "https://ex.org/q"),       // novel page
      (4L, "keep me", null.asInstanceOf[String]) // no key -> passes
    ).toDF("doc_id", "text", "url")
    val gate = UrlGate.fromCorpus(corpus)
    assert(gate.scrubDocs(batch).select("doc_id").as[Long].collect().toSet
      == Set(3L, 4L))
    // URL gate first, exact-text decontamination second: doc 3 is
    // URL-novel but an exact copy of the benchmark text, so the
    // composed gate keeps only the null-url row
    val bench = Seq("keep me").toDF("text")
    val composed = DocGate.all(gate, BenchmarkGate.fromDocs(bench))
    assert(composed.scrubDocs(batch).select("doc_id").as[Long]
      .collect().toSet == Set.empty[Long])
    val batch2 = batch.withColumn("text",
      when(col("doc_id") === 4L, lit("novel text")).otherwise(col("text")))
    assert(composed.scrubDocs(batch2).select("doc_id").as[Long]
      .collect().toSet == Set(4L))
  }
}
