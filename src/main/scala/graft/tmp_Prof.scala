package graft
object Prof {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import org.apache.spark.sql.functions._
    import graft.operators.Dedup
    def docs = graft.sources.Tables.table(spark, "/root/testdata/sf0.1", "documents")
    def time(name: String)(f: => Long): Unit = {
      f
      val t0 = System.nanoTime(); val n = f
      println(f"[t] $name%-22s ${(System.nanoTime()-t0)/1e9}%6.2f s ($n rows)")
    }
    def sh = Dedup.shingled(docs, "doc_id", "text")
    time("shingled") { sh.count() }
    time("bands")    { Dedup.lshBandsFromShingles(sh, "doc_id").count() }
    val shP = sh.persist()
    shP.count()
    time("bands-cached") { Dedup.lshBandsFromShingles(shP, "doc_id").count() }
    val bands = Dedup.lshBandsFromShingles(shP, "doc_id").persist()
    bands.count()
    time("candidates") {
      val l = bands.toDF("id_a", "band", "band_key")
      val r = bands.toDF("id_b", "band", "band_key")
      l.join(r, Seq("band", "band_key")).filter(col("id_a") < col("id_b"))
        .select("id_a", "id_b").distinct().count()
    }
    val cands = {
      val l = bands.toDF("id_a", "band", "band_key")
      val r = bands.toDF("id_b", "band", "band_key")
      l.join(r, Seq("band", "band_key")).filter(col("id_a") < col("id_b"))
        .select("id_a", "id_b").distinct().persist()
    }
    cands.count()
    time("verify") {
      cands.join(shP.toDF("id_a", "sh_a"), "id_a")
        .join(shP.toDF("id_b", "sh_b"), "id_b")
        .select(col("id_a"), col("id_b"),
          round(Dedup.jaccard(col("sh_a"), col("sh_b")), 4).as("jac"))
        .filter(col("jac") >= 0.8).count()
    }
    time("full") { Dedup.minhashNearDups(docs, "doc_id", "text", 0.8).count() }
    spark.stop()
  }
}
