package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Corrupt-shard quarantine for parquet directory scans. At 100 TB a
  * snapshot has ~100 k data files and the occasional truncated or
  * bit-rotted shard is an operational certainty; a plain
  * `spark.read.parquet(dir)` dies on the FIRST bad footer, taking the
  * whole job with it, and `spark.sql.files.ignoreCorruptFiles` skips
  * silently — rows vanish with no record of what was lost. This scan
  * does the third thing a pipeline actually wants: read everything
  * readable, and NAME what it skipped so the operator can re-fetch or
  * vacuum the bad shards.
  *
  * The footer probe runs on the EXECUTORS (the file list is
  * parallelized, each task opens only its own files' footers), so the
  * driver never serializes 100 k round trips; only the (expected
  * tiny) bad-file list collects.
  */
object Resilient {

  /** All non-hidden `.parquet` files under `dir`, recursively —
    * hidden components (`_data` staging, `_temporary`) are skipped at
    * every path level, the same rule Spark's own listing applies.
    */
  private def dataFiles(spark: SparkSession, dir: String): Seq[String] = {
    val root = new Path(dir)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val rootUri = fs.makeQualified(root).toUri.getPath
    val it = fs.listFiles(root, true)
    val buf = Seq.newBuilder[String]
    while (it.hasNext) {
      val st = it.next()
      val rel = fs.makeQualified(st.getPath).toUri.getPath.stripPrefix(rootUri)
      val hidden = rel.split("/").exists(seg =>
        seg.startsWith("_") || seg.startsWith("."))
      if (st.isFile && st.getPath.getName.endsWith(".parquet") && !hidden)
        buf += fs.makeQualified(st.getPath).toString
    }
    buf.result()
  }

  /** Probe every file's footer executor-side; return the unreadable
    * ones. A parquet file whose footer parses is readable to the row
    * level in the overwhelming case (page-level rot is caught by page
    * checksums at scan time); the probe is the cheap gate that
    * catches truncation, zero-byte writes, and non-parquet garbage.
    */
  def corruptFiles(spark: SparkSession, dir: String): Seq[String] =
    corruptFiles(spark, dataFiles(spark, dir))

  /** Probe exactly `files` — the overload `scanResilient` uses so the
    * directory is listed ONCE per scan: on a ~100 k-file snapshot a
    * second recursive listing doubles namenode/object-store round
    * trips, and a file deleted between two listings would survive in
    * the read set and fail the subsequent read on a missing path.
    */
  def corruptFiles(spark: SparkSession, files: Seq[String]): Seq[String] = {
    if (files.isEmpty) return Seq.empty
    val conf = new org.apache.spark.util.SerializableConfiguration(
      spark.sparkContext.hadoopConfiguration)
    spark.sparkContext
      .parallelize(files, math.min(files.size,
        spark.sparkContext.defaultParallelism))
      .mapPartitions { part =>
        import org.apache.parquet.hadoop.ParquetFileReader
        import org.apache.parquet.hadoop.util.HadoopInputFile
        part.filter { f =>
          try {
            val r = ParquetFileReader.open(
              HadoopInputFile.fromPath(new Path(f), conf.value))
            try { r.getFooter; false } finally r.close()
          } catch { case _: Exception => true }
        }
      }
      .collect().toSeq.sorted
  }

  /** Read `dir` skipping unreadable shards: (rows from every readable
    * file, quarantined file paths). The quarantine list is the
    * operational artifact — log it, alert on it, re-fetch from it;
    * an empty list means the scan was complete. Throws if NOTHING is
    * readable (an empty result masquerading as data is worse than an
    * error).
    */
  def scanResilient(spark: SparkSession, dir: String)
      : (DataFrame, Seq[String]) = {
    val all = dataFiles(spark, dir)
    val bad = corruptFiles(spark, all).toSet
    val good = all.filterNot(bad)
    require(good.nonEmpty,
      s"no readable parquet under $dir (${bad.size} quarantined)")
    (spark.read.option("mergeSchema", "true").parquet(good: _*),
      bad.toSeq.sorted)
  }
}
