package graft.streaming

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.SparkSession

/** Shared `batch=<id>` directory-layout helpers for the replay-safe
  * streaming indexes (`CorpusStream`, `CorpusEtlStream`). Both streams
  * rely on the same mechanics — idempotent per-batch partition
  * overwrites, fold-then-delete compaction — so the directory protocol
  * lives in ONE place; a fix to the replay semantics cannot diverge
  * between them.
  */
private[streaming] object BatchDirs {

  def fileSystem(spark: SparkSession, path: String): FileSystem =
    new Path(path).getFileSystem(spark.sessionState.newHadoopConf())

  /** Batch ids of the `batch=<id>` partition directories under `dir`. */
  def batchPartitions(spark: SparkSession, dir: String): Seq[Long] = {
    val fs = fileSystem(spark, dir)
    val p = new Path(dir)
    if (!fs.exists(p)) Seq.empty
    else fs.listStatus(p).toSeq.map(_.getPath.getName)
      .filter(_.startsWith("batch="))
      .map(_.stripPrefix("batch=").toLong)
  }

  /** Delete every `batch=<id>` partition older than `keepFrom`. */
  def deleteOlderThan(spark: SparkSession, dir: String, keepFrom: Long): Unit =
    for (b <- batchPartitions(spark, dir) if b < keepFrom)
      fileSystem(spark, dir).delete(new Path(dir, s"batch=$b"), true)
}
