package graft.sources

import org.apache.spark.sql.SparkSession

/** Content-keyed cache directories for artifacts derived from a source
  * file (persisted ANN indexes, memoized cluster assignments): the key
  * folds in the source's identity — path, modification time, length —
  * plus the derivation parameters, so a changed source or a changed
  * parameter always misses and a stale artifact can never answer for
  * new data. Build-once-reuse-many across queries, runs, and
  * processes; artifacts live under the JVM tmp dir like every other
  * scratch output of this harness.
  */
object DerivedCache {

  def dirFor(spark: SparkSession, srcFile: String, kind: String,
      params: String = ""): String = {
    val p = new org.apache.hadoop.fs.Path(srcFile)
    val st = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      .getFileStatus(p)
    val key = java.security.MessageDigest.getInstance("MD5")
      .digest(s"$srcFile:${st.getModificationTime}:${st.getLen}:$params"
        .getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    s"${sys.props("java.io.tmpdir")}/graft_cache/$kind-$key"
  }

  /** Has a complete artifact been published at `dir`? Spark's
    * _SUCCESS marker is the completeness witness — a crashed build
    * leaves no marker and the next caller rebuilds over it.
    */
  def isComplete(spark: SparkSession, dir: String): Boolean = {
    val p = new org.apache.hadoop.fs.Path(s"$dir/_SUCCESS")
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(p)
  }
}
