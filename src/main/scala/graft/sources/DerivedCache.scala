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

  /** Evict every cache directory whose key is no longer current — the
    * operational twin of `AtomicIncrement.vacuumUncommitted`. Content
    * keys fold in the source's mtime/length, so a rewritten source
    * STRANDS the old key's artifact forever unless someone sweeps;
    * `keepCurrent` is the set of dirs the caller still derives (the
    * result of re-calling `dirFor` for each live (source, kind,
    * params) tuple), and everything else under the cache root goes.
    * Returns the deleted dirs. Deleting a dir another process is
    * still BUILDING is safe (no _SUCCESS yet, the loser rebuilds) —
    * but deleting a COMPLETE artifact while another job is mid-read
    * fails that reader's tasks with FileNotFoundException (Spark has
    * already resolved the file listing). Vacuum therefore assumes no
    * concurrent readers: single-harness / maintenance-window use.
    */
  def vacuum(spark: SparkSession, keepCurrent: Set[String]): Seq[String] = {
    val root = new org.apache.hadoop.fs.Path(
      s"${sys.props("java.io.tmpdir")}/graft_cache")
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(root)) return Seq.empty
    val keep = keepCurrent.map(d =>
      fs.makeQualified(new org.apache.hadoop.fs.Path(d)).toString)
    fs.listStatus(root).toSeq
      .filter(st => st.isDirectory &&
        !keep.contains(fs.makeQualified(st.getPath).toString))
      .map { st => fs.delete(st.getPath, true); st.getPath.toString }
  }

  /** Evict only the cache dirs of the given `kinds` (every key, all
    * sources) — the scoped eviction a cold-timing harness needs:
    * ScaleCheck must delete exactly the artifact family the query
    * under test builds (so its "cold" run is honestly cold) WITHOUT
    * wiping unrelated kinds that other queries in the same pass, or
    * another process on the host, still read. Dir names are
    * `kind-<32-hex>`; the hex anchor keeps a kind from prefix-matching
    * a longer kind name (`trade-edges` vs a hypothetical `trade`).
    */
  def vacuumKinds(spark: SparkSession, kinds: Set[String]): Seq[String] = {
    val root = new org.apache.hadoop.fs.Path(
      s"${sys.props("java.io.tmpdir")}/graft_cache")
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(root)) return Seq.empty
    val pats = kinds.map(k =>
      java.util.regex.Pattern.quote(k) + "-[0-9a-f]{32}")
    fs.listStatus(root).toSeq
      .filter(st => st.isDirectory &&
        pats.exists(st.getPath.getName.matches))
      .map { st => fs.delete(st.getPath, true); st.getPath.toString }
  }
}
