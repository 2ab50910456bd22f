package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** S8: per-language LOC accounting over a checked-out file tree
  * (reference: extractors/fetch_gitlab_lines.py:78-160 — clone +
  * ls-tree + per-file line counting). The git/network half stays a
  * connector concern; the analytics half is a distributed text scan:
  * one task per file split, language from the extension, the
  * reference's counting rules as pushed-down filters.
  *
  * Rules (extractor_legacy/fetch_gitlab_lines.py:54-81):
  *  - blank lines don't count;
  *  - C#: lines that are just `{` or `}` don't count;
  *  - binary files (NUL in content) are skipped (F17 sniff).
  */
object RepoScan {

  def locByLanguage(spark: SparkSession, root: String): DataFrame =
    locLines(spark, root)
      .groupBy("lang")
      .agg(count(lit(1)).as("loc"), countDistinct("path").as("n_files"))
      .orderBy(desc("loc"))

  /** Per-file LOC — the `(project, branch, lang, loc)` grain the
    * reference aggregates with argmax (A4).
    */
  def locByFile(spark: SparkSession, root: String): DataFrame =
    locLines(spark, root)
      .groupBy("path", "lang")
      .agg(count(lit(1)).as("loc"))

  private def locLines(spark: SparkSession, root: String): DataFrame =
    spark.read
      .option("recursiveFileLookup", "true")
      .text(root)
      .select(input_file_name().as("path"), col("value"))
      .withColumn("lang",
        lower(regexp_extract(col("path"), "\\.([A-Za-z0-9]+)$", 1)))
      .filter(col("lang") =!= "")
      .filter(!col("value").contains("\u0000")) // F17 binary sniff
      .filter(length(trim(col("value"))) > 0)
      .filter(!(col("lang") === "cs" && trim(col("value")).isin("{", "}")))

  // ---- multi-branch scan + chosen-branch argmax (the S8 git half) ----

  /** Per-(project, branch, lang) LOC over a `<root>/<project>/<branch>/
    * ...` tree — the Spark-side shape of the reference's one-clone-all-
    * refs scan (fetch_gitlab_lines.py:87-117: ls-tree per ref, count
    * per file). Cloning/ref materialization stays a connector concern;
    * once refs are laid out as directories the scan is one distributed
    * pass with the same per-line counting rules as locLines.
    */
  def locByProjectBranchLang(spark: SparkSession, root: String): DataFrame = {
    // Anchor on the root's FULL qualified location, tolerating the one
    // thing input_file_name() and Path.makeQualified disagree on —
    // local scheme spelling (file:/// vs file:/). Authority-carrying
    // URIs (hdfs://nn, s3a://bucket) render identically on both sides,
    // so scheme+authority match verbatim; and unlike a basename
    // anchor, a directory elsewhere in the tree sharing the root's
    // name can't shift the project/branch split. (Caveat: characters
    // input_file_name percent-encodes, e.g. spaces, would need
    // decoding — repo layouts don't contain them.)
    val p = new org.apache.hadoop.fs.Path(root)
    val uri = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      .makeQualified(p).toUri
    def q(s: String) = java.util.regex.Pattern.quote(s)
    val anchor = Option(uri.getAuthority).filter(_.nonEmpty) match {
      case Some(auth) => "^" + q(s"${uri.getScheme}://$auth${uri.getPath}")
      case None => s"^${q(uri.getScheme)}:/{0,2}" + q(uri.getPath)
    }
    locLines(spark, root)
      .withColumn("rel", regexp_extract(col("path"), s"$anchor/(.+)$$", 1))
      .withColumn("project", split(col("rel"), "/").getItem(0))
      .withColumn("branch", split(col("rel"), "/").getItem(1))
      .groupBy("project", "branch", "lang")
      .agg(count(lit(1)).as("loc"))
  }

  /** The reference's branch policy (fetch_gitlab_lines.py:78-84,
    * 148-152): consider only {default-or-main, master} ∪ {branches
    * containing "dev"}; pick the branch with the most total LOC and
    * report its per-language breakdown. `defaults` is a per-project
    * (project, default_branch) dim — broadcast, like every dim here.
    * Tie-break is (total desc, branch asc): the reference's Python
    * `max` over a set-ordered dict is arbitrary on ties, so the
    * deterministic rule is ours by design.
    */
  def chosenBranchLoc(spark: SparkSession, root: String,
      defaults: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val byLang = locByProjectBranchLang(spark, root)
    val eligible = byLang
      .join(broadcast(defaults), Seq("project"), "left")
      .filter(col("branch") === coalesce(col("default_branch"), lit("main")) ||
        col("branch") === "master" ||
        lower(col("branch")).contains("dev"))
      .drop("default_branch")
    val totals = eligible.groupBy("project", "branch")
      .agg(sum("loc").as("total"))
    val w = Window.partitionBy("project")
      .orderBy(col("total").desc, col("branch").asc)
    val chosen = totals
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .select(col("project"), col("branch"))
    eligible.join(chosen, Seq("project", "branch"))
      .select(col("project"), col("branch").as("chosen_branch"),
        col("lang"), col("loc"))
  }
}
