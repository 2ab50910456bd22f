package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Scalar-function kit re-expressing the reference's row-wise Python
  * (SURVEY.md §2.6 F1-F16) as pure `Column` combinators. Everything
  * here stays inside whole-stage codegen — no UDFs except where noted.
  */
object Functions {

  /** Spread a narrow frame to the session's parallelism ONLY when its
    * scan under-parallelizes. The harness parquet is single-row-group
    * (one split per file), so per-row-expensive stages (tokenize,
    * shingle, hash) would otherwise run on one core — but baking an
    * unconditional `repartition` into an operator puts a full-corpus
    * round-robin shuffle in the plan at EVERY scale, including the
    * 100 TB one where the scan already yields thousands of splits and
    * the shuffle is pure waste. Branching on the planned partition
    * count keeps the test-scale plan identical (1 split < P still
    * repartitions) and makes the big-corpus plan shuffle-free.
    *
    * The probe inspects the INITIAL physical plan, never `df.rdd`:
    * under AQE, `.rdd` forces `getFinalPhysicalPlan`, which EXECUTES
    * every upstream exchange just to report a partition count —
    * doubling exactly the work this helper exists to avoid. A frame
    * that already contains an exchange is shuffle-spread by
    * construction (skip); a pure scan chain exposes its split count
    * on the scan node (file listing only, no job). Non-file leaves
    * (local fixtures, cached relations) are left unspread — they are
    * either test-sized or already partitioned by their producer.
    */
  def spreadScan(df: DataFrame): DataFrame = {
    import org.apache.spark.sql.execution.FileSourceScanExec
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    import org.apache.spark.sql.execution.exchange.Exchange
    val par = df.sparkSession.sparkContext.defaultParallelism
    val plan = df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.inputPlan
      case p => p
    }
    val hasExchange = plan.exists(_.isInstanceOf[Exchange])
    val scanSplits = plan.collect {
      case f: FileSourceScanExec => f.inputRDDs().map(_.getNumPartitions).sum
    }
    if (!hasExchange && scanSplits.nonEmpty && scanSplits.sum < par)
      df.repartition(par)
    else df
  }

  /** Exploded projection that computes the array expression exactly
    * once per row. A plain `explode` triggers InferFiltersFromGenerate,
    * which derives `size(arr) > 0 AND isnotnull(arr)` and pushes both
    * below every barrier (filters commute with Repartition) into the
    * scan filter — re-inlining the full array expression 2× per
    * SOURCE row. For interpreted higher-order expressions (transform /
    * aggregate lambdas: shingles, winnow fingerprints, token n-grams)
    * that triples the dominant cost: measured 6× on the shingle
    * posting list at sf0.1. `explode_outer` infers nothing; dropping
    * the null stub rows ABOVE the Generate (a predicate on the
    * generator OUTPUT cannot push below it) restores exact `explode`
    * semantics.
    *
    * Precondition: array ELEMENTS must be non-null — a null element
    * row is indistinguishable from an empty-array stub and is dropped.
    * Every caller explodes concat/split/hash-derived arrays, which
    * never contain nulls.
    */
  def explodeOnce(df: DataFrame, keep: Seq[Column], arr: Column,
      name: String): DataFrame =
    df.select((keep :+ explode_outer(arr).as(name)): _*)
      .filter(col(name).isNotNull)

  // ---- F1: string trim / clean ------------------------------------
  /** Strip UTF-8 BOM characters; reference:
    * datasets/create_scripts_dataset.ipynb cell 3.
    */
  def stripBom(c: Column): Column = regexp_replace(c, "﻿", "")

  /** CR/LF → single space; reference: fetch_gsheet_instructions.py:46. */
  def flattenNewlines(c: Column): Column =
    regexp_replace(c, "[\\r\\n]", " ")

  // ---- F2: prefix strip --------------------------------------------
  /** reference: create_gitlab_dataset.ipynb cell 5
    * (`str.replace("^plugins/revit/", "", regex=True)`).
    */
  def stripPrefix(c: Column, prefix: String): Column =
    regexp_replace(c, "^" + java.util.regex.Pattern.quote(prefix), "")

  // ---- F3: split + slice + rejoin (extract_short_name) --------------
  /** First two `sep`-separated parts rejoined, identity when <2 parts;
    * reference: create_projectsync_dataset.ipynb cell 8.
    */
  def shortName(c: Column, sep: String = "_"): Column = {
    val parts = split(c, java.util.regex.Pattern.quote(sep))
    when(size(parts) >= 2, concat_ws(sep, slice(parts, 1, 2))).otherwise(c)
  }

  // ---- F4: conditional suffix strip (extract_file_storage_name) -----
  /** If the last `_`-part equals `username` (case-insensitive, trimmed),
    * drop it; reference: create_projectsync_dataset.ipynb cell 11.
    */
  def fileStorageName(project: Column, username: Column): Column = {
    val parts = split(project, "_")
    val last = element_at(parts, -1)
    when(
      size(parts) >= 2 &&
        lower(trim(last)) === lower(trim(username)),
      concat_ws("_", slice(parts, lit(1), size(parts) - 1))
    ).otherwise(project)
  }

  // ---- F5: first-match-wins when-chain classification ----------------
  /** Ordered (condition, value) branches, first match wins — branch
    * order is load-bearing (SURVEY.md §7.5 #4); reference:
    * create_projectsync_dataset.ipynb cells 9,12,13 (np.select).
    */
  def whenChain(branches: Seq[(Column, Column)], default: Column): Column =
    branches.foldRight(default) { case ((cond, value), acc) =>
      when(cond, value).otherwise(acc)
    }

  // ---- F6: boolean derivations ---------------------------------------
  /** Null-safe case-insensitive regex contains (pandas
    * `str.contains(..., case=False, na=False)`); reference:
    * create_projectsync_dataset.ipynb cells 9,10. `(?iu)` makes the
    * JVM regex case-fold Unicode (Cyrillic) like pandas does.
    */
  def containsCi(c: Column, pattern: String): Column =
    coalesce(c.rlike("(?iu)" + pattern), lit(false))

  // ---- F7/F8: tolerant timestamp parse / epoch-ms ---------------------
  /** Epoch-millis (possibly string-typed / garbage) → timestamp, null on
    * failure; reference: fetch_yougile_programming.py:160-191 (to_iso).
    */
  def fromEpochMs(c: Column): Column =
    timestamp_millis(c.try_cast(LongType))

  /** pandas `to_datetime(errors='coerce')`; reference:
    * create_yougile_dataset.ipynb cell 7.
    */
  def tryTimestamp(c: Column): Column = try_to_timestamp(c)

  // ---- F9: timezone convert -------------------------------------------
  /** UTC → local wall time, tz dropped; reference:
    * create_yougile_dataset.ipynb cell 7 (`to_local`).
    */
  def toLocal(c: Column, tz: String = "Asia/Yekaterinburg"): Column =
    from_utc_timestamp(c, tz)

  // ---- F11: numeric coercion -------------------------------------------
  /** pandas `to_numeric(errors='coerce').astype('Int64')`; reference:
    * create_scripts_dataset.ipynb cell 10.
    */
  def tryLong(c: Column): Column = c.try_cast(LongType)

  /** Sheet-ID `"123.0"` format; reference:
    * create_gitlab_dataset.ipynb cell 5.
    */
  def sheetIdFormat(c: Column): Column =
    format_string("%d.0", c.try_cast(LongType))

  // ---- F12: dtype-driven null canonicalization ---------------------------
  /** strings→stringDefault, integers/floats→0, booleans→false,
    * timestamps left null (pandas NaT); reference:
    * create_projectsync_dataset.ipynb cell 14.
    */
  def fillByType(df: DataFrame, stringDefault: String = "Нет данных"): DataFrame = {
    val stringCols = df.schema.fields.collect {
      case f if f.dataType == StringType => f.name
    }
    val numCols = df.schema.fields.collect {
      case f if f.dataType.isInstanceOf[NumericType] => f.name
    }
    val boolCols = df.schema.fields.collect {
      case f if f.dataType == BooleanType => f.name
    }
    df.na.fill(stringDefault, stringCols)
      .na.fill(0, numCols)
      .na.fill(false, boolCols)
  }

  // ---- F13: map lookup with default --------------------------------------
  /** dict.get(k, default); reference: fetch_yougile_programming.py:265. */
  def mapLookup(m: Column, key: Column, default: Column): Column =
    coalesce(element_at(m, key), default)

  // ---- F16: first-token truncate -------------------------------------------
  /** reference: fetch_gsheet_instructions.py:48-49. */
  def firstToken(c: Column, sep: String = " "): Column =
    substring_index(c, sep, 1)

  // ---- P10: drop all-null columns --------------------------------------------
  /** pandas `dropna(axis=1, how='all')` — one aggregate pass computing
    * non-null counts per column, then drop the empty ones; reference:
    * fetch_asterisk_cdr.py:61. Single job, no per-column scans.
    */
  def dropAllNullColumns(df: DataFrame): DataFrame = {
    val counts = df.agg(
      count(lit(1)).as("__rows"),
      df.columns.map(c => count(col(c)).as(c)): _*
    ).head()
    val empty = df.columns.filter(c => counts.getAs[Long](c) == 0L)
    if (empty.isEmpty) df else df.drop(empty: _*)
  }

  /** P3: drop every column whose name matches a predicate; reference:
    * create_yougile_dataset.ipynb cell 3 (startswith('raw')).
    */
  def dropColumnsWhere(df: DataFrame, p: String => Boolean): DataFrame = {
    val doomed = df.columns.filter(p)
    if (doomed.isEmpty) df else df.drop(doomed: _*)
  }

  /** Union-type ingest normalization (SURVEY.md §7.4: the sticker
    * field arrives as EITHER an object `{"id": ...}` OR a bare array
    * `[...]`; reference: fetch_yougile_programming.py:62-126). Parse
    * the JSON column against each candidate schema with the FAILFAST-
    * free from_json (null on mismatch) and coalesce to one canonical
    * array form. Pure column expr — no UDF.
    */
  def normalizeDictOrList(json: Column): Column = {
    import org.apache.spark.sql.types.{ArrayType, StructField}
    val asObj = from_json(json,
      StructType(Seq(StructField("id", StringType))))
    val asList = from_json(json, ArrayType(StringType))
    coalesce(
      asList,
      when(asObj.getField("id").isNotNull, array(asObj.getField("id"))),
      array().cast(ArrayType(StringType)))
  }

  /** Polymorphic scalar coercion (`to_iso` accepts int | numeric
    * string | `{"timestamp"/"date"/"value"/"ms": ...}`; reference:
    * fetch_yougile_programming.py:160-191): first parse that yields a
    * value wins, garbage → NULL.
    */
  def epochMsAnyToTimestamp(c: Column): Column = {
    import org.apache.spark.sql.types.StructField
    val fields = Seq("timestamp", "date", "value", "ms")
    val asObj = from_json(c.cast(StringType),
      StructType(fields.map(f => StructField(f, StringType))))
    val fromDict = coalesce(fields.map(f => asObj.getField(f).try_cast(LongType)): _*)
    timestamp_millis(coalesce(c.cast(StringType).try_cast(LongType), fromDict))
  }
}
