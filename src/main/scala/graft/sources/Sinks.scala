package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.functions._

/** Sink layer (SURVEY.md §2.2): the reference's write modes as
  * reusable writers. K5 (watermark-incremental with schema evolution)
  * lives in operators.Incremental; K6's driver-side spreadsheet
  * append is modeled by `unmappedKeys` + a caller-provided writeback.
  */
object Sinks {

  /** K1: CSV overwrite — header, UTF-8; `quoteAll` mirrors
    * csv.QUOTE_ALL (fetch_gsheet_instructions.py:56-62).
    */
  def csvOverwrite(df: DataFrame, path: String, quoteAll: Boolean = false): Unit =
    df.write.mode(SaveMode.Overwrite)
      .option("header", "true")
      .option("quoteAll", quoteAll.toString)
      .option("escape", "\"")
      .csv(path)

  /** K1 variant: utf-8-sig — Excel-compatible BOM on every part file
    * (create_yougile_dataset.ipynb cell 7 to_csv(encoding='utf-8-sig')).
    * The BOM is prepended to the first column header.
    */
  def csvOverwriteWithBom(df: DataFrame, path: String): Unit = {
    val first = df.columns.head
    df.withColumnRenamed(first, "﻿" + first)
      .write.mode(SaveMode.Overwrite)
      .option("header", "true").option("escape", "\"")
      .csv(path)
  }

  /** K2: append with header-on-create semantics. A single growing CSV
    * is an anti-pattern at scale — each append lands as new part
    * files; readers see one logical table (the reference's
    * to_csv(mode='a') | fetch_asterisk_cdr.py:68).
    */
  def csvAppend(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Append)
      .option("header", "true").option("escape", "\"")
      .csv(path)

  /** K3: JSON write (fetch_yougile_programming.py:327-331). */
  def jsonWrite(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Overwrite).json(path)

  /** K4: JDBC full-replace — Spark derives DDL from the schema,
    * exactly like the reference's head(0).to_sql(if_exists='replace')
    * two-phase load (create_gitlab_dataset.ipynb cell 9).
    */
  def jdbcFullReplace(df: DataFrame, url: String, table: String,
      props: java.util.Properties, batchSize: Int = 5000): Unit =
    df.write.mode(SaveMode.Overwrite)
      .option("truncate", "false")
      .option("batchsize", batchSize)
      .jdbc(url, table, props)

  /** K6 (first half): the anti-join that finds fact keys missing from
    * a mapping dimension (create_gitlab_dataset.ipynb cell 5-6,
    * create_yougile_dataset.ipynb cells 4-5). The survivors are
    * dimension-writeback candidates — small by construction, safe to
    * collect for the driver-side sheet append.
    */
  def unmappedKeys(facts: DataFrame, mapping: DataFrame,
      factKey: String, mappingKey: String): DataFrame =
    facts.select(factKey).distinct()
      .join(mapping.select(col(mappingKey).as(factKey)), Seq(factKey), "left_anti")

  /** K6 (second half): force the writeback *action* before the
    * enrichment join is planned — Spark's laziness must not reorder
    * the side effect (SURVEY.md §7.5 #5). `append` receives collected
    * rows (the sheet API boundary); returns how many were written.
    */
  def writebackUnmapped(unmapped: DataFrame,
      append: Seq[org.apache.spark.sql.Row] => Unit): Long = {
    val rows = unmapped.collect()
    if (rows.nonEmpty) append(rows.toSeq)
    rows.length.toLong
  }
}
