package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode}

/** Physical data layout for the 100 TB path.
  *
  * Facts land as date-partitioned parquet so time-ranged scans prune
  * whole directories (the incremental-append pattern writes only new
  * partitions), and frequently-joined tables are bucketed on the join
  * key so the join is co-located — no exchange on either side at any
  * scale. Both are plain Spark writers; the value is the declared
  * convention plus the plan-shape tests in LayoutSpec that prove the
  * pruning/no-shuffle properties hold.
  */
object Layout {

  /** Date/low-cardinality partitioned fact layout. Partition columns
    * become directories — a filter on them never touches excluded
    * files (PartitionFilters, not data filters).
    */
  def writePartitioned(df: DataFrame, path: String, partitionCols: String*): Unit =
    df.write.mode(SaveMode.Overwrite).partitionBy(partitionCols: _*).parquet(path)

  /** Bucketed + sorted table for co-located equi-joins: both sides
    * hashed into the same bucket count on the join key at write time,
    * so the join plan has no Exchange. Buckets also serve as the
    * pre-shuffle for groupBy on the key.
    */
  def writeBucketed(df: DataFrame, table: String, key: String,
      numBuckets: Int = 32): Unit =
    df.write.mode(SaveMode.Overwrite)
      .bucketBy(numBuckets, key).sortBy(key)
      .format("parquet").saveAsTable(table)

  /** Range-clustered layout for point/range predicates on a
    * high-cardinality column (timestamps, ids) that is too fine to
    * directory-partition: `repartitionByRange` makes every output
    * file own a disjoint key range and the within-partition sort
    * tightens each parquet ROW GROUP's min/max to a narrow slice, so
    * a pushed-down range predicate skips whole row groups at the
    * footer — the scan reads (and emits) only the matching slice of
    * the table instead of every row. This is the single-column
    * z-order special case, and the right clustering for "one range
    * dimension dominates the workload"; LayoutSpec proves the skip by
    * comparing scan-emitted row counts against a shuffled layout of
    * the same data.
    */
  def writeRangeClustered(df: DataFrame, path: String, key: String,
      files: Int = 32): Unit = {
    import org.apache.spark.sql.functions.col
    df.repartitionByRange(files, col(key))
      .sortWithinPartitions(key)
      .write.mode(SaveMode.Overwrite).parquet(path)
  }
}
