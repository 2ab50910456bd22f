package graft.sources

import org.apache.spark.sql.types.{DataType, StructField, StructType}

/** Schema-drift guard for bronze ingest (SURVEY.md §7.5 #1): the
  * reference's pandas silently infers and evolves dtypes; here
  * inference is allowed only at ingest, then checked against the
  * declared contract before anything downstream runs. Added columns
  * are tolerated by default (the incremental sink evolves); silently
  * REMOVED or RETYPED columns are the dangerous drift and fail fast.
  */
object SchemaGuard {

  final case class Drift(
      added: Seq[StructField],
      removed: Seq[StructField],
      retyped: Seq[(String, DataType, DataType)]) {
    def isEmpty: Boolean = added.isEmpty && removed.isEmpty && retyped.isEmpty
    def breaking: Boolean = removed.nonEmpty || retyped.nonEmpty
    override def toString: String = Seq(
      if (added.nonEmpty) s"added: ${added.map(_.name).mkString(",")}" else "",
      if (removed.nonEmpty) s"removed: ${removed.map(_.name).mkString(",")}" else "",
      if (retyped.nonEmpty) retyped.map { case (n, e, a) =>
        s"retyped: $n ${e.simpleString}->${a.simpleString}" }.mkString("; ")
      else "").filter(_.nonEmpty).mkString("; ")
  }

  /** Field-by-name comparison (nullability is not drift — parquet and
    * JDBC round-trips flip it freely).
    */
  def diff(expected: StructType, actual: StructType): Drift = {
    val e = expected.fields.map(f => f.name -> f).toMap
    val a = actual.fields.map(f => f.name -> f).toMap
    Drift(
      added = actual.fields.filterNot(f => e.contains(f.name)).toSeq,
      removed = expected.fields.filterNot(f => a.contains(f.name)).toSeq,
      retyped = expected.fields.toSeq.flatMap { f =>
        a.get(f.name).filter(_.dataType != f.dataType)
          .map(g => (f.name, f.dataType, g.dataType))
      })
  }

  /** Fail fast on breaking drift; tolerate additions unless told not
    * to. Returns the drift so callers can log tolerated additions.
    */
  def requireCompatible(expected: StructType, actual: StructType,
      allowAdded: Boolean = true): Drift = {
    val d = diff(expected, actual)
    if (d.breaking || (!allowAdded && d.added.nonEmpty))
      throw new IllegalStateException(s"schema drift: $d")
    d
  }
}
