package graft

import org.apache.spark.sql.types._
import graft.sources.Tables

/** Contract over the harness testdata, as loaded through
  * `Tables.table` (the only sanctioned read path).
  *
  * Round 7 taught the shape of this failure: the harness regenerated
  * `/root/testdata` between rounds and flipped `events.ts` from INT64
  * TIMESTAMP(NANOS) to native timestamp[us]; 19 queries then died one
  * by one at analysis time, each with a DATATYPE_MISMATCH that named
  * the symptom, never the cause. This spec is the early-warning line:
  * the NEXT regeneration that renames, drops, or re-types a column
  * fails HERE, in one test whose message says exactly which table and
  * column drifted.
  *
  * Types are asserted by FAMILY, not exact flavor: a timestamp column
  * may surface as TimestampType, TimestampNTZType, or DateType
  * (engine code only ever derives from these — date_trunc/year/
  * unix_micros all accept every flavor), because that drift is benign
  * and the engine absorbs it. A cross-family flip (timestamp→long,
  * int→string) is precisely the round-7 class of break and fails.
  */
class SchemaContractSpec extends SparkSpec {

  private sealed trait Family { def ok(dt: DataType): Boolean }
  private case object Integral extends Family {
    def ok(dt: DataType): Boolean = dt match {
      case _: IntegerType | _: LongType | _: ShortType => true
      case _ => false
    }
  }
  private case object Fractional extends Family {
    def ok(dt: DataType): Boolean = dt match {
      case _: DoubleType | _: FloatType | _: DecimalType => true
      case _ => false
    }
  }
  private case object Text extends Family {
    def ok(dt: DataType): Boolean = dt.isInstanceOf[StringType]
  }
  private case object TimeLike extends Family {
    def ok(dt: DataType): Boolean = dt match {
      case _: TimestampType | _: TimestampNTZType | _: DateType => true
      case _ => false
    }
  }
  private case object FloatVec extends Family {
    def ok(dt: DataType): Boolean = dt match {
      case ArrayType(et, _) => Fractional.ok(et)
      case _ => false
    }
  }

  /** Column names in file order + the family each must stay inside. */
  private val contract: Seq[(String, Seq[(String, Family)])] = Seq(
    "region" -> Seq("r_regionkey" -> Integral, "r_name" -> Text),
    "nation" -> Seq("n_nationkey" -> Integral, "n_name" -> Text,
      "n_regionkey" -> Integral),
    "customer" -> Seq("c_custkey" -> Integral, "c_name" -> Text,
      "c_nationkey" -> Integral, "c_acctbal" -> Fractional,
      "c_mktsegment" -> Text),
    "supplier" -> Seq("s_suppkey" -> Integral, "s_name" -> Text,
      "s_nationkey" -> Integral, "s_acctbal" -> Fractional),
    "part" -> Seq("p_partkey" -> Integral, "p_name" -> Text,
      "p_brand" -> Text, "p_type" -> Text, "p_size" -> Integral,
      "p_retailprice" -> Fractional),
    "orders" -> Seq("o_orderkey" -> Integral, "o_custkey" -> Integral,
      "o_orderstatus" -> Text, "o_totalprice" -> Fractional,
      "o_orderdate" -> TimeLike, "o_orderpriority" -> Text),
    "lineitem" -> Seq("l_orderkey" -> Integral, "l_partkey" -> Integral,
      "l_suppkey" -> Integral, "l_linenumber" -> Integral,
      "l_quantity" -> Fractional, "l_extendedprice" -> Fractional,
      "l_discount" -> Fractional, "l_tax" -> Fractional,
      "l_returnflag" -> Text, "l_linestatus" -> Text,
      "l_shipdate" -> TimeLike),
    "events" -> Seq("event_id" -> Integral, "ts" -> TimeLike,
      "user_id" -> Integral, "event_type" -> Text,
      "value" -> Fractional, "props" -> Text),
    "documents" -> Seq("doc_id" -> Integral, "text" -> Text,
      "lang" -> Text, "source" -> Text, "n_chars" -> Integral),
    "embeddings" -> Seq("vec_id" -> Integral, "embedding" -> FloatVec,
      "label" -> Integral))

  test("every harness table matches the column/type-family contract") {
    val drift = contract.flatMap { case (name, cols) =>
      val schema = Tables.table(spark, sfDir, name).schema
      val nameDrift =
        if (schema.fieldNames.toSeq != cols.map(_._1))
          Seq(s"$name: columns are ${schema.fieldNames.mkString(",")}; " +
            s"contract says ${cols.map(_._1).mkString(",")}")
        else Nil
      val typeDrift = cols.flatMap { case (c, fam) =>
        schema.fields.find(_.name == c) match {
          case Some(f) if !fam.ok(f.dataType) =>
            Some(s"$name.$c: ${f.dataType.simpleString} left family $fam " +
              "(the round-7 class of testdata drift — fix the ingest " +
              "normalization in Tables, then re-pin here)")
          case _ => None
        }
      }
      nameDrift ++ typeDrift
    }
    assert(drift.isEmpty, "testdata drifted:\n" + drift.mkString("\n"))
  }

  test("events.ts always lands as session-TZ TimestampType after normalization") {
    // stricter than TimeLike: downstream window/session/funnel queries
    // assume an instant-bearing timestamp, and normalizeEventsTs's
    // whole job is to deliver exactly this type from ANY encoding
    assert(Tables.table(spark, sfDir, "events")
      .schema("ts").dataType == TimestampType)
  }

  test("every harness table is non-empty at the smoke SF") {
    contract.foreach { case (name, _) =>
      assert(Tables.table(spark, sfDir, name).limit(1).count() == 1L,
        s"$name is empty")
    }
  }
}
