package graft

import graft.operators.JdbcDdl
import graft.sources.{Sinks, Tables}
import org.apache.spark.sql.functions._
import java.sql.DriverManager
import java.util.Properties

/** Live JDBC evidence (S3/S4/K4/K5-DDL) against embedded Derby:
  * full-replace write, plain and partitioned reads, pushed-down scalar
  * query, and the schema-evolution DDL executing for real.
  */
class JdbcSpec extends SparkSpec {
  import spark.implicits._

  private val url = "jdbc:derby:memory:graftdb;create=true"
  private val props = {
    val p = new Properties()
    p.setProperty("driver", "org.apache.derby.jdbc.EmbeddedDriver")
    p
  }

  test("K4 full-replace write then S3 read roundtrips") {
    val df = Seq((1L, "alpha", 1.5), (2L, "beta", 2.5), (3L, "gamma", 3.5))
      .toDF("id", "name", "score")
    Sinks.jdbcFullReplace(df, url, "t_roundtrip", props)
    val back = Tables.jdbc(spark, url, "t_roundtrip", props).orderBy("id")
    assert(back.collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSeq ==
      Seq((1L, "alpha", 1.5), (2L, "beta", 2.5), (3L, "gamma", 3.5)))
  }

  test("S4 partitioned parallel read covers all rows exactly once") {
    val df = (1L to 100L).map(i => (i, s"row_$i")).toDF("id", "payload")
    Sinks.jdbcFullReplace(df, url, "t_part", props)
    val back = Tables.jdbc(spark, url, "t_part", props,
      partitionColumn = Some("id"), numPartitions = 4,
      lowerBound = 1L, upperBound = 101L)
    assert(back.rdd.getNumPartitions == 4)
    assert(back.select(sum("id")).head().getLong(0) == 5050L)
    assert(back.count() == 100)
  }

  test("S9 watermark scalar via pushed-down query option") {
    val df = (1L to 50L).map(i => (i, i * 2.0)).toDF("id", "v")
    Sinks.jdbcFullReplace(df, url, "t_wm", props)
    val wm = spark.read.format("jdbc")
      .option("url", url)
      .option("query", """SELECT max("id") AS wm FROM t_wm""")
      .option("driver", props.getProperty("driver"))
      .load()
    assert(wm.head().getLong(0) == 50L)
  }

  test("K5 DDL: createTable and alterStatements execute on the live database") {
    val conn = DriverManager.getConnection(url)
    try {
      val st = conn.createStatement()
      // the SAME generation path as production, through the Derby
      // dialect — no string surgery
      val create = JdbcDdl.createTable(
        Seq((1L, "x")).toDF("id", "name").schema, "t_evolve", JdbcDdl.Derby)
      st.executeUpdate(create)
      val alters = JdbcDdl.alterStatements(
        Seq((1L, "x")).toDF("id", "name").schema,
        Seq((1L, "x", 9.5)).toDF("id", "name", "score").schema,
        "t_evolve", JdbcDdl.Derby)
      assert(alters.length == 1)
      st.executeUpdate(alters.head)
      val rs = conn.getMetaData.getColumns(null, null, "T_EVOLVE", null)
      val cols = Iterator.continually(rs).takeWhile(_.next())
        .map(_.getString("COLUMN_NAME")).toList
      assert(cols.map(_.toLowerCase).sorted == List("id", "name", "score"))
    } finally conn.close()
  }

  test("K4/K5 Postgres dialect goldens: the reference target's exact DDL") {
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(
      StructField("id", LongType),
      StructField("name", StringType),
      StructField("score", DoubleType),
      StructField("seen_at", TimestampType),
      StructField("local_at", TimestampNTZType),
      StructField("day", DateType),
      StructField("ok", BooleanType),
      StructField("amount", DecimalType(12, 2)),
      StructField("blob", BinaryType),
      StructField("tags", ArrayType(StringType))))
    // text / timestamptz / double precision are what the reference's
    // Postgres tables actually hold (create_projectsync_dataset.ipynb
    // cell 17); instants map to timestamptz, wall clocks to timestamp
    assert(JdbcDdl.createTable(schema, "plugins_ad") ==
      """CREATE TABLE IF NOT EXISTS plugins_ad ("id" BIGINT, "name" TEXT, """ +
      """"score" DOUBLE PRECISION, "seen_at" TIMESTAMPTZ, """ +
      """"local_at" TIMESTAMP, "day" DATE, "ok" BOOLEAN, """ +
      """"amount" NUMERIC(12,2), "blob" BYTEA, "tags" TEXT[])""")
    val alters = JdbcDdl.alterStatements(
      StructType(schema.fields.take(2)), schema, "plugins_ad")
    assert(alters == Seq(
      """ALTER TABLE plugins_ad ADD COLUMN IF NOT EXISTS "score" DOUBLE PRECISION""",
      """ALTER TABLE plugins_ad ADD COLUMN IF NOT EXISTS "seen_at" TIMESTAMPTZ""",
      """ALTER TABLE plugins_ad ADD COLUMN IF NOT EXISTS "local_at" TIMESTAMP""",
      """ALTER TABLE plugins_ad ADD COLUMN IF NOT EXISTS "day" DATE""",
      """ALTER TABLE plugins_ad ADD COLUMN IF NOT EXISTS "ok" BOOLEAN""",
      """ALTER TABLE plugins_ad ADD COLUMN IF NOT EXISTS "amount" NUMERIC(12,2)""",
      """ALTER TABLE plugins_ad ADD COLUMN IF NOT EXISTS "blob" BYTEA""",
      """ALTER TABLE plugins_ad ADD COLUMN IF NOT EXISTS "tags" TEXT[]"""))
    // case-insensitive name match (Postgres folds unquoted ids): a
    // reordered/case-shifted existing schema adds nothing
    assert(JdbcDdl.alterStatements(
      StructType(schema.fields.map(f => f.copy(name = f.name.toUpperCase)).reverse),
      schema, "plugins_ad").isEmpty)
    // Derby golden: the same schema through the test-database dialect
    assert(JdbcDdl.createTable(StructType(schema.fields.take(4)), "t", JdbcDdl.Derby) ==
      """CREATE TABLE t ("id" BIGINT, "name" VARCHAR(32672), """ +
      """"score" DOUBLE, "seen_at" TIMESTAMP)""")
  }
}
