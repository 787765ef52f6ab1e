package graft

import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/**
 * Testdata schema-drift canary. The driver regenerates
 * /root/testdata/sf* between rounds, and a silent logical-type change can
 * break queries without any test failing at commit time (round 8: events.ts
 * moved from TIMESTAMP(NANOS) to timestamp[us]/TIMESTAMP_NTZ and three gate
 * queries started throwing at analysis time). This spec pins, for every
 * table in TESTDATA.md at every scale factor:
 *   - the exact column names, and
 *   - each column's Spark logical type, with an explicit accepted-alternates
 *     set for the shapes the code normalizes (events.ts may be nanos-Long
 *     under the legacy flag, micros-NTZ, or a proper timestamp).
 * On the next drift this suite goes red naming the table/column/shape.
 */
class SchemaDriftSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private val sfDirs = Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01",
    "/root/testdata/sf0.1")

  /** Accepted logical types per column; first entry is the currently
   *  observed shape. Timestamp-ish columns list every shape the repo's
   *  normalizers handle (Tables.normalizeTs, ParquetEventLog's unit branch).
   */
  private val tsShapes: Set[DataType] = Set(TimestampNTZType, TimestampType, LongType)
  private val expected: Map[String, Seq[(String, Set[DataType])]] = Map(
    "region" -> Seq(
      "r_regionkey" -> Set(IntegerType), "r_name" -> Set(StringType)),
    "nation" -> Seq(
      "n_nationkey" -> Set(IntegerType), "n_name" -> Set(StringType),
      "n_regionkey" -> Set(IntegerType)),
    "customer" -> Seq(
      "c_custkey" -> Set(LongType), "c_name" -> Set(StringType),
      "c_nationkey" -> Set(IntegerType), "c_acctbal" -> Set(DoubleType),
      "c_mktsegment" -> Set(StringType)),
    "supplier" -> Seq(
      "s_suppkey" -> Set(LongType), "s_name" -> Set(StringType),
      "s_nationkey" -> Set(IntegerType), "s_acctbal" -> Set(DoubleType)),
    "part" -> Seq(
      "p_partkey" -> Set(LongType), "p_name" -> Set(StringType),
      "p_brand" -> Set(StringType), "p_type" -> Set(StringType),
      "p_size" -> Set(IntegerType), "p_retailprice" -> Set(DoubleType)),
    "orders" -> Seq(
      "o_orderkey" -> Set(LongType), "o_custkey" -> Set(LongType),
      "o_orderstatus" -> Set(StringType), "o_totalprice" -> Set(DoubleType),
      "o_orderdate" -> tsShapes, "o_orderpriority" -> Set(StringType)),
    "lineitem" -> Seq(
      "l_orderkey" -> Set(LongType), "l_partkey" -> Set(LongType),
      "l_suppkey" -> Set(LongType), "l_linenumber" -> Set(IntegerType),
      "l_quantity" -> Set(DoubleType), "l_extendedprice" -> Set(DoubleType),
      "l_discount" -> Set(DoubleType), "l_tax" -> Set(DoubleType),
      "l_returnflag" -> Set(StringType), "l_linestatus" -> Set(StringType),
      "l_shipdate" -> tsShapes),
    "events" -> Seq(
      "event_id" -> Set(LongType), "ts" -> tsShapes,
      "user_id" -> Set(LongType), "event_type" -> Set(StringType),
      "value" -> Set(DoubleType), "props" -> Set(StringType)),
    "documents" -> Seq(
      "doc_id" -> Set(LongType), "text" -> Set(StringType),
      "lang" -> Set(StringType), "source" -> Set(StringType),
      "n_chars" -> Set(LongType)),
    "embeddings" -> Seq(
      "vec_id" -> Set(LongType),
      "embedding" -> Set(ArrayType(FloatType), ArrayType(FloatType, containsNull = false),
        ArrayType(DoubleType), ArrayType(DoubleType, containsNull = false)),
      "label" -> Set(IntegerType))
  )

  for (dir <- sfDirs) {
    test(s"table logical types unchanged at $dir") {
      // the legacy flag is what SparkTestSession/Verify/Bench run with, so
      // the canary sees the same shapes the queries do
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      expected.foreach { case (table, cols) =>
        val schema = spark.read.parquet(s"$dir/$table.parquet").schema
        assert(schema.fields.map(_.name).toSeq == cols.map(_._1),
          s"$table: column names drifted — got ${schema.fields.map(_.name).mkString(",")}")
        cols.foreach { case (name, accepted) =>
          val got = schema(name).dataType
          assert(accepted.contains(got),
            s"$table.$name: logical type drifted to $got (accepted: ${accepted.mkString(", ")}) — " +
              "if this is a new driver-side regeneration, extend the normalizers " +
              "(Tables.normalizeTs / ParquetEventLog) AND this canary together")
        }
      }
    }
  }

  test("Tables.events normalizes ts to TimestampType at every sf") {
    for (dir <- sfDirs) {
      val df = Tables.events(spark, dir)
      assert(df.schema("ts").dataType == TimestampType,
        s"$dir: Tables.events must present ts as TimestampType")
      // and the values are sane epoch-range instants, not unit-shifted
      val (lo, hi) = {
        val r = df.selectExpr("min(unix_micros(ts))", "max(unix_micros(ts))").head()
        (r.getLong(0), r.getLong(1))
      }
      // accept any timestamp between 2000-01-01 and 2100-01-01 — a
      // nanos/micros/millis unit mix-up lands far outside this window
      assert(lo > 946684800000000L && hi < 4102444800000000L,
        s"$dir: ts out of plausible range [$lo, $hi] — unit drift?")
    }
  }
}
