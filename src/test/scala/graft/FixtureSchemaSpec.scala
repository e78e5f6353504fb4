package graft

import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Fixture-schema CANARY: the driver regenerates /root/testdata between
  * rounds and has already changed column encodings once (round 6:
  * events.ts went from INT64 TIMESTAMP(NANOS) to plain TIMESTAMP-µs,
  * silently breaking 19 queries at plan time). This suite pins the
  * dtype of every fixture column the engine depends on so a drift fails
  * HERE, loudly, in one place — with a message naming the drifted
  * column — instead of as nineteen scattered AnalysisExceptions.
  *
  * If this is the only red suite after a round boundary, the fixtures
  * changed encoding: update Tables (and the DuckDB twins) first, then
  * these expectations.
  */
class FixtureSchemaSpec extends AnyFunSuite {

  lazy val spark = TestSpark.session
  private val dir = "/root/testdata/sf0.001"

  /** Accepted dtypes per column: a Set because some columns have more
    * than one encoding the engine knowingly tolerates. */
  private def assertSchema(table: String,
                           loaded: StructType,
                           expected: Seq[(String, Set[DataType])]): Unit = {
    assert(loaded.fieldNames.toSeq == expected.map(_._1),
      s"$table fixture columns drifted: loaded ${loaded.fieldNames.mkString(",")} " +
        s"expected ${expected.map(_._1).mkString(",")}")
    expected.foreach { case (name, accepted) =>
      val actual = loaded(name).dataType
      assert(accepted.contains(actual),
        s"FIXTURE DRIFT: $table.$name loaded as $actual, engine expects one of " +
          s"${accepted.mkString("{", ", ", "}")} — update graft.Tables (and any " +
          "DuckDB oracle twin) for the new encoding, then this expectation")
    }
  }

  private def one(t: DataType): Set[DataType] = Set(t)

  test("events: ts must be a known encoding and normalize to (ts_us long, ts timestamp)") {
    // the raw column may be any encoding Tables.normalizeEventsTs knows
    val raw = spark.read.parquet(s"$dir/events.parquet").schema
    assertSchema("events", raw, Seq(
      "event_id" -> one(LongType),
      "ts" -> Set(LongType, TimestampNTZType, TimestampType), // see Tables.events scaladoc
      "user_id" -> one(LongType),
      "event_type" -> one(StringType),
      "value" -> one(DoubleType),
      "props" -> one(StringType)))
    // and the normalized frame must ALWAYS present the canonical shape
    val norm = Tables.events(spark, dir).schema
    assert(norm("ts_us").dataType == LongType,
      s"Tables.events.ts_us must be long, got ${norm("ts_us").dataType}")
    assert(norm("ts").dataType == TimestampType,
      s"Tables.events.ts must be TIMESTAMP-µs, got ${norm("ts").dataType}")
    // normalization must be value-correct, not just type-correct: the
    // fixture covers Jan 2024 event time (pre-1970 or year-2400 values
    // would mean a unit mix-up that types alone cannot catch)
    val (lo, hi) = (1500000000000000L, 2500000000000000L) // ~2017..2049 in µs
    val row = Tables.events(spark, dir)
      .selectExpr("min(ts_us)", "max(ts_us)", "min(unix_micros(ts))").head()
    assert(row.getLong(0) >= lo && row.getLong(1) <= hi,
      s"events.ts_us out of plausible epoch-µs range: ${row.getLong(0)}..${row.getLong(1)} " +
        "— the loader is scaling the new encoding wrong (ns/ms/µs mix-up)")
    assert(row.getLong(2) == row.getLong(0),
      "events.ts and ts_us disagree — normalization drift")
  }

  test("relational tables: column names and dtypes are what the oracles assume") {
    def load(t: String) = spark.read.parquet(s"$dir/$t.parquet").schema
    // timestamp-bearing columns accept NTZ or TZ (session is UTC either way)
    val anyTs: Set[DataType] = Set(TimestampNTZType, TimestampType)
    assertSchema("region", load("region"), Seq(
      "r_regionkey" -> one(IntegerType), "r_name" -> one(StringType)))
    assertSchema("nation", load("nation"), Seq(
      "n_nationkey" -> one(IntegerType), "n_name" -> one(StringType),
      "n_regionkey" -> one(IntegerType)))
    assertSchema("customer", load("customer"), Seq(
      "c_custkey" -> one(LongType), "c_name" -> one(StringType),
      "c_nationkey" -> one(IntegerType), "c_acctbal" -> one(DoubleType),
      "c_mktsegment" -> one(StringType)))
    assertSchema("supplier", load("supplier"), Seq(
      "s_suppkey" -> one(LongType), "s_name" -> one(StringType),
      "s_nationkey" -> one(IntegerType), "s_acctbal" -> one(DoubleType)))
    assertSchema("part", load("part"), Seq(
      "p_partkey" -> one(LongType), "p_name" -> one(StringType),
      "p_brand" -> one(StringType), "p_type" -> one(StringType),
      "p_size" -> one(IntegerType), "p_retailprice" -> one(DoubleType)))
    assertSchema("orders", load("orders"), Seq(
      "o_orderkey" -> one(LongType), "o_custkey" -> one(LongType),
      "o_orderstatus" -> one(StringType), "o_totalprice" -> one(DoubleType),
      "o_orderdate" -> anyTs, "o_orderpriority" -> one(StringType)))
    assertSchema("lineitem", load("lineitem"), Seq(
      "l_orderkey" -> one(LongType), "l_partkey" -> one(LongType),
      "l_suppkey" -> one(LongType), "l_linenumber" -> one(IntegerType),
      "l_quantity" -> one(DoubleType), "l_extendedprice" -> one(DoubleType),
      "l_discount" -> one(DoubleType), "l_tax" -> one(DoubleType),
      "l_returnflag" -> one(StringType), "l_linestatus" -> one(StringType),
      "l_shipdate" -> anyTs))
  }

  test("corpus tables: documents and embeddings keep their contract") {
    def load(t: String) = spark.read.parquet(s"$dir/$t.parquet").schema
    assertSchema("documents", load("documents"), Seq(
      "doc_id" -> one(LongType), "text" -> one(StringType),
      "lang" -> one(StringType), "source" -> one(StringType),
      "n_chars" -> one(LongType)))
    assertSchema("embeddings", load("embeddings"), Seq(
      "vec_id" -> one(LongType),
      "embedding" -> one(ArrayType(FloatType, containsNull = true)),
      "label" -> one(IntegerType)))
  }

  test("dq_profile contract covers real columns and agrees with direct counts") {
    // the profiling map is a static two-engine contract — every column
    // it names must exist (drift fails here with the column named)
    val prof = graft.operators.Profiling.dqProfile(spark, dir).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(prof.size == 48, s"expected 48 profiled columns, got ${prof.size}")
    import org.apache.spark.sql.functions._
    val docs = Tables.documents(spark, dir)
    val (n, nd) = (docs.count(), docs.select(col("lang")).distinct().count())
    assert(prof(("documents", "lang")) == (n, 0L, nd))
    val li = Tables.lineitem(spark, dir)
    assert(prof(("lineitem", "l_orderkey")) ==
      (li.count(), 0L, li.select(col("l_orderkey")).distinct().count()))
  }
}
