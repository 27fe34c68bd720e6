package graft

import org.apache.spark.sql.types._

/** Driver-testdata schema canary.
  *
  * The driver REGENERATES `/root/testdata` between rounds, and the parquet
  * logical types are not a stable contract: the round-7 regeneration
  * switched `events.ts` from TIMESTAMP(NANOS) to TIMESTAMP(MICROS) and 54
  * catalog queries failed analysis — discovered from a broken benchmark
  * artifact instead of a failing test. This spec pins every table's column
  * NAMES exactly and each column's type to the FAMILY the engine's loaders
  * and casts are known to absorb (integral / fractional / timestamp-or-
  * ns-long / string / float-array), so the next silent regeneration shift
  * fails here, loudly, with a per-column diff.
  *
  * Deliberately tolerant within a family: `Tables.normalizeEventTs` accepts
  * ns-long AND timestamp encodings of `events.ts`; joins and arithmetic are
  * indifferent to int32 vs int64 keys; lenient casts absorb float vs
  * double. A NAME change or a cross-family change (e.g. a date becoming a
  * string) is exactly what the catalog cannot absorb — that is what fails.
  */
class SchemaCanarySpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private val integral: Set[DataType] = Set(IntegerType, LongType, ShortType)
  private val fractional: Set[DataType] = Set(FloatType, DoubleType)
  private val temporal: Set[DataType] =
    Set(DateType, TimestampType, TimestampNTZType)
  // events.ts additionally admits the raw ns-long encoding (nanosAsLong)
  private val temporalOrNsLong: Set[DataType] = temporal + LongType
  private val str: Set[DataType] = Set(StringType)

  private def arrayOfFractional(dt: DataType): Boolean = dt match {
    case ArrayType(et, _) => fractional.contains(et)
    case _ => false
  }

  private val expected: Map[String, Seq[(String, DataType => Boolean)]] = Map(
    "region" -> Seq(
      "r_regionkey" -> integral.contains _, "r_name" -> str.contains _),
    "nation" -> Seq(
      "n_nationkey" -> integral.contains _, "n_name" -> str.contains _,
      "n_regionkey" -> integral.contains _),
    "customer" -> Seq(
      "c_custkey" -> integral.contains _, "c_name" -> str.contains _,
      "c_nationkey" -> integral.contains _,
      "c_acctbal" -> fractional.contains _,
      "c_mktsegment" -> str.contains _),
    "supplier" -> Seq(
      "s_suppkey" -> integral.contains _, "s_name" -> str.contains _,
      "s_nationkey" -> integral.contains _,
      "s_acctbal" -> fractional.contains _),
    "part" -> Seq(
      "p_partkey" -> integral.contains _, "p_name" -> str.contains _,
      "p_brand" -> str.contains _, "p_type" -> str.contains _,
      "p_size" -> integral.contains _,
      "p_retailprice" -> fractional.contains _),
    "orders" -> Seq(
      "o_orderkey" -> integral.contains _, "o_custkey" -> integral.contains _,
      "o_orderstatus" -> str.contains _,
      "o_totalprice" -> fractional.contains _,
      "o_orderdate" -> temporal.contains _,
      "o_orderpriority" -> str.contains _),
    "lineitem" -> Seq(
      "l_orderkey" -> integral.contains _, "l_partkey" -> integral.contains _,
      "l_suppkey" -> integral.contains _,
      "l_linenumber" -> integral.contains _,
      "l_quantity" -> fractional.contains _,
      "l_extendedprice" -> fractional.contains _,
      "l_discount" -> fractional.contains _, "l_tax" -> fractional.contains _,
      "l_returnflag" -> str.contains _, "l_linestatus" -> str.contains _,
      "l_shipdate" -> temporal.contains _),
    "events" -> Seq(
      "event_id" -> integral.contains _, "ts" -> temporalOrNsLong.contains _,
      "user_id" -> integral.contains _, "event_type" -> str.contains _,
      "value" -> fractional.contains _, "props" -> str.contains _),
    "documents" -> Seq(
      "doc_id" -> integral.contains _, "text" -> str.contains _,
      "lang" -> str.contains _, "source" -> str.contains _,
      "n_chars" -> integral.contains _),
    "embeddings" -> Seq(
      "vec_id" -> integral.contains _,
      "embedding" -> (arrayOfFractional _),
      "label" -> integral.contains _)
  )

  test("driver testdata schemas match the families the engine absorbs") {
    val problems = Tables.names.flatMap { t =>
      val actual = Tables.load(spark, dir, t).schema
      // a table the canary map doesn't know must surface as a diff line,
      // not a NoSuchElementException that hides the per-column report
      val exp = expected.getOrElse(t, Seq.empty)
      if (exp.isEmpty)
        Seq(s"$t: table missing from the canary's expected-schema map — " +
          "add its column families here")
      else {
      val nameDiff =
        if (actual.fieldNames.toSeq == exp.map(_._1)) Nil
        else Seq(s"$t: columns ${actual.fieldNames.toSeq} != expected ${exp.map(_._1)}")
      val typeDiff = exp.flatMap { case (name, ok) =>
        actual.fields.find(_.name == name) match {
          case Some(f) if ok(f.dataType) => Nil
          case Some(f) => Seq(
            s"$t.$name: ${f.dataType.simpleString} outside the absorbed family " +
              "— extend the loader normalization (see Tables.normalizeEventTs) " +
              "or this canary, and re-verify the oracle gate")
          case None => Nil // covered by nameDiff
        }
      }
      nameDiff ++ typeDiff
      }
    }
    assert(problems.isEmpty, problems.mkString("\n"))
  }

  test("normalizeEventTs yields the ns-long + ts_utc contract on live data") {
    val ev = Tables.events(spark, dir)
    assert(ev.schema("ts").dataType == LongType)
    assert(ev.schema("ts_utc").dataType == TimestampType)
    val r = ev.selectExpr("min(ts)", "max(ts)", "count(*)").head()
    // 2020-2030 sanity window in ns-since-epoch: catches a unit mix-up
    // (µs read as ns would land in 1970) without pinning fixture content
    assert(r.getLong(2) > 0)
    assert(r.getLong(0) > 1577836800L * 1000000000L,
      s"events.ts min ${r.getLong(0)} is not ns-since-epoch scale")
    assert(r.getLong(1) < 1893456000L * 1000000000L,
      s"events.ts max ${r.getLong(1)} is not ns-since-epoch scale")
  }
}
