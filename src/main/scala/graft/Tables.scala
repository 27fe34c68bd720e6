package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

/** Loaders for the driver testdata tables (TESTDATA.md).
  *
  * `events.ts` has shipped in two parquet encodings across testdata
  * generations: TIMESTAMP(NANOS) — which Spark reads as a raw nanosecond
  * `LongType` under `spark.sql.legacy.parquet.nanosAsLong=true` (set by
  * [[GraftSession.tune]]) — and TIMESTAMP(MICROS), which Spark reads as
  * `TIMESTAMP_NTZ`. [[normalizeEventTs]] canonicalizes both to the internal
  * contract every events query assumes: `ts` = ns-since-epoch long (matches
  * DuckDB `epoch_ns(ts)` exactly, since the µs encoding is a whole number of
  * µs) plus a derived µs `ts_utc` TimestampType column. The session timezone
  * is pinned to UTC ([[GraftSession]]), so the NTZ→TZ cast is numerically the
  * identity.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame = load(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame = load(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame = load(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame = load(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame = load(s, d, "lineitem")
  def documents(s: SparkSession, d: String): DataFrame = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")

  /** Events with `ts` as raw ns-since-epoch long plus a µs timestamp view. */
  def events(s: SparkSession, d: String): DataFrame =
    normalizeEventTs(load(s, d, "events"))

  /** Canonicalize `ts` to ns-since-epoch long + add the µs `ts_utc` view,
    * whatever logical type the parquet writer chose (see class doc). Pure
    * column expressions — safe on both batch and streaming DataFrames. */
  def normalizeEventTs(df: DataFrame): DataFrame = {
    val tsNs = df.schema("ts").dataType match {
      case LongType         => col("ts")
      case TimestampNTZType => unix_micros(col("ts").cast(TimestampType)) * lit(1000L)
      case TimestampType    => unix_micros(col("ts")) * lit(1000L)
      case other => throw new IllegalStateException(
        s"events.ts: unsupported parquet logical type $other")
    }
    df.withColumn("ts", tsNs)
      .withColumn("ts_utc", timestamp_micros(expr("ts div 1000")))
  }
}
