package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, unix_micros}
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

/** Loaders for the driver-provided parquet tables (TESTDATA.md).
  *
  * All tables live flat in one directory per scale factor:
  * `region nation customer supplier part orders lineitem events documents
  * embeddings`. At cluster scale these would be partitioned/bucketed managed
  * tables; reading them through one chokepoint lets us swap layout later
  * without touching query code.
  */
object Tables {
  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def lineitem(s: SparkSession, d: String): DataFrame = table(s, d, "lineitem")
  def orders(s: SparkSession, d: String): DataFrame = table(s, d, "orders")
  def customer(s: SparkSession, d: String): DataFrame = table(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = table(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame = table(s, d, "part")
  def nation(s: SparkSession, d: String): DataFrame = table(s, d, "nation")
  def region(s: SparkSession, d: String): DataFrame = table(s, d, "region")
  def events(s: SparkSession, d: String): DataFrame = table(s, d, "events")

  /** `events.ts` as epoch-nanoseconds, whatever the physical column type.
    *
    * Driver testdata has shipped `ts` both as epoch-ns BIGINT and as
    * `timestamp[us]` (Spark TIMESTAMP_NTZ); queries must not care which.
    * NTZ wall-clock values are interpreted as UTC — every entrypoint pins
    * `spark.sql.session.timeZone` to UTC, so the NTZ→TIMESTAMP cast is
    * value-preserving and matches DuckDB's `epoch_ns(ts)` on naive
    * timestamps. Stays inside whole-stage codegen (no UDF).
    */
  def tsEpochNanos(df: DataFrame): Column = df.schema("ts").dataType match {
    case TimestampType    => unix_micros(col("ts")) * 1000L
    case TimestampNTZType => unix_micros(col("ts").cast(TimestampType)) * 1000L
    case _                => col("ts").cast(LongType)
  }
  def documents(s: SparkSession, d: String): DataFrame = table(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = table(s, d, "embeddings")
}
