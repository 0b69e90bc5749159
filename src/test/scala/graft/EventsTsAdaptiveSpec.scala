package graft

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.TimestampNTZType
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{TextAnalysis, TextQueries}

/** Guards the events.ts type contract: the driver testdata has shipped
  * `ts` both as epoch-ns BIGINT (rounds 1–6) and as timestamp[us]
  * (TIMESTAMP_NTZ, round 7+). Every ts-arithmetic query must give
  * bit-identical results on both physical types via
  * [[Tables.tsEpochNanos]] — a future driver schema change must fail
  * HERE, not silently zero the CORRECTNESS rows (round-7 regression).
  */
class EventsTsAdaptiveSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.session.timeZone", "UTC")
    .getOrCreate()

  /** Five events: user 10 has two sessions (gap > 30 min between #3 and
    * #4), user 11 one event on the next UTC day. Epoch-ns values.
    */
  private def baseEvents: DataFrame = {
    import spark.implicits._
    Seq(
      (1L, 1700000000000000000L, 10L, "click", 1.5, "{}"),
      (2L, 1700000000500000000L, 10L, "click", 2.0, "{}"),
      (3L, 1700000002000000000L, 10L, "view", 0.5, "{}"),
      (4L, 1700003600000000000L, 10L, "click", 3.0, "{}"), // +1h → new session
      (5L, 1700090000000000000L, 11L, "view", 4.0, "{}")   // next UTC day
    ).toDF("event_id", "ts", "user_id", "event_type", "value", "props")
  }

  private def writeFixtures(): (String, String) = {
    val longDir = Files.createTempDirectory("graft-ev-long").toString
    val ntzDir = Files.createTempDirectory("graft-ev-ntz").toString
    val base = baseEvents
    base.write.mode("overwrite").parquet(s"$longDir/events.parquet")
    base
      .withColumn("ts",
        timestamp_micros((col("ts") / 1000L).cast("long")).cast(TimestampNTZType))
      .write.mode("overwrite").parquet(s"$ntzDir/events.parquet")
    (longDir, ntzDir)
  }

  import spark.implicits.{newLongEncoder, newProductEncoder}

  test("tsEpochNanos: BIGINT and timestamp[us] fixtures read back identical epochs") {
    val (longDir, ntzDir) = writeFixtures()
    val fromLong = {
      val ev = Tables.events(spark, longDir)
      ev.select(Tables.tsEpochNanos(ev)).as[Long].collect().sorted
    }
    val fromNtz = {
      val ev = Tables.events(spark, ntzDir)
      ev.select(Tables.tsEpochNanos(ev)).as[Long].collect().sorted
    }
    assert(fromLong.sameElements(fromNtz))
    assert(fromLong.head == 1700000000000000000L)
  }

  test("q14 date bucketing: identical and correct on both ts types") {
    val (longDir, ntzDir) = writeFixtures()
    val a = TextQueries.q14DateTrunc(spark, longDir)
      .as[(String, Long, Double)].collect().toSeq
    val b = TextQueries.q14DateTrunc(spark, ntzDir)
      .as[(String, Long, Double)].collect().toSeq
    assert(a == b)
    // 1700000000 = 2023-11-14T22:13:20Z; 1700090000 = 2023-11-15T23:13:20Z
    assert(a == Seq(("2023-11-14", 4L, 7.0), ("2023-11-15", 1L, 4.0)))
  }

  test("q40 sessionization: identical and correct on both ts types") {
    val (longDir, ntzDir) = writeFixtures()
    val a = TextAnalysis.q40Sessionize(spark, longDir)
      .as[(Long, Long, Long)].collect().toSeq
    val b = TextAnalysis.q40Sessionize(spark, ntzDir)
      .as[(Long, Long, Long)].collect().toSeq
    assert(a == b)
    assert(a == Seq((10L, 2L, 4L), (11L, 1L, 1L)))
  }

  test("q14/q40 run green against the driver testdata as shipped") {
    val dir = "/root/testdata/sf0.001"
    assert(TextQueries.q14DateTrunc(spark, dir).count() > 0)
    assert(TextAnalysis.q40Sessionize(spark, dir).count() > 0)
  }
}
