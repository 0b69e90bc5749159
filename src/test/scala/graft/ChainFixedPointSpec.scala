package graft

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import graft.rdf.{ArChains, ChainAnomalies, Vocab}

/** The engine's ONE-chain-semantics law (r13): the reader
  * ([[ArChains.resolveGroup]]) and the repairer
  * ([[ChainAnomalies.repairPlan]]) share [[ArChains.canonicalChain]], so
  *
  *   1. repair is a FIXED POINT of read — re-reading a repaired group
  *      returns the repaired order verbatim;
  *   2. repair is IDEMPOTENT — repairing a repaired store is a no-op;
  *   3. a repaired store is ANOMALY-FREE — all six classes of
  *      [[ChainAnomalies.anomalies]] vanish.
  *
  * Exercised over every corruption shape the reference's own tests and
  * anomaly finder name (hasnext_anomalies.py:131-240): healthy chain,
  * disconnected fragments, full cycle, self-loop, dangling next,
  * multi-next. */
class ChainFixedPointSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.session.timeZone", "UTC")
    .getOrCreate()

  private val B = Vocab.BaseIri

  /** One corrupted store, six (br, role) groups:
    *  br/1 healthy      ar/11 -> ar/12 -> ar/13
    *  br/2 two chains   ar/21 -> ar/22 ; ar/23 (isolated)
    *  br/3 full cycle   ar/31 -> ar/32 -> ar/33 -> ar/31
    *  br/4 self-loop    ar/41 -> ar/41
    *  br/5 dangling     ar/51 -> ar/99 (not in group), ar/52
    *  br/6 multi-next   ar/61 -> {ar/62, ar/63}
    */
  private def corrupted: Seq[(String, String, String, Seq[String])] = Seq(
    ("br/1", "ar/11", "ra/11", Seq("ar/12")),
    ("br/1", "ar/12", "ra/12", Seq("ar/13")),
    ("br/1", "ar/13", "ra/13", Nil),
    ("br/2", "ar/21", "ra/21", Seq("ar/22")),
    ("br/2", "ar/22", "ra/22", Nil),
    ("br/2", "ar/23", "ra/23", Nil),
    ("br/3", "ar/31", "ra/31", Seq("ar/32")),
    ("br/3", "ar/32", "ra/32", Seq("ar/33")),
    ("br/3", "ar/33", "ra/33", Seq("ar/31")),
    ("br/4", "ar/41", "ra/41", Seq("ar/41")),
    ("br/5", "ar/51", "ra/51", Seq("ar/99")),
    ("br/5", "ar/52", "ra/52", Nil),
    ("br/6", "ar/61", "ra/61", Seq("ar/62", "ar/63")),
    ("br/6", "ar/62", "ra/62", Nil),
    ("br/6", "ar/63", "ra/63", Nil))

  private def triplesOf(
      rows: Seq[(String, String, String, Seq[String])]): DataFrame = {
    val ts = rows.flatMap { case (br, ar, ra, nexts) =>
      Seq(
        Row(s"$B/$br", Vocab.IsDocumentContextFor, s"$B/$ar", null),
        Row(s"$B/$ar", Vocab.WithRole, Vocab.Pro + "author", null),
        Row(s"$B/$ar", Vocab.IsHeldBy, s"$B/$ra", null)) ++
        nexts.map(n => Row(s"$B/$ar", Vocab.HasNext, s"$B/$n", null))
    }
    spark.createDataFrame(
      spark.sparkContext.parallelize(ts, 2),
      StructType(Seq(StructField("s", StringType), StructField("p", StringType),
        StructField("o", StringType), StructField("o_datatype", StringType))))
  }

  /** Apply a repair plan: drop every hasNext triple, add the plan's. */
  private def applyPlan(triples: DataFrame, plan: DataFrame): DataFrame =
    triples.filter(col("p") =!= Vocab.HasNext).unionByName(
      plan.filter(col("next_ar").isNotNull)
        .select(col("ar").as("s"), lit(Vocab.HasNext).as("p"),
          col("next_ar").as("o"), lit(null).cast("string").as("o_datatype")))

  private def planOrders(plan: DataFrame): Map[(String, String), Seq[String]] =
    plan.collect()
      .map(r => (r.getAs[String]("br"), r.getAs[String]("role"),
        r.getAs[String]("ar"), r.getAs[String]("next_ar")))
      .groupBy(e => (e._1, e._2))
      .map { case (k, edges) =>
        val next = edges.map(e => e._3 -> Option(e._4)).toMap
        val start = (next.keySet -- next.values.flatten).head
        val order = Iterator.iterate(Option(start))(c => c.flatMap(next(_)))
          .takeWhile(_.isDefined).map(_.get).toSeq
        k -> order
      }

  private lazy val store = triplesOf(corrupted).cache()
  private lazy val plan = ChainAnomalies.repairPlan(store).toDF().cache()
  private lazy val repaired = applyPlan(store, plan).cache()

  test("repair linearizes every group (plan orders are total and expected)") {
    val orders = planOrders(plan)
    def ord(br: String) = orders((s"$B/$br", "author")).map(_.stripPrefix(s"$B/"))
    assert(ord("br/1") == Seq("ar/11", "ar/12", "ar/13"))
    assert(ord("br/2") == Seq("ar/21", "ar/22", "ar/23"))
    assert(ord("br/3") == Seq("ar/31", "ar/32", "ar/33"))
    assert(ord("br/4") == Seq("ar/41"))
    assert(ord("br/5") == Seq("ar/51", "ar/52"))
    assert(ord("br/6") == Seq("ar/61", "ar/62", "ar/63"))
  }

  test("fixed point: reading a repaired store returns the repaired order") {
    val brAr = repaired.filter(col("p") === Vocab.IsDocumentContextFor)
      .select(col("s").as("br"), col("o").as("ar"))
    val arRole = repaired.filter(col("p") === Vocab.WithRole)
      .select(col("s").as("ar"), col("o").as("role"))
    val arRa = repaired.filter(col("p") === Vocab.IsHeldBy)
      .select(col("s").as("ar"), col("o").as("ra"))
    val next = repaired.filter(col("p") === Vocab.HasNext)
      .select(col("s").as("ar"), col("o").as("next_ar"))
    val read = ArChains.resolve(brAr, arRole, arRa, next).collect()
      .map(r => (r.getAs[String]("br"), r.getAs[Long]("pos"), r.getAs[String]("ar")))
      .groupBy(_._1).map { case (br, rs) =>
        br -> rs.sortBy(_._2).map(_._3).toSeq
      }
    val expected = planOrders(plan).map { case ((br, _), o) => br -> o }
    assert(read == expected,
      "the reader must walk a repaired group into exactly the repaired order")
  }

  test("idempotence: repairing a repaired store is a no-op") {
    val again = ChainAnomalies.repairPlan(repaired).toDF()
    assert(again.collect().toSet == plan.collect().toSet)
  }

  test("a repaired store is anomaly-free (all six classes)") {
    assert(ChainAnomalies.anomalies(store).count() > 0,
      "the corrupted store must trip the finder (sanity)")
    assert(ChainAnomalies.anomalies(repaired).isEmpty)
  }
}
