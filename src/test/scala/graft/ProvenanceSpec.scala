package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import graft.curation.Curator
import graft.rdf.Provenance

/** R3/J10/G8 specs: SCD2 snapshot lifecycle and merge derivation. */
class ProvenanceSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  lazy val batch = Curator.curateFresh(
    Curator.readInput(spark, "/root/reference/example_metadata.csv"))

  test("fresh snapshots: one open snapshot per minted entity") {
    import spark.implicits._
    val prov = Provenance.freshSnapshots(batch, "2026-08-12T00:00:00Z")
    val n = prov.count()
    assert(n == Provenance.allEntities(batch).count())
    assert(prov.filter($"invalidated_at".isNotNull).count() == 0)
    assert(prov.select($"snapshot_n").distinct().collect().map(_.getLong(0)).toSeq == Seq(1L))
  }

  test("upsert closes previous snapshots and renumbers new ones") {
    import spark.implicits._
    val t1 = Provenance.freshSnapshots(batch, "2026-08-12T00:00:00Z")
    // second batch touches one entity
    val touched = t1.limit(1).select($"entity").collect().head.getString(0)
    val incoming = spark.createDataFrame(Seq(
      (touched, 1L, "2026-08-13T00:00:00Z", null.asInstanceOf[String],
        Seq.empty[String], "Entity updated", "pa/1")))
      .toDF("entity", "snapshot_n", "generated_at", "invalidated_at",
        "derived_from", "description", "attributed_to")
    val merged = Provenance.upsert(t1, incoming, "2026-08-13T00:00:00Z")
    val snaps = merged.filter($"entity" === touched).orderBy($"snapshot_n").collect()
    assert(snaps.length == 2)
    assert(snaps(0).getLong(1) == 1L && snaps(0).getAs[String]("invalidated_at") != null)
    assert(snaps(1).getLong(1) == 2L && snaps(1).getAs[String]("invalidated_at") == null)
    // untouched entities unchanged
    assert(merged.filter($"invalidated_at".isNull).count() == t1.count())
  }

  test("repeated upserts preserve full SCD2 history of a touched entity") {
    import spark.implicits._
    val t1 = Provenance.freshSnapshots(batch, "2026-08-12T00:00:00Z")
    val touched = t1.limit(1).select($"entity").collect().head.getString(0)
    def update(day: Int) = spark.createDataFrame(Seq(
      (touched, 1L, s"2026-08-1${day}T00:00:00Z", null.asInstanceOf[String],
        Seq.empty[String], s"Entity updated $day", "pa/1")))
      .toDF("entity", "snapshot_n", "generated_at", "invalidated_at",
        "derived_from", "description", "attributed_to")
    val t2 = Provenance.upsert(t1, update(3), "2026-08-13T00:00:00Z")
    val t3 = Provenance.upsert(t2, update(4), "2026-08-14T00:00:00Z")
    val snaps = t3.filter($"entity" === touched).orderBy($"snapshot_n").collect()
    assert(snaps.map(_.getLong(1)).toSeq == Seq(1L, 2L, 3L),
      "all three snapshots must survive the second upsert")
    assert(snaps.init.forall(_.getAs[String]("invalidated_at") != null))
    assert(snaps.last.getAs[String]("invalidated_at") == null)
    // closed-at stamps remain those of the upsert that closed each snapshot
    assert(snaps(0).getAs[String]("invalidated_at") == "2026-08-13T00:00:00Z")
    assert(snaps(1).getAs[String]("invalidated_at") == "2026-08-14T00:00:00Z")
    // total row count: every entity still has its rows
    assert(t3.count() == t1.count() + 2)
  }

  test("merge snapshot derives from survivor and merged entities (G8 readable)") {
    import spark.implicits._
    val t1 = Provenance.freshSnapshots(batch, "2026-08-12T00:00:00Z")
    val Array(a, b) = t1.orderBy($"entity").limit(2).select($"entity")
      .collect().map(_.getString(0))
    val after = Provenance.mergeSnapshot(t1, a, Seq(b), "2026-08-14T00:00:00Z")
    val snap = after.filter($"entity" === a && $"invalidated_at".isNull).collect().head
    val derived = snap.getAs[scala.collection.Seq[String]]("derived_from")
    assert(derived.length == 2)
    assert(derived.exists(_.contains(a)) && derived.exists(_.contains(b)))
    // G8: merge pairs recoverable as snapshots with >=2 wasDerivedFrom
    val pairs = after.filter(org.apache.spark.sql.functions.size($"derived_from") >= 2)
    assert(pairs.count() == 1)
  }
}
