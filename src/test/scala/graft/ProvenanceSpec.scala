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

  test("provTriples renders the reference's prov JSON-LD shape (PROV-O, exact per row)") {
    import spark.implicits._
    import graft.rdf.Vocab
    // one closed snapshot with two derivations, one open underived one —
    // every branch of the renderer in two rows
    val prov = Seq(
      ("br/0601", 1L, "2026-08-12T00:00:00Z", "2026-08-14T00:00:00Z",
        Seq(s"${Vocab.BaseIri}/br/0601/prov/se/0", s"${Vocab.BaseIri}/br/0602/prov/se/3"),
        "Entity merged with br/0602", "https://w3id.org/oc/meta/prov/pa/1"),
      ("ra/0607", 1L, "2026-08-12T00:00:00Z", null,
        Seq.empty[String], "Entity created", "https://w3id.org/oc/meta/prov/pa/1"))
      .toDF("entity", "snapshot_n", "generated_at", "invalidated_at",
        "derived_from", "description", "attributed_to")
    val t = Provenance.provTriples(prov).collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2), r.getString(3)))
    val s1 = s"${Vocab.BaseIri}/br/0601/prov/se/1"
    val s2 = s"${Vocab.BaseIri}/ra/0607/prov/se/1"
    val expected = Set(
      // closed merge snapshot: full predicate set incl. invalidation + 2 derivations
      (s1, Vocab.RdfType, Vocab.ProvEntity, null),
      (s1, Vocab.SpecializationOf, s"${Vocab.BaseIri}/br/0601", null),
      (s1, Vocab.GeneratedAtTime, "2026-08-12T00:00:00Z", Vocab.XsdDateTime),
      (s1, Vocab.InvalidatedAtTime, "2026-08-14T00:00:00Z", Vocab.XsdDateTime),
      (s1, Vocab.WasDerivedFrom, s"${Vocab.BaseIri}/br/0601/prov/se/0", null),
      (s1, Vocab.WasDerivedFrom, s"${Vocab.BaseIri}/br/0602/prov/se/3", null),
      (s1, Vocab.Description, "Entity merged with br/0602", Vocab.XsdString),
      (s1, Vocab.WasAttributedTo, "https://w3id.org/oc/meta/prov/pa/1", null),
      // open creation snapshot: no invalidatedAtTime, no wasDerivedFrom
      (s2, Vocab.RdfType, Vocab.ProvEntity, null),
      (s2, Vocab.SpecializationOf, s"${Vocab.BaseIri}/ra/0607", null),
      (s2, Vocab.GeneratedAtTime, "2026-08-12T00:00:00Z", Vocab.XsdDateTime),
      (s2, Vocab.Description, "Entity created", Vocab.XsdString),
      (s2, Vocab.WasAttributedTo, "https://w3id.org/oc/meta/prov/pa/1", null))
    assert(t.toSet == expected, "prov triple set must be exact — no extras, no misses")
  }
}
