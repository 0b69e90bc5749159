package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import graft.curation.Curator
import graft.rdf.{GraphDiff, TriplesEmitter}

/** R2 graph-diff + SQL extension registration specs. */
class ExtensionsSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .withExtensions(new GraftExtensions)
    .getOrCreate()

  test("SQL extensions: graft_dot/graft_cosine resolve and compute") {
    // getOrCreate may reuse another suite's session (builder extensions
    // then don't apply) — the runtime registration path covers both.
    GraftFunctions.registerNative(spark)
    GraftFunctions.register(spark)
    val r = spark.sql(
      "SELECT graft_dot(array(1.0d, 2.0d), array(3.0d, 4.0d)) AS d, " +
        "round(graft_cosine(array(1.0d, 0.0d), array(1.0d, 0.0d)), 6) AS c").head
    assert(r.getDouble(0) == 11.0)
    assert(r.getDouble(1) == 1.0)
    val cleaned = spark.sql(
      "SELECT graft_clean_date('2020-02-50') AS d, graft_normalize_id('issn:0000-0000') AS i").head
    assert(cleaned.getString(0) == "2020-02")
    assert(cleaned.isNullAt(1))
    val kernels = spark.sql(
      "SELECT graft_hamming(array(0L, 7L), array(1L, 4L)) AS h, " +
        "graft_levenshtein('kitten', 'sitting') AS l").head
    assert(kernels.getInt(0) == 3) // xor: 1 (1 bit) + 3 (2 bits)
    assert(kernels.getInt(1) == 3)
  }

  test("R2 graph diff: add/delete sets and round-trip apply") {
    import spark.implicits._
    val batch = Curator.curateFresh(
      Curator.readInput(spark, "/root/reference/example_metadata.csv"))
    val snapshot = TriplesEmitter.emit(batch).localCheckpoint()
    // target: same graph with one title changed and one triple removed
    val victim = snapshot.filter($"p" === graft.rdf.Vocab.Title).limit(1).collect().head
    val target = snapshot
      .withColumn("o", org.apache.spark.sql.functions.when(
        $"s" === victim.getString(0) && $"p" === graft.rdf.Vocab.Title,
        org.apache.spark.sql.functions.lit("New Title")).otherwise($"o"))
      .filter(!($"p" === graft.rdf.Vocab.PublicationDate && $"s" === victim.getString(0)))
    val delta = GraphDiff.diff(snapshot, target)
    assert(delta.additions.count() == 1)   // the new title literal
    assert(delta.deletions.count() == 2)   // old title + removed date
    val applied = GraphDiff.apply(snapshot, delta)
    assert(applied.select("s", "p", "o").except(target.select("s", "p", "o")).count() == 0)
    assert(target.select("s", "p", "o").except(applied.select("s", "p", "o")).count() == 0)
    // update-query text per entity (prov payload)
    val uq = GraphDiff.updateQueries(delta).collect()
    assert(uq.length == 1 && uq.head.getString(1).contains("INSERT DATA")
      && uq.head.getString(1).contains("DELETE DATA"))
  }
}
