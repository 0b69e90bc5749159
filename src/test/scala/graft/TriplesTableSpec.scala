package graft

import java.nio.file.Files
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import graft.curation.Curator
import graft.rdf.{TriplesEmitter, TriplesTable, Vocab}

/** Predicate-partitioned triples layout: round-trip + partition pruning. */
class TriplesTableSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("partitioned store round-trips and prunes to one predicate directory") {
    import spark.implicits._
    val triples = TriplesEmitter.emit(Curator.curateFresh(
      Curator.readInput(spark, "/root/reference/example_metadata.csv")))
      .localCheckpoint()
    val path = Files.createTempDirectory("graft_triples").toString + "/t"
    TriplesTable.write(triples, path)

    val back = TriplesTable.read(spark, path)
    assert(back.count() == triples.count())

    val scan = TriplesTable.scanPredicate(spark, path, Vocab.HasIdentifier)
    val expected = triples.filter($"p" === Vocab.HasIdentifier).count()
    assert(scan.count() == expected)
    // partition pruning: the plan's file scan must carry a PartitionFilters
    // entry on p_bucket (only the has_id directory is read)
    val plan = scan.queryExecution.executedPlan.toString()
    assert(plan.contains("PartitionFilters") && plan.contains("p_bucket"),
      s"expected partition pruning in:\n$plan")
    val prunedDirs = "p_bucket=[a-z_]+".r.findAllIn(plan).toSet
    assert(prunedDirs == Set("p_bucket=has_id") || plan.contains("isnotnull(p_bucket"),
      s"pruning should isolate has_id, plan:\n${plan.take(2000)}")
  }

  test("scanPredicate finds unknown predicates in their hashed bucket") {
    import spark.implicits._
    val custom = "http://example.org/ns#customPredicate"
    val triples = Seq(
      ("https://w3id.org/oc/meta/br/0601", custom, "v1", ""),
      ("https://w3id.org/oc/meta/br/0602", custom, "v2", ""),
      ("https://w3id.org/oc/meta/br/0601", Vocab.Title, "A Title", ""))
      .toDF("s", "p", "o", "o_datatype")
    val path = Files.createTempDirectory("graft_triples_unk").toString + "/t"
    TriplesTable.write(triples, path)
    val scan = TriplesTable.scanPredicate(spark, path, custom)
    assert(scan.count() == 2, "unknown predicate must scan its real hash bucket")
    assert(scan.select($"o").as[String].collect().toSet == Set("v1", "v2"))
  }
}
