package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import graft.curation.ConnectedComponents

/** D1 operator spec: the driver-local union-find arm and the distributed
  * min-label propagation arm must produce identical components. */
class ConnectedComponentsSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  def comps(df: org.apache.spark.sql.DataFrame): Map[Long, Long] =
    df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("local union-find and distributed propagation agree, incl. hash-range ids") {
    import spark.implicits._
    // chain 1-2-3 via shared keys, pair (4,5), isolated 6, plus two
    // full-range xxhash64-style ids sharing a key (the ANSI-overflow case)
    val m = Seq(
      (1L, "a"), (2L, "a"), (2L, "b"), (3L, "b"),
      (4L, "c"), (5L, "c"),
      (6L, "d"),
      (Long.MaxValue - 3, "e"), (Long.MinValue + 7, "e"))
      .toDF("entity", "key")
    val local = comps(ConnectedComponents.byShardKey(m))
    val dist = comps(ConnectedComponents.byShardKey(m, localMaxRows = 0))
    assert(local == dist)
    assert(local(1L) == local(3L) && local(1L) == 1L)
    assert(local(4L) == 5L.min(4L) && local(5L) == 4L)
    assert(local(6L) == 6L)
    assert(local(Long.MaxValue - 3) == (Long.MinValue + 7))
  }

  test("distributed arm still throws at the iteration cap on a long chain") {
    import spark.implicits._
    // a 30-entity path graph has diameter 29; maxIter=2 cannot converge
    val chain = (0 until 29).flatMap(i =>
      Seq((i.toLong, s"k$i"), (i.toLong + 1, s"k$i"))).toDF("entity", "key")
    intercept[IllegalStateException] {
      ConnectedComponents.byShardKey(chain, maxIter = 2, localMaxRows = 0)
    }
    // the local arm handles any diameter without iteration limits
    val local = comps(ConnectedComponents.byShardKey(chain))
    assert(local.values.toSet == Set(0L))
  }
}
