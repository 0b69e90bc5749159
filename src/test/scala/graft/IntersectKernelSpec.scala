package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Direct property tests for the sorted-merge intersection kernels: the
  * oracle queries exercise them end-to-end, but these pin the contract
  * (equality with array_intersect on sorted deduped inputs) against
  * regressions independently of any query's data distribution. */
class IntersectKernelSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("SortedIntersectSize equals size(array_intersect) on random sorted string sets") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val rnd = new scala.util.Random(5)
    def randSet() = Seq.fill(rnd.nextInt(30))(
      Seq.fill(rnd.nextInt(6) + 1)(('a' + rnd.nextInt(4)).toChar).mkString)
      .distinct.sorted
    val rows = Seq.fill(500)((randSet(), randSet()))
    val df = rows.toDF("a", "b")
      .withColumn("expected", size(array_intersect($"a", $"b")))
      .withColumn("got", graft.plans.VectorExpressions.sortedIntersectSize($"a", $"b"))
    assert(df.filter($"expected" =!= $"got").count() == 0)
  }

  test("SortedLongIntersectSize equals size(array_intersect) on random sorted long sets") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val rnd = new scala.util.Random(9)
    def randSet() = Seq.fill(rnd.nextInt(40))(rnd.nextInt(60).toLong).distinct.sorted
    val rows = Seq.fill(500)((randSet(), randSet()))
    val df = rows.toDF("a", "b")
      .withColumn("expected", size(array_intersect($"a", $"b")))
      .withColumn("got", graft.plans.VectorExpressions.sortedLongIntersectSize($"a", $"b"))
    assert(df.filter($"expected" =!= $"got").count() == 0)
    // empty vs non-empty and identical sets
    val edge = Seq((Seq.empty[Long], Seq(1L, 2L)), (Seq(1L, 2L), Seq(1L, 2L)))
      .toDF("a", "b")
      .withColumn("got", graft.plans.VectorExpressions.sortedLongIntersectSize($"a", $"b"))
      .select($"got").as[Int].collect().toSeq
    assert(edge == Seq(0, 2))
  }
}
