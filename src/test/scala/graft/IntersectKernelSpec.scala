package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Direct property tests for the native shingle/intersection kernels: the
  * oracle queries exercise them end-to-end, but these pin the contracts
  * (hash-set equivalence with the string-shingle formulation; equality
  * with array_intersect on sorted deduped inputs) against regressions
  * independently of any query's data distribution. */
class IntersectKernelSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

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

  /** The hashed shingle pipeline must be set-equivalent to the string
    * formulation: same per-doc cardinality, same pairwise intersection
    * size (collisions would break the Jaccard oracle; this pins it on a
    * corpus with heavy cross-row overlap, where collisions would bite). */
  test("ShingleHashSet matches string-shingle sets: sizes and pairwise intersections") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val rnd = new scala.util.Random(17)
    val vocab = Vector("the", "a", "cat", "dog", "sat", "on", "mat", "ran", "big", "red")
    // >= 5 tokens: the string formulation errors on shorter docs (slice
    // start 0 via sequence(0,-1)) — prod filtered those before round 6;
    // the kernel's own short-doc behavior is pinned in the edge test below
    def randText() = Seq.fill(5 + rnd.nextInt(20))(vocab(rnd.nextInt(vocab.size))).mkString(" ")
    val docs = Seq.tabulate(300)(i => (i.toLong, randText())).toDF("doc_id", "text")
    for (n <- Seq(2, 5)) {
      val both = docs.select($"doc_id",
        graft.operators.Dedup.shingles($"text", n).as("sh"),
        graft.operators.Dedup.shingleHashes($"text", n).as("hv"))
      assert(both.filter(size($"sh") =!= size($"hv")).count() == 0, s"n=$n sizes")
      val pairs = both.as("a").crossJoin(both.as("b"))
        .withColumn("si", size(array_intersect($"a.sh", $"b.sh")))
        .withColumn("hi", graft.plans.VectorExpressions.sortedLongIntersectSize($"a.hv", $"b.hv"))
      assert(pairs.filter($"si" =!= $"hi").count() == 0, s"n=$n intersections")
    }
    // short-doc edge: fewer than n tokens -> empty hash set
    val short = Seq((0L, "one two")).toDF("doc_id", "text")
      .select(graft.operators.Dedup.shingleHashes($"text", 5).as("hv"))
      .select(size($"hv")).as[Int].collect().head
    assert(short == 0)
  }

  test("SignPack expression equals driver-side sign packing (incl. partial top word)") {
    import spark.implicits._
    val rnd = new scala.util.Random(23)
    val dim = 16
    val nBits = 100 // NOT a multiple of 64 — exercises the partial top word
    val planes = Array.fill(nBits * dim)(rnd.nextGaussian())
    def ref(v: Seq[Double]): Seq[Long] = {
      val out = new Array[Long]((nBits + 63) >>> 6)
      var b = 0
      while (b < nBits) {
        var s = 0.0
        var i = 0
        while (i < dim) { s += planes(b * dim + i) * v(i); i += 1 }
        if (s >= 0) out(b >>> 6) |= (1L << (b & 63))
        b += 1
      }
      out.toSeq
    }
    val vecs = Seq.tabulate(200)(i => (i.toLong, Seq.fill(dim)(rnd.nextGaussian())))
    val got = vecs.toDF("id", "v")
      .withColumn("sg", graft.plans.VectorExpressions.signPack($"v", planes, dim))
      .select($"id", $"sg").as[(Long, Seq[Long])].collect().toMap
    vecs.foreach { case (id, v) => assert(got(id) == ref(v), s"vec $id") }
    // shorter-than-dim vectors use only their leading elements (no OOB)
    val shortV = Seq((0L, Seq.fill(dim / 2)(rnd.nextGaussian())))
    val gotShort = shortV.toDF("id", "v")
      .withColumn("sg", graft.plans.VectorExpressions.signPack($"v", planes, dim))
      .select($"sg").as[Seq[Long]].collect().head
    assert(gotShort == ref(shortV.head._2.padTo(dim, 0.0)))
  }

  test("HammingDistance equals driver-side XOR popcount and the bit_count SQL form") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val rnd = new scala.util.Random(29)
    def randWords() = Seq.fill(4)(rnd.nextLong())
    val rows = Seq.fill(300)((randWords(), randWords())) :+
      (Seq.empty[Long], Seq(1L)) :+ (Seq(-1L, 0L), Seq(-1L, 0L))
    val got = rows.toDF("a", "b")
      .withColumn("got", graft.plans.VectorExpressions.hammingDistance($"a", $"b"))
      .select($"got").as[Int].collect().toSeq
    val expected = rows.map { case (a, b) =>
      a.zip(b).map { case (x, y) => java.lang.Long.bitCount(x ^ y) }.sum
    }
    assert(got == expected)
    val sqlForm = rows.toDF("a", "b")
      .withColumn("e", aggregate(zip_with($"a", $"b", (x, y) => bit_count(x.bitwiseXOR(y))),
        lit(0), (acc, x) => acc + x))
      .withColumn("got", graft.plans.VectorExpressions.hammingDistance($"a", $"b"))
    assert(sqlForm.filter($"e" =!= $"got").count() == 0)
  }

  /** The enforced MinHash overflow domain (a <= 2^31-1, 0 <= b <= 2^31-1,
    * h < 2^32): signatures stay non-negative at the extreme corners AND
    * under the production generator's bounds — the ~0.001% Long headroom
    * means a silently-widened `a` would flip a*h+b negative, which this
    * spec would catch. */
  test("MinHashKernel signatures never go negative across the parameter domain") {
    import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
    val prime = 4294967291L
    // extreme corner: a = b = 2^31-1, h = p-1 — the max of a*h+b
    val corner = graft.plans.MinHashKernel.sig(
      UnsafeArrayData.fromPrimitiveArray(Array(prime - 1, 0L, 123456789L)),
      Array(Int.MaxValue.toLong, 1L), Array(Int.MaxValue.toLong, 0L), prime)
    (0 until corner.numElements()).foreach { i =>
      assert(corner.getLong(i) >= 0, s"negative signature element at corner ($i)")
    }
    assert(Int.MaxValue.toLong * (prime - 1) + Int.MaxValue.toLong > 0,
      "corner product must not wrap (it is within 0.001% of Long.MaxValue)")
    // production tables (via the public signature builder) over random
    // field-valued hashes: all bands*rows elements of every signature >= 0
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val rnd = new scala.util.Random(31)
    val docs = Seq.tabulate(100)(i =>
      (i.toLong, Seq.fill(1 + rnd.nextInt(30))(math.floorMod(rnd.nextLong(), prime))))
    val sigs = docs.toDF("id", "hv")
      .withColumn("sig", graft.operators.Dedup.minhashSignature($"hv", bands = 32, rows = 4))
      .select(array_min($"sig")).as[Long].collect()
    assert(sigs.forall(_ >= 0L), "production minhash signature went negative")
  }
}
