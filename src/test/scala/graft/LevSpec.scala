package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.unsafe.types.UTF8String
import org.scalatest.funsuite.AnyFunSuite

/** Property tests for the bit-parallel Levenshtein kernel: equality with a
  * classic DP reference on random inputs (ASCII and BMP, lengths spanning
  * the 64-unit Myers limit and the fallback), the -1-beyond-threshold
  * contract, and codegen-path equality with Spark's built-in. */
class LevSpec extends AnyFunSuite {

  private def classicDp(a: String, b: String): Int = {
    val m = a.length; val n = b.length
    val d = Array.tabulate(m + 1)(i => i)
    for (j <- 1 to n) {
      var prev = d(0)
      d(0) = j
      for (i <- 1 to m) {
        val cur = d(i)
        d(i) = math.min(math.min(d(i) + 1, d(i - 1) + 1),
          prev + (if (a.charAt(i - 1) == b.charAt(j - 1)) 0 else 1))
        prev = cur
      }
    }
    d(m)
  }

  private def u(s: String) = UTF8String.fromString(s)

  test("matches classic DP on random ASCII strings across the 64-char limit") {
    val rnd = new scala.util.Random(42)
    val alpha = "abcdefg hij"
    for (_ <- 1 to 3000) {
      val a = Seq.fill(rnd.nextInt(80))(alpha(rnd.nextInt(alpha.length))).mkString
      val b = Seq.fill(rnd.nextInt(80))(alpha(rnd.nextInt(alpha.length))).mkString
      val exp = classicDp(a, b)
      assert(graft.plans.Lev.dist(u(a), u(b)) == exp, s"dist('$a','$b')")
    }
  }

  test("matches classic DP on BMP non-ASCII strings") {
    val rnd = new scala.util.Random(7)
    val alpha = "àéîöüßλшя漢字 a"
    for (_ <- 1 to 500) {
      val a = Seq.fill(rnd.nextInt(70))(alpha(rnd.nextInt(alpha.length))).mkString
      val b = Seq.fill(rnd.nextInt(70))(alpha(rnd.nextInt(alpha.length))).mkString
      assert(graft.plans.Lev.dist(u(a), u(b)) == classicDp(a, b), s"dist('$a','$b')")
    }
  }

  test("astral (surrogate-pair) inputs agree with the built-in's code-point semantics") {
    val cases = Seq(("a😀b", "ab"), ("😀", ""),
      ("😀😁", "😀x"), ("x", "😀"))
    for ((a, b) <- cases) {
      assert(graft.plans.Lev.dist(u(a), u(b)) == u(a).levenshteinDistance(u(b)),
        s"dist('$a','$b')")
    }
  }

  test("threshold contract: exact value within, -1 beyond, at every boundary") {
    val rnd = new scala.util.Random(11)
    val alpha = "abcde"
    for (_ <- 1 to 800) {
      val a = Seq.fill(rnd.nextInt(30))(alpha(rnd.nextInt(alpha.length))).mkString
      val b = Seq.fill(rnd.nextInt(30))(alpha(rnd.nextInt(alpha.length))).mkString
      val exp = classicDp(a, b)
      for (t <- 0 to 12) {
        val got = graft.plans.Lev.dist(u(a), u(b), t)
        assert(got == (if (exp > t) -1 else exp), s"dist('$a','$b',$t): got $got, dist $exp")
      }
    }
  }

  test("codegen path equals the built-in levenshtein on part names") {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val p = graft.Tables.part(spark, "/root/testdata/sf0.001")
      .select($"p_partkey", $"p_name")
    val pairs = p.as("a").join(p.as("b"), $"a.p_partkey" % 37 === $"b.p_partkey" % 37)
      .select($"a.p_name".as("x"), $"b.p_name".as("y"))
    val diff = pairs
      .withColumn("builtin", levenshtein($"x", $"y"))
      .withColumn("bp", graft.plans.VectorExpressions.lev($"x", $"y"))
      .withColumn("builtin8", levenshtein($"x", $"y", 8))
      .withColumn("bp8", graft.plans.VectorExpressions.lev($"x", $"y", 8))
      .filter($"builtin" =!= $"bp" || $"builtin8" =!= $"bp8")
      .count()
    assert(diff == 0L)
  }
}
