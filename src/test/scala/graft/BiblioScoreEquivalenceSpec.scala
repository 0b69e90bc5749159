package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** r18: the single-expression BiblioScore kernel must produce BIT-IDENTICAL
  * IEEE 754 doubles to the pre-r18 Column-tree formulation it replaced
  * (which is itself the association-order contract the DuckDB oracle
  * mirrors). Randomized inputs cover nulls, empties, non-ASCII, astral
  * chars, >64-char strings (the Myers fallback), equal/near/far pairs, and
  * the ISSN short-circuit — plus both the codegen and interpreted
  * expression paths.
  */
class BiblioScoreEquivalenceSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.session.timeZone", "UTC")
    .getOrCreate()

  private val fields = Seq("fam_a", "fam_b", "giv_a", "giv_b", "title_a",
    "title_b", "ven_a", "ven_b", "issn_a", "issn_b", "year_a", "year_b",
    "vol_a", "vol_b", "iss_a", "iss_b", "sp_a", "sp_b", "ep_a", "ep_b")

  private def randomRows(seed: Int, n: Int): Seq[Seq[String]] = {
    val rnd = new scala.util.Random(seed)
    val alphabets = Seq("abcdefghij ", "àéîöüßλшя漢字a ", "a😀b ", "XYZ09 ")
    def rndStr(): String = rnd.nextInt(10) match {
      case 0 => null
      case 1 => ""
      case _ =>
        val a = alphabets(rnd.nextInt(alphabets.length))
        Seq.fill(rnd.nextInt(80))(a(rnd.nextInt(a.length))).mkString
    }
    (1 to n).map { _ =>
      val base = Seq.fill(20)(rndStr())
      // half the rows: force near-match structure (same string or 1 edit)
      // so the non-trivial when-branches (equal ISSNs, matching initials,
      // equal pages) are exercised, not just the random-miss paths
      if (rnd.nextBoolean()) base
      else base.zipWithIndex.map { case (s, i) =>
        if (i % 2 == 1 && base(i - 1) != null && rnd.nextBoolean()) base(i - 1)
        else s
      }
    }
  }

  test("kernel == column tree, bit-exact, codegen path") {
    import spark.implicits._
    val rows = randomRows(seed = 4242, n = 4000)
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(rows.map(org.apache.spark.sql.Row(_: _*)), 4),
      org.apache.spark.sql.types.StructType(fields.map(f =>
        org.apache.spark.sql.types.StructField(f, org.apache.spark.sql.types.StringType))))
    val cols = fields.map(col)
    def args = (cols(0), cols(1), cols(2), cols(3), cols(4), cols(5), cols(6),
      cols(7), cols(8), cols(9), cols(10), cols(11), cols(12), cols(13),
      cols(14), cols(15), cols(16), cols(17), cols(18), cols(19))
    val a = args
    val got = df
      .withColumn("kernel", graft.functions.BiblioMatch.matchingScore(
        a._1, a._2, a._3, a._4, a._5, a._6, a._7, a._8, a._9, a._10,
        a._11, a._12, a._13, a._14, a._15, a._16, a._17, a._18, a._19, a._20))
      .withColumn("tree", graft.functions.BiblioMatch.matchingScoreColumnTree(
        a._1, a._2, a._3, a._4, a._5, a._6, a._7, a._8, a._9, a._10,
        a._11, a._12, a._13, a._14, a._15, a._16, a._17, a._18, a._19, a._20))
      .select($"kernel", $"tree")
      .collect()
    assert(got.length == 4000)
    got.zipWithIndex.foreach { case (r, i) =>
      val k = java.lang.Double.doubleToRawLongBits(r.getDouble(0))
      val t = java.lang.Double.doubleToRawLongBits(r.getDouble(1))
      assert(k == t, s"row $i: kernel ${r.getDouble(0)} != tree ${r.getDouble(1)}")
    }
    // sanity: the workload is not degenerate — some scores are non-zero
    assert(got.exists(_.getDouble(0) > 0.0))
  }

  test("interpreted kernel eval == codegen column tree (cross-path)") {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    val samples = randomRows(seed = 99, n = 300)
    // tree values via the normal (codegen) DataFrame path, one batch
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(
        samples.map(org.apache.spark.sql.Row(_: _*)), 2),
      org.apache.spark.sql.types.StructType(fields.map(f =>
        org.apache.spark.sql.types.StructField(f, org.apache.spark.sql.types.StringType))))
    val c = fields.map(col)
    val treeVals = df.select(graft.functions.BiblioMatch.matchingScoreColumnTree(
      c(0), c(1), c(2), c(3), c(4), c(5), c(6), c(7), c(8), c(9), c(10),
      c(11), c(12), c(13), c(14), c(15), c(16), c(17), c(18), c(19)).as("s"))
      .collect().map(_.getDouble(0))
    // kernel values via the expression's INTERPRETED eval over literals
    samples.zip(treeVals).zipWithIndex.foreach { case ((row, t), i) =>
      val lits = row.map(s => org.apache.spark.sql.catalyst.expressions.Literal
        .create(s, org.apache.spark.sql.types.StringType)
        .asInstanceOf[org.apache.spark.sql.catalyst.expressions.Expression])
      val k = graft.plans.VectorExpressions.BiblioScore(lits)
        .eval(null).asInstanceOf[Double]
      assert(java.lang.Double.doubleToRawLongBits(k) ==
        java.lang.Double.doubleToRawLongBits(t), s"row $i $row: $k != $t")
    }
    // null-safety of the interpreted path is part of its contract
    val allNull = graft.plans.VectorExpressions.BiblioScore(
      Seq.fill(20)(org.apache.spark.sql.catalyst.expressions.Literal
        .create(null, org.apache.spark.sql.types.StringType)
        .asInstanceOf[org.apache.spark.sql.catalyst.expressions.Expression]))
    assert(allNull.eval(null).asInstanceOf[Double] == 0.0)
  }
}
