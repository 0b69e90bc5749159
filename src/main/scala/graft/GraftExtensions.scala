package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import graft.plans.VectorExpressions

/** SparkSessionExtensions entry point: registers the engine's native
  * expressions and cleaning UDF-style functions for SQL users.
  *
  *   SparkSession.builder().withExtensions(new GraftExtensions) ...
  *   -- or --
  *   spark.sql.extensions=graft.GraftExtensions
  *
  * After registration:
  *   SELECT graft_dot(a.embedding, b.embedding) ...
  *   SELECT graft_clean_date(pub_date), graft_normalize_id(id) ...
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def info(name: String, usage: String) =
    new ExpressionInfo("graft", null, name, usage, "")

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((FunctionIdentifier("graft_dot"),
      info("graft_dot", "graft_dot(a, b) - dot product of two double arrays"),
      (args: Seq[Expression]) => VectorExpressions.DotProduct(args(0), args(1))))
    ext.injectFunction((FunctionIdentifier("graft_cosine"),
      info("graft_cosine", "graft_cosine(a, b) - cosine similarity of two double arrays"),
      (args: Seq[Expression]) => {
        import org.apache.spark.sql.catalyst.expressions.{Divide, Multiply, Sqrt}
        Divide(VectorExpressions.DotProduct(args(0), args(1)),
          Multiply(Sqrt(VectorExpressions.DotProduct(args(0), args(0))),
            Sqrt(VectorExpressions.DotProduct(args(1), args(1)))))
      }))
    ext.injectFunction((FunctionIdentifier("graft_hamming"),
      info("graft_hamming",
        "graft_hamming(a, b) - Hamming distance between packed-bit long arrays"),
      (args: Seq[Expression]) => VectorExpressions.HammingDistance(args(0), args(1))))
    ext.injectFunction((FunctionIdentifier("graft_levenshtein"),
      info("graft_levenshtein",
        "graft_levenshtein(a, b) - Myers bit-parallel Levenshtein distance"),
      (args: Seq[Expression]) =>
        VectorExpressions.BitParallelLevenshtein(args(0), args(1), -1)))
  }
}

/** Session-level registration of the scalar cleaning functions (UDFs carry
  * their own registration path — callable from SQL after this). */
object GraftFunctions {

  /** Register the native expressions on an ALREADY-RUNNING session (the
    * builder-time `withExtensions` path doesn't apply to a session
    * obtained from getOrCreate reuse). */
  def registerNative(spark: org.apache.spark.sql.SparkSession): Unit = {
    import org.apache.spark.sql.catalyst.expressions.{Divide, Multiply, Sqrt}
    val reg = spark.sessionState.functionRegistry
    reg.createOrReplaceTempFunction("graft_dot",
      args => VectorExpressions.DotProduct(args(0), args(1)), "scala_udf")
    reg.createOrReplaceTempFunction("graft_cosine",
      args => Divide(VectorExpressions.DotProduct(args(0), args(1)),
        Multiply(Sqrt(VectorExpressions.DotProduct(args(0), args(0))),
          Sqrt(VectorExpressions.DotProduct(args(1), args(1))))), "scala_udf")
    reg.createOrReplaceTempFunction("graft_hamming",
      args => VectorExpressions.HammingDistance(args(0), args(1)), "scala_udf")
    reg.createOrReplaceTempFunction("graft_levenshtein",
      args => VectorExpressions.BitParallelLevenshtein(args(0), args(1), -1),
      "scala_udf")
  }

  def register(spark: org.apache.spark.sql.SparkSession): Unit = {
    import graft.functions.Cleaning
    spark.udf.register("graft_clean_date",
      (s: String) => if (s == null) null else Cleaning.cleanDate(Cleaning.normalizeHyphens(s)))
    spark.udf.register("graft_clean_title",
      (s: String) => if (s == null) null else Cleaning.cleanTitle(s))
    spark.udf.register("graft_clean_name",
      (s: String) => if (s == null) null else Cleaning.cleanName(s))
    spark.udf.register("graft_normalize_id",
      (s: String) => if (s == null) null else Cleaning.normalizeId(s).orNull)
    spark.udf.register("graft_normalize_hyphens",
      (s: String) => if (s == null) null else Cleaning.normalizeHyphens(s))
    spark.udf.register("graft_simhash",
      (s: String) => if (s == null) 0L
      else graft.operators.Dedup.simhash64(s.split(" ").filter(_.nonEmpty).toSeq))
  }
}
