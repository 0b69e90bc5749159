// operators package for access to private[operators] internals (like PerfProbe)
package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** r19 final-sort tail probe: every registered query ends in a total sort,
  * and the r18 answer-mass checkpoint left the sort machinery itself as
  * the tail (q19 at 32 cores: 3.3 s of its 8.4 s is sample job + range
  * exchange + sort over the already-materialized 5 M-row answer; the
  * ~1 s-floor queries pay a sample job + 32 range-sort tasks for answers
  * of a few thousand rows). Times the candidate final-sort shapes over
  * the SAME checkpointed answer:
  *
  *   v1 orderBy              — current production shape
  *   v2 coalesce(1)+sortWithinPartitions — one task, no sample job, no
  *                             range exchange; total order preserved
  *   v3 repartitionByRange+sortWithinPartitions — same machinery as v1,
  *                             control
  *
  * Tooling only. */
object SortTailProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    def time(label: String)(df: => DataFrame): Unit = {
      val t0 = System.nanoTime()
      val n = df.queryExecution.executedPlan.execute().count()
      println(f"[sort] $label%-44s ${(System.nanoTime() - t0) / 1e9}%8.3f s  rows=$n")
    }
    try graft.SparkEntry.queries("q02_filter_project")(spark, sfDir).count()
    catch { case _: Throwable => () }

    // --- q19-shaped: 5M-row answer ---
    val q19ans = {
      val B = 8
      val p = graft.Tables.part(spark, sfDir).select($"p_brand", $"p_partkey", $"p_name",
        pmod(xxhash64($"p_partkey"), lit(B)).cast("int").as("bkt"))
      val lhs = p.withColumn("pk", explode(expr(s"transform(sequence(bkt, ${B - 1}), j -> bkt * $B + j)")))
        .select($"p_brand", $"pk", $"bkt".as("b1"), $"p_partkey".as("k1"), $"p_name".as("name1"))
      val rhs = p.withColumn("pk", explode(expr(s"transform(sequence(0, bkt), i -> i * $B + bkt)")))
        .select($"p_brand", $"pk", $"bkt".as("b2"), $"p_partkey".as("k2"), $"p_name".as("name2"))
      lhs.join(rhs, Seq("p_brand", "pk"))
        .filter(($"b1" =!= $"b2" && $"k1" =!= $"k2") || $"k1" < $"k2")
        .withColumn("dist", graft.plans.VectorExpressions.lev($"name1", $"name2", 8))
        .filter($"dist" >= 0)
        .select($"p_brand",
          least($"k1", $"k2").cast("long").as("k1"),
          greatest($"k1", $"k2").cast("long").as("k2"),
          $"dist".cast("long").as("dist"))
        .localCheckpoint()
    }
    for (trial <- 1 to 2) {
      time(s"q19 5M v1 orderBy (t$trial)")(
        q19ans.orderBy($"p_brand", $"k1", $"k2"))
      time(s"q19 5M v2 coalesce(1)+swp (t$trial)")(
        q19ans.coalesce(1).sortWithinPartitions($"p_brand", $"k1", $"k2"))
      time(s"q19 5M v3 rbr+swp (t$trial)")(
        q19ans.repartitionByRange(Integer.parseInt(cpus), $"p_brand", $"k1", $"k2")
          .sortWithinPartitions($"p_brand", $"k1", $"k2"))
    }

    // --- small answer (q33-shaped): a few hundred rows ---
    val small = {
      val nBlocks = 4
      val width = 64 / nBlocks
      val sigs = graft.Tables.documents(spark, sfDir)
        .select($"doc_id".cast("long").as("doc_id"),
          filter(split($"text", " "), t => length(t) > lit(0)).as("toks"))
        .filter(size($"toks") > 0)
        .select($"doc_id",
          graft.plans.VectorExpressions.simhash64($"toks").as("sig"))
      val blockCols = (0 until nBlocks).map { b =>
        shiftrightunsigned($"sig", b * width).bitwiseAND(lit((1L << width) - 1))
      }
      val blocked = sigs.select($"doc_id", $"sig",
        posexplode(array(blockCols: _*)).as(Seq("blk", "bv")))
      blocked.as("a").join(blocked.as("b"),
          $"a.blk" === $"b.blk" && $"a.bv" === $"b.bv" && $"a.doc_id" < $"b.doc_id")
        .select($"a.doc_id".as("d1"), $"b.doc_id".as("d2"),
          bit_count($"a.sig".bitwiseXOR($"b.sig")).cast("long").as("dist"))
        .distinct()
        .filter($"dist" <= 3)
        .localCheckpoint()
    }
    for (trial <- 1 to 2) {
      time(s"q33 small v1 orderBy (t$trial)")(small.orderBy($"d1", $"d2"))
      time(s"q33 small v2 coalesce(1)+swp (t$trial)")(
        small.coalesce(1).sortWithinPartitions($"d1", $"d2"))
    }

    // --- mid answer (q12-shaped): 5000 rows, wide strings ---
    val q12ans = {
      import graft.functions.CleaningColumns
      graft.Tables.documents(spark, sfDir)
        .select($"doc_id".cast("long").as("doc_id"),
          CleaningColumns.removeAsciiCol(
            CleaningColumns.normalizeSpacesCol(
              CleaningColumns.normalizeHyphensCol(substring($"text", 1, 60)))).as("norm_prefix"),
          upper($"lang").as("lang_u"))
        .localCheckpoint()
    }
    for (trial <- 1 to 2) {
      time(s"q12 5k v1 orderBy (t$trial)")(q12ans.orderBy($"doc_id"))
      time(s"q12 5k v2 coalesce(1)+swp (t$trial)")(
        q12ans.coalesce(1).sortWithinPartitions($"doc_id"))
    }
    spark.stop()
  }
}
