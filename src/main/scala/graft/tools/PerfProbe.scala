// lives under tools/ but sits in the operators package: the decomposition
// variants call private[operators] funnel internals (biblioMeta,
// lshCandidatePairsRefined, jaccardVerify)
package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

/** r18 optimization-round decomposition probe: times stripped-down
  * variants of the hot fuzzy-match queries so per-pair cost can be
  * attributed to join machinery vs score expression vs the Levenshtein
  * kernel — guide §1's "empirical" loop without a UI in the sandbox.
  * Variants reuse the real operator building blocks; nothing here is a
  * query path (tooling only).
  *
  * Usage: `runMain graft.tools.PerfProbe [sfDir]` */
object PerfProbe {
  private def time(label: String)(df: => DataFrame): Unit = {
    val t0 = System.nanoTime()
    val n = df.queryExecution.executedPlan.execute().count()
    println(f"[probe] $label%-40s ${(System.nanoTime() - t0) / 1e9}%8.3f s  rows=$n")
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    // ---- Lev kernel microbench (no Spark in the loop) ----
    locally {
      val rnd = new scala.util.Random(7)
      val words = Array.fill(1000)(UTF8String.fromString(
        (0 until (6 + rnd.nextInt(6))).map(_ => ('a' + rnd.nextInt(26)).toChar).mkString))
      var sink = 0L
      // warmup
      var i = 0
      while (i < 2000000) { sink += graft.plans.Lev.dist(words(i % 1000), words((i * 7 + 3) % 1000), -1); i += 1 }
      val t0 = System.nanoTime()
      i = 0
      while (i < 10000000) { sink += graft.plans.Lev.dist(words(i % 1000), words((i * 7 + 3) % 1000), -1); i += 1 }
      println(f"[probe] lev kernel 10M calls: ${(System.nanoTime() - t0) / 1e9}%8.3f s (sink=$sink)")
    }

    def warm(): Unit = { // one cheap query to absorb first-query codegen costs
      graft.SparkEntry.queries("q02_filter_project")(spark, sfDir).count()
    }
    warm()

    // ---- q21 decomposition ----
    def biblio = {
      graft.Tables.part(spark, sfDir).select(
        $"p_partkey", $"p_brand", substring($"p_name", 1, 1).as("blk"),
        lower($"p_type").as("family"), $"p_type".as("given"),
        lower($"p_name").as("title"), reverse(lower($"p_name")).as("venue"),
        when($"p_size" % 3 === 0, $"p_type").otherwise(lit("")).as("issn"),
        $"p_size".cast("string").as("year"),
        ($"p_size" % 10).cast("string").as("volume"),
        ($"p_partkey" % 5).cast("string").as("issue"),
        ($"p_size" * 10).cast("string").as("start_page"),
        ($"p_size" * 10 + $"p_partkey" % 3).cast("string").as("end_page"))
    }
    val blockCols = Seq("p_brand", "blk")
    def side(n: String) = {
      val m = biblio
      m.select(blockCols.map(col) ++ m.columns
        .filterNot(blockCols.contains).map(c => col(c).as(s"${c}_$n")): _*)
    }
    def q21pairs = side("a").join(side("b"), blockCols)
      .filter($"p_partkey_a" < $"p_partkey_b")

    time("q21 v1: pairs only (no score)")(q21pairs.select($"p_partkey_a", $"p_partkey_b"))
    time("q21 v2: score, no filter/orderBy")(q21pairs
      .withColumn("score", graft.functions.BiblioMatch.matchingScore(
        $"family_a", $"family_b", $"given_a", $"given_b",
        $"title_a", $"title_b", $"venue_a", $"venue_b", $"issn_a", $"issn_b",
        $"year_a", $"year_b", $"volume_a", $"volume_b",
        $"issue_a", $"issue_b", $"start_page_a", $"start_page_b",
        $"end_page_a", $"end_page_b"))
      .select($"p_partkey_a", $"p_partkey_b", $"score"))
    time("q21 v3: only the 3 lev() terms")(q21pairs
      .withColumn("score",
        graft.plans.VectorExpressions.lev($"family_a", $"family_b").cast("double") +
        graft.plans.VectorExpressions.lev($"title_a", $"title_b").cast("double") +
        graft.plans.VectorExpressions.lev($"venue_a", $"venue_b").cast("double"))
      .select($"p_partkey_a", $"p_partkey_b", $"score"))
    time("q21 v4: full registered query")(
      graft.SparkEntry.queries("q21_match_score")(spark, sfDir))

    // ---- q19 decomposition ----
    time("q19 v1: bucket-pair join, no lev")(locally {
      val B = 8
      val p = graft.Tables.part(spark, sfDir).select($"p_brand", $"p_partkey", $"p_name",
        pmod(xxhash64($"p_partkey"), lit(B)).cast("int").as("bkt"))
      val lhs = p.withColumn("pk", explode(expr(s"transform(sequence(bkt, ${B - 1}), j -> bkt * $B + j)")))
        .select($"p_brand", $"pk", $"bkt".as("b1"), $"p_partkey".as("k1"), $"p_name".as("name1"))
      val rhs = p.withColumn("pk", explode(expr(s"transform(sequence(0, bkt), i -> i * $B + bkt)")))
        .select($"p_brand", $"pk", $"bkt".as("b2"), $"p_partkey".as("k2"), $"p_name".as("name2"))
      lhs.join(rhs, Seq("p_brand", "pk"))
        .filter(($"b1" =!= $"b2" && $"k1" =!= $"k2") || $"k1" < $"k2")
        .select($"k1", $"k2")
    })
    time("q19 v2: full registered query")(
      graft.SparkEntry.queries("q19_levenshtein")(spark, sfDir))

    // ---- q34 decomposition ----
    def embJoin = {
      val e = graft.Tables.embeddings(spark, sfDir)
        .select($"vec_id".cast("long").as("vec_id"),
          graft.operators.Similarity.normalized($"embedding").as("nv"))
        .localCheckpoint()
      e.as("a").join(e.as("b"), $"a.vec_id" < $"b.vec_id")
    }
    time("q34 v1: self-join, no dot")(
      embJoin.select($"a.vec_id".as("v1"), $"b.vec_id".as("v2")))
    time("q34 v1b: dot, no round, no filter")(embJoin
      .withColumn("cos", graft.operators.Similarity.dot($"a.nv", $"b.nv"))
      .select($"a.vec_id".as("v1"), $"b.vec_id".as("v2"), $"cos"))
    time("q34 v1c: dot+filter raw (no round)")(embJoin
      .withColumn("cos", graft.operators.Similarity.dot($"a.nv", $"b.nv"))
      .filter($"cos" >= 0.45)
      .select($"a.vec_id".as("v1"), $"b.vec_id".as("v2"), $"cos"))
    time("q34 v1d: dot+ROUND+filter")(embJoin
      .withColumn("cos", round(graft.operators.Similarity.dot($"a.nv", $"b.nv"), 6))
      .filter($"cos" >= 0.45)
      .select($"a.vec_id".as("v1"), $"b.vec_id".as("v2"), $"cos"))
    time("q34 v2: full registered query")(
      graft.SparkEntry.queries("q34_dedup_embedding_cosine")(spark, sfDir))

    // ---- q19 step variants ----
    def q19join = {
      val B = 8
      val p = graft.Tables.part(spark, sfDir).select($"p_brand", $"p_partkey", $"p_name",
        pmod(xxhash64($"p_partkey"), lit(B)).cast("int").as("bkt"))
      val lhs = p.withColumn("pk", explode(expr(s"transform(sequence(bkt, ${B - 1}), j -> bkt * $B + j)")))
        .select($"p_brand", $"pk", $"bkt".as("b1"), $"p_partkey".as("k1"), $"p_name".as("name1"))
      val rhs = p.withColumn("pk", explode(expr(s"transform(sequence(0, bkt), i -> i * $B + bkt)")))
        .select($"p_brand", $"pk", $"bkt".as("b2"), $"p_partkey".as("k2"), $"p_name".as("name2"))
      lhs.join(rhs, Seq("p_brand", "pk"))
        .filter(($"b1" =!= $"b2" && $"k1" =!= $"k2") || $"k1" < $"k2")
    }
    time("q19 v1b: join+lev, no filter/sort")(q19join
      .withColumn("dist", graft.plans.VectorExpressions.lev($"name1", $"name2", 8))
      .select($"k1", $"k2", $"dist"))
    time("q19 v1c: join+lev+filter, no sort")(q19join
      .withColumn("dist", graft.plans.VectorExpressions.lev($"name1", $"name2", 8))
      .filter($"dist" >= 0)
      .select($"k1", $"k2", $"dist"))

    time("q19 v1d: +answer checkpoint, no sort")(q19join
      .withColumn("dist", graft.plans.VectorExpressions.lev($"name1", $"name2", 8))
      .filter($"dist" >= 0)
      .select($"p_brand",
        least($"k1", $"k2").cast("long").as("k1"),
        greatest($"k1", $"k2").cast("long").as("k2"),
        $"dist".cast("long").as("dist"))
      .localCheckpoint())

    // ---- q12 floor decomposition ----
    time("q12 v1: scan+regex project only")(locally {
      import graft.functions.CleaningColumns
      graft.Tables.documents(spark, sfDir)
        .select($"doc_id".cast("long").as("doc_id"),
          CleaningColumns.removeAsciiCol(
            CleaningColumns.normalizeSpacesCol(
              CleaningColumns.normalizeHyphensCol(substring($"text", 1, 60)))).as("norm_prefix"),
          upper($"lang").as("lang_u"))
    })
    time("q12 v2: full registered query")(
      graft.SparkEntry.queries("q12_string_norm")(spark, sfDir))

    // ---- q01 decimal-aggregation decomposition ----
    def li = graft.Tables.lineitem(spark, sfDir)
      .filter($"l_shipdate" <= lit("1998-09-02").cast("timestamp"))
    time("q01 v1: scan+filter+count-agg only")(li
      .groupBy($"l_returnflag", $"l_linestatus")
      .agg(count(lit(1)).cast("long").as("n")))
    time("q01 v2: double sums (no decimal)")(li
      .groupBy($"l_returnflag", $"l_linestatus")
      .agg(sum($"l_quantity").as("sum_qty"),
        sum($"l_extendedprice").as("sum_base_price"),
        sum($"l_extendedprice" * (lit(1.0) - $"l_discount")).as("sum_disc_price"),
        count(lit(1)).cast("long").as("count_order")))
    time("q01 v3: decimal sums (current shape)")(li
      .groupBy($"l_returnflag", $"l_linestatus")
      .agg(sum($"l_quantity".cast("decimal(18,2)")).cast("double").as("sum_qty"),
        sum($"l_extendedprice".cast("decimal(18,2)")).cast("double").as("sum_base_price"),
        sum($"l_extendedprice".cast("decimal(18,2)") *
          (lit(1).cast("decimal(18,2)") - $"l_discount".cast("decimal(18,2)")))
          .cast("double").as("sum_disc_price"),
        count(lit(1)).cast("long").as("count_order")))
    time("q01 v4: long-cents sums")(li
      .groupBy($"l_returnflag", $"l_linestatus")
      .agg((sum(round($"l_quantity" * 100).cast("long")).cast("double") / 100.0).as("sum_qty"),
        (sum(round($"l_extendedprice" * 100).cast("long")).cast("double") / 100.0).as("sum_base_price"),
        (sum(round($"l_extendedprice" * 100).cast("long") *
          (lit(100L) - round($"l_discount" * 100).cast("long"))).cast("double") / 10000.0).as("sum_disc_price"),
        count(lit(1)).cast("long").as("count_order")))

    // ---- q22 funnel stage decomposition ----
    locally {
      val m2 = TextQueries.biblioMeta(spark, sfDir).cache()
      val record = concat_ws(" ", $"title", $"family", $"given", $"issn",
        concat(lit("y"), $"year"), concat(lit("v"), $"volume"),
        concat(lit("i"), $"issue"), concat(lit("sp"), $"start_page"),
        concat(lit("ep"), $"end_page"))
      val t0 = System.nanoTime()
      val sets = graft.operators.Dedup.fanOutSmallScan(m2)
        .select($"p_partkey".cast("long").as("doc_id"),
          graft.operators.Dedup.shingleHashes(record, 2).as("hv"))
        .filter(size($"hv") > 0)
        .cache()
      val nRecords = sets.count()
      println(f"[probe] q22 s1: meta+sets build+count        ${(System.nanoTime() - t0) / 1e9}%8.3f s  rows=$nRecords")
      val (bands, rows) = graft.operators.Dedup.lshAutoParams(nRecords, threshold = 0.5)
      println(s"[probe] q22 auto params: bands=$bands rows=$rows")
      time("q22 s2: candidates+refine (no score)")(
        graft.operators.Dedup.lshCandidatePairsRefined(sets, bands, rows,
          c => graft.operators.Dedup.jaccardVerify(c, sets, 0.5, nRecords, sorted = false),
          nDocsKnown = nRecords))
      m2.unpersist(); sets.unpersist()
    }
    time("q22 full registered query")(
      graft.SparkEntry.queries("q22_lsh_match_score")(spark, sfDir))

    spark.stop()
  }
}
