package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{Dedup, DocumentPipeline, TextAnalysis}

/** The composed corpus-curation pipeline must agree signal-for-signal with
  * the individually oracle-gated operators it fuses, and its keep/select
  * decisions must satisfy the stage contracts. */
class DocumentPipelineSpec extends AnyFunSuite {

  private val dir = "/root/testdata/sf0.001"

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    .getOrCreate()

  test("composed pipeline agrees with the gated operators and its contracts") {
    val cfg = DocumentPipeline.Config()
    val out = DocumentPipeline.curate(spark, dir, cfg).collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap

    val nDocs = graft.Tables.documents(spark, dir).count()
    assert(out.size.toLong == nDocs, "one row per input document")

    // row-local signals == the oracle-gated operators'
    val q36 = TextAnalysis.q36LangId(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val q37 = TextAnalysis.q37Quality(spark, dir).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(4))).toMap
    val q49 = TextAnalysis.q49Repetition(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getDouble(4)).toMap
    out.foreach { case (id, r) =>
      assert(r.getAs[String]("pred_lang") == q36(id), s"doc $id lang")
      val (n, punct) = q37(id)
      assert(r.getAs[Long]("n_tok") == n, s"doc $id n_tok")
      assert(math.abs(r.getAs[Double]("punct_ratio") - punct) < 5e-7, s"doc $id punct")
      q49.get(id).foreach(f =>
        assert(math.abs(r.getAs[Double]("dup_bigram_frac") - f) < 5e-7, s"doc $id rep"))
    }

    // corpus-level signals == the oracle-gated operators'
    val q52 = Dedup.dedupCorpus(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val q48 = Dedup.decontaminationHits(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val q51 = Dedup.crossDocDupFraction(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getDouble(3)).toMap
    out.foreach { case (id, r) =>
      assert(r.getAs[Long]("cluster") == q52(id), s"doc $id cluster")
      assert(r.getAs[Long]("n_hits") == q48.getOrElse(id, 0L), s"doc $id hits")
      assert(math.abs(r.getAs[Double]("cross_dup_frac") - q51.getOrElse(id, 0.0)) < 5e-7,
        s"doc $id crossdup")
    }

    // decision contracts
    out.values.foreach { r =>
      val reason = r.getAs[String]("drop_reason")
      assert(r.getAs[Boolean]("kept") == reason.isEmpty)
      if (reason == "near_dup")
        assert(r.getAs[Long]("cluster") != r.getAs[Long]("doc_id"))
      if (reason == "contaminated") assert(r.getAs[Long]("n_hits") > 0)
      if (!r.getAs[Boolean]("kept")) assert(!r.getAs[Boolean]("selected"))
    }
    val reasons = out.values.map(_.getAs[String]("drop_reason")).toSet
    assert(reasons.contains("near_dup") && reasons.contains("contaminated"),
      s"test corpus should exercise dedup + decontamination drops: $reasons")

    // representative re-election: among the docs of a cluster that pass
    // every content filter, exactly the min-id one is kept
    out.values.groupBy(_.getAs[Long]("cluster")).foreach { case (c, members) =>
      val contentOk = members.filter(r =>
        Set("", "near_dup").contains(r.getAs[String]("drop_reason")))
      if (contentOk.nonEmpty) {
        val keptIds = contentOk.filter(_.getAs[Boolean]("kept")).map(_.getAs[Long]("doc_id"))
        assert(keptIds.toSeq == Seq(contentOk.map(_.getAs[Long]("doc_id")).min),
          s"cluster $c should keep exactly its min content-surviving member")
      }
    }

    // budget contract: per (source, doc_id%salts) selected token mass fits
    val perBucket = out.values.filter(_.getAs[Boolean]("selected"))
      .groupBy(r => (r.getAs[String]("source"), r.getAs[Long]("doc_id") % cfg.salts))
      .map { case (_, rs) => rs.map(_.getAs[Long]("n_tok")).sum }
    assert(perBucket.nonEmpty)
    assert(perBucket.forall(_ <= cfg.budgetPerSource / cfg.salts))
  }

  test("tightened cross-dup threshold exercises the boilerplate filter") {
    val out = DocumentPipeline.curate(spark, dir,
      DocumentPipeline.Config(maxCrossDupFrac = 0.5)).collect()
    val reasons = out.map(_.getAs[String]("drop_reason"))
    assert(reasons.contains("cross_dup"))
    // cross_dup precedes the dedup stage, so with the tight cutoff the
    // near-dup twins fall there instead
    out.filter(_.getAs[String]("drop_reason") == "cross_dup")
      .foreach(r => assert(r.getAs[Double]("cross_dup_frac") > 0.5))
  }

  test("pathological dup rate: one giant near-dup cluster elects exactly one rep") {
    // the reps-join skew extreme: most of the corpus collapses into ONE
    // cluster, so the reps side of the cluster-rep join is tiny while the
    // corpus side funnels through a single cluster key. 40 near-identical
    // copies (unique trailing token — same 5-shingle prefix set keeps
    // them above the 0.8 Jaccard threshold) + 10 distinct docs.
    import spark.implicits._
    val common = (1 to 60).map(i => s"tok$i").mkString(" ")
    val docs =
      (0 until 40).map(i => (i.toLong, s"$common copy$i", "en", "src1")) ++
      (0 until 10).map(i => ((100 + i).toLong,
        (1 to 30).map(j => s"unique${i}w$j").mkString(" "), "en", "src2"))
    val dir2 = java.nio.file.Files.createTempDirectory("graft_patho").toString
    docs.toDF("doc_id", "text", "lang", "source")
      .withColumn("n_chars", org.apache.spark.sql.functions.length($"text"))
      .write.mode("overwrite").parquet(s"$dir2/documents.parquet")
    val out = DocumentPipeline.curate(spark, dir2,
      DocumentPipeline.Config(decontaminate = false)).collect()
    assert(out.length == 50, "one output row per input doc")
    val copies = out.filter(_.getAs[Long]("doc_id") < 100)
    val kept = copies.filter(_.getAs[Boolean]("kept"))
    assert(kept.map(_.getAs[Long]("doc_id")).toSeq == Seq(0L),
      "exactly the min-id member of the giant cluster survives")
    assert(copies.filter(_.getAs[String]("drop_reason") == "near_dup").length == 39)
    // the distinct docs are untouched by the giant cluster
    val uniques = out.filter(_.getAs[Long]("doc_id") >= 100)
    assert(uniques.forall(_.getAs[String]("drop_reason") != "near_dup"))
  }
}
