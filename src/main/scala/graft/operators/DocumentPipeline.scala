package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables._

/** The composed training-corpus curation pipeline: the end-to-end program
  * a user of this library runs over a raw document corpus, chaining the
  * individually oracle-gated operators into one dataflow:
  *
  *   row-local signals (q36 lang-id, q37 quality, q49 repetition)
  *     -> corpus-level signals (q51 cross-doc chunk duplication,
  *        q42/q52 near-dup clustering, q48 decontamination)
  *     -> keep decision with a first-failing drop_reason per document
  *     -> salted per-source token-budget selection (q54) over survivors.
  *
  * Composition is where single-operator scans would multiply, so the
  * pipeline fuses deliberately:
  *   - all row-local signals come from ONE corpus scan (one projection
  *     over a materialized token array — the signal helpers in
  *     [[TextAnalysis]] are the same code the gated operators run);
  *   - the shingle-hash set frame is computed ONCE and cached, feeding
  *     both the near-dup LSH stages and the decontamination probe (the
  *     standalone operators each build their own);
  *   - corpus-level signals attach by doc_id joins, each a single shuffle
  *     of (doc_id, signal) pairs — no stage is quadratic, exactly the
  *     production shapes of q32/q42/q48.
  *
  * Output: one row per input document with every signal, a `kept` flag,
  * the first failing `drop_reason` ("" when kept), and `selected` for the
  * budget-mix choice among kept docs. Dropping nothing is a config choice
  * (thresholds at their permissive bounds), so the pipeline doubles as a
  * corpus profiler. */
object DocumentPipeline {

  /** Thresholds; defaults keep every stage active but permissive. */
  final case class Config(
      allowLangs: Seq[String] = Seq("en", "de", "es", "fr", "it"),
      minTokens: Long = 5,
      maxPunctRatio: Double = 0.5,
      maxDupBigramFrac: Double = 0.95,
      // default 1.0 = off: near-dup twins score cross_dup_frac ~1.0, so a
      // sub-1.0 cutoff here drops EVERY copy before the dedup stage can
      // elect a survivor — duplication belongs to near-dup dedup; tighten
      // this only to hunt boilerplate that document dedup cannot see
      maxCrossDupFrac: Double = 1.0,
      chunkTokens: Int = 8,
      shingleN: Int = 5,
      nearDupThreshold: Double = 0.8,
      bands: Int = 32,
      rows: Int = 4,
      decontaminate: Boolean = true,
      benchMod: Long = 7,
      budgetPerSource: Long = 800,
      salts: Int = 4)

  def curate(s: SparkSession, dir: String, cfg: Config = Config()): DataFrame = {
    import s.implicits._

    // ---- one corpus scan: materialized tokens + every row-local signal
    val rowLocal: Seq[Column] =
      (TextAnalysis.qualitySignals($"text", $"toks") ++
        TextAnalysis.repetitionSignals($"toks")) :+
        TextAnalysis.langBestStruct($"toks").as("lang_best")
    val base = graft.operators.Dedup.fanOutSmallScan(documents(s, dir))
      .select($"doc_id".cast("long").as("doc_id"), $"source", $"text",
        TextAnalysis.tokens($"text").as("toks"))
      .select(($"doc_id" +: $"source" +: $"text" +: $"toks" +: rowLocal): _*)
      .withColumn("pred_lang", $"lang_best.lang").drop("lang_best")
      .localCheckpoint()

    // ---- shared shingle-hash sets: built once, feed near-dup AND decontam
    val sets = base.select($"doc_id",
        Dedup.shingleHashes($"text", cfg.shingleN).as("hv"))
      .filter(size($"hv") > 0)
      .cache()
    val nDocs = sets.count()

    // near-dup decision (q52 shape): LSH pairs -> CC -> min-id keep;
    // verify runs inside the band-group slices (answer-mass spill past
    // the disk envelope, same as q22/q32)
    val pairs = Dedup.lshCandidatePairsRefined(sets, cfg.bands, cfg.rows,
        c => Dedup.jaccardVerify(c, sets, cfg.nearDupThreshold, nDocs, sorted = false))
      .select($"d1", $"d2").localCheckpoint()
    val membership = pairs.select($"d1".as("entity"), struct($"d1", $"d2").as("key"))
      .union(pairs.select($"d2".as("entity"), struct($"d1", $"d2").as("key")))
    val clusters = graft.curation.ConnectedComponents.byShardKey(membership)
      .select($"entity".as("doc_id"), $"component".as("cluster"))

    // decontamination (q48 shape) on the same cached sets
    val bench = sets.filter($"doc_id" % cfg.benchMod === 0)
      .select(explode($"hv").as("sg")).distinct()
    val contaminated = sets.filter($"doc_id" % cfg.benchMod =!= 0)
      .select($"doc_id", explode($"hv").as("sg"))
      .join(broadcast(bench), "sg")
      .groupBy($"doc_id").agg(count(lit(1)).cast("long").as("n_hits"))

    // cross-doc duplicated-chunk fraction (q51 shape) from the token array
    val k = cfg.chunkTokens
    val occ = base.filter($"n_tok" >= k)
      .select($"doc_id", explode(transform(
        sequence(lit(0), (size($"toks") / k).cast("int") - 1),
        i => xxhash64(concat_ws(" ", slice($"toks", i * k + 1, lit(k)))))).as("ch"))
    val nd = occ.groupBy($"ch").agg(countDistinct($"doc_id").as("ndocs"))
    val crossDup = occ.join(nd, "ch")
      .groupBy($"doc_id")
      .agg((sum(when($"ndocs" >= 2, 1L).otherwise(0L)).cast("double") /
        count(lit(1))).as("cross_dup_frac"))

    // ---- keep decision: first failing stage names the drop reason.
    // Near-dup is judged LAST, against a representative re-elected among
    // the docs that survive every content filter: if the cluster's min-id
    // member is itself dropped for quality, the best surviving member
    // keeps the cluster's content instead of the whole cluster vanishing.
    val contentFlagged = base.drop("toks", "text")
      .join(clusters, Seq("doc_id"), "left")
      .join(contaminated, Seq("doc_id"), "left")
      .join(crossDup, Seq("doc_id"), "left")
      .withColumn("cluster", coalesce($"cluster", $"doc_id"))
      .withColumn("n_hits", coalesce($"n_hits", lit(0L)))
      .withColumn("cross_dup_frac", coalesce($"cross_dup_frac", lit(0.0)))
      .withColumn("content_reason",
        when($"n_tok" < cfg.minTokens, "too_short")
          .when(!$"pred_lang".isInCollection(cfg.allowLangs), "lang")
          .when($"punct_ratio" > cfg.maxPunctRatio, "punct")
          .when($"dup_bigram_frac" > cfg.maxDupBigramFrac, "repetition")
          .when($"cross_dup_frac" > cfg.maxCrossDupFrac, "cross_dup")
          .when(lit(cfg.decontaminate) && $"n_hits" > 0, "contaminated")
          .otherwise(""))
    // reps cardinality tracks the DISTINCT-cluster count: ~corpus size at
    // a low dup rate (every doc its own cluster), tiny at a pathological
    // one (everything collapses into few clusters). Deliberately
    // UN-hinted: a join-strategy hint would pin the physical join and
    // suppress AQE's runtime broadcast upgrade, which is exactly the
    // right plan when reps collapses — both extremes are spec-covered
    // (DocumentPipelineSpec pathological-dup-rate case).
    val reps = contentFlagged.filter($"content_reason" === "")
      .groupBy($"cluster").agg(min($"doc_id").as("cluster_rep"))
    val flagged = contentFlagged
      .join(reps, Seq("cluster"), "left")
      .withColumn("drop_reason",
        when($"content_reason" =!= "", $"content_reason")
          .when($"doc_id" =!= $"cluster_rep", "near_dup")
          .otherwise(""))
      .drop("content_reason", "cluster_rep")
      .withColumn("kept", ($"drop_reason" === "").cast("boolean"))

    // ---- salted per-source budget selection over survivors (q54 shape)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"source", $"salt").orderBy($"ord", $"doc_id")
    val selected = flagged.filter($"kept")
      .select($"doc_id", $"source", $"n_tok",
        ($"doc_id" % cfg.salts).cast("long").as("salt"),
        md5($"doc_id".cast("string")).as("ord"))
      .withColumn("cum", sum($"n_tok").over(w))
      .filter($"cum" <= cfg.budgetPerSource / cfg.salts)
      .select($"doc_id", lit(true).as("selected"))

    flagged.join(selected, Seq("doc_id"), "left")
      .withColumn("selected", coalesce($"selected", lit(false)))
      // answer-mass checkpoint before the output sort — the range sampler
      // otherwise re-runs the whole signal-assembly join chain
      // (operators.Answer)
      .transform(Answer.sorted(_, $"doc_id"))
  }
}
