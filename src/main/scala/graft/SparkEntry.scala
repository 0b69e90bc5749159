package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.operators.{Dedup, IvfIndex, RelationalQueries => RQ, Similarity, TextAnalysis => TA, TextQueries => TQ}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` maps operator-inventory entries (SURVEY.md §2) to runnable
  * DataFrame programs over the driver test tables; `oracleSql` holds the
  * DuckDB-equivalent SQL for the hash-compare correctness gate. Column
  * names and value types are aligned on both sides (see
  * operators/RelationalQueries.scala header for the determinism rules).
  */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    RQ.q03JoinAgg(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q01_agg" -> (RQ.q01Agg _),
    "q02_filter_project" -> (RQ.q02FilterProject _),
    "q03_join_agg" -> (RQ.q03JoinAgg _),
    "q04_semi_join" -> (RQ.q04SemiJoin _),
    "q05_anti_join" -> (RQ.q05AntiJoin _),
    "q06_window_rank" -> (RQ.q06WindowRank _),
    "q07_dedup_last_wins" -> (RQ.q07DedupLastWins _),
    "q08_distinct_count" -> (RQ.q08DistinctCount _),
    "q09_multi_join" -> (RQ.q09MultiJoin _),
    "q10_set_ops" -> (RQ.q10SetOps _),
    "q11_conditional_agg" -> (TQ.q11ConditionalAgg _),
    "q12_string_norm" -> (TQ.q12StringNorm _),
    "q13_regex_extract" -> (TQ.q13RegexExtract _),
    "q14_date_trunc" -> (TQ.q14DateTrunc _),
    "q15_topk_per_group" -> (TQ.q15TopKPerGroup _),
    "q16_explode_distinct" -> (TQ.q16ExplodeDistinct _),
    "q17_collect_sorted" -> (TQ.q17CollectSorted _),
    "q18_running_sum" -> (TQ.q18RunningSum _),
    "q19_levenshtein" -> (TQ.q19Levenshtein _),
    "q20_first_nonempty" -> (TQ.q20FirstNonEmpty _),
    "q21_match_score" -> (TQ.q21MatchScore _),
    "q22_lsh_match_score" -> (TQ.q22LshMatchScore _),
    // corpus-sized operating point (Dedup.lshAutoParams) — same exact
    // oracle: the 4e-8 miss budget holds at every derived (bands, rows)
    "q22_lsh_match_score_auto" -> (TQ.q22LshMatchScoreAuto _),
    // D11 end-to-end: Crossref API parse (S13) -> weighted match score
    "q60_crossref_match" -> (TQ.q60CrossrefMatch _),
    "q61_substring_dedup" -> ((s, d) => Dedup.substringDedup(s, d)),
    "q30_dedup_exact" -> ((s, d) => Dedup.exactDupGroups(s, d)),
    // the ORACLE anchor runs uncapped so its documented behavior can
    // never diverge from its own oracle; the production dfCap variant is
    // registered separately (rows-only) below.
    "q31_dedup_ngram_jaccard" -> ((s, d) => Dedup.ngramJaccardPairs(s, d)),
    // dfCap bounds the per-shingle candidate bucket (k docs sharing a
    // shingle -> k^2 candidate rows): lossless at any cap >= the corpus's
    // max useful df (measured max df = 4 at these SFs; OperatorsSpec
    // asserts capped == uncapped), and at 100x scale it turns the one
    // corpus-wide stop-phrase bucket from quadratic into dropped. No
    // oracle row BY DESIGN (q43 precedent): the cap may legitimately
    // drop boilerplate pairs at scale, exactly when the oracle would not.
    "q31_capped_ngram_jaccard" -> ((s, d) => Dedup.ngramJaccardPairs(s, d, dfCap = 50)),
    "q32_dedup_minhash_lsh" -> ((s, d) => Dedup.minhashLshPairs(s, d)),
    "q33_dedup_simhash" -> ((s, d) => Dedup.simhashPairs(s, d)),
    "q34_dedup_embedding_cosine" -> ((s, d) => Dedup.embeddingCosinePairs(s, d)),
    "q35_ann_topk" -> ((s, d) => Similarity.bruteForceTopK(s, d)),
    "q36_lang_id" -> (TA.q36LangId _),
    "q37_quality_score" -> (TA.q37Quality _),
    "q38_token_count" -> (TA.q38TokenCount _),
    "q39_fingerprint" -> (TA.q39Fingerprint _),
    "q40_sessionize" -> (TA.q40Sessionize _),
    "q41_binary_meta" -> (TA.q41BinaryMeta _),
    "q42_neardup_clusters" -> ((s, d) => Dedup.nearDupClusters(s, d)),
    // q43 is approximate by construction (IVF ANN) — no SQL oracle;
    // recall vs brute force is asserted in OperatorsSpec instead.
    "q43_ann_ivf" -> ((s, d) => Similarity.ivfTopK(s, d)),
    // q43_exact drives the SAME IVF machinery (assignment scan, probe
    // join, within-cell top-k) with a deterministic SQL-expressible seed
    // quantizer, so the driver hash-gates it like every other operator.
    "q43_ann_ivf_exact" -> ((s, d) => Similarity.ivfTopKExact(s, d)),
    // persisted-index twin: build the partitionBy(cluster) IVF-Flat
    // layout once, probe with dynamic partition pruning — SAME
    // deterministic quantizer, so the SAME q43 exact oracle hash-gates
    // the whole build+store+probe chain.
    "q43_ann_ivf_indexed" -> ((s, d) => IvfIndex.q43Indexed(s, d)),
    "q44_token_budget_mix" -> (TA.q44TokenBudgetMix(_, _)),
    "q45_embedding_clusters" -> ((s, d) => Dedup.embeddingClusters(s, d)),
    // production embedding-dedup paths (rows-only, q43 precedent): sign-
    // LSH recall ~0.8 at cos>=0.45 by construction, so neither can hash-
    // match the exact oracle; recall floors asserted in OperatorsSpec.
    "q34_lsh_embedding_pairs" -> ((s, d) => Dedup.embeddingCosinePairsLsh(s, d)),
    // corpus-sized LSH operating point (nBits ~ log2 n, nTables ~ n^rho):
    // identical to q34_lsh at gate SFs (n <= 2000 resolves to the (4, 8)
    // default, spec-asserted), diverges exactly when fixed parameters
    // would let bucket occupancy grow with the corpus — see SCALE.json
    "q34_lsh_auto_embedding_pairs" -> ((s, d) => Dedup.embeddingCosinePairsLshAuto(s, d)),
    "q45_lsh_embedding_clusters" -> ((s, d) => Dedup.embeddingClustersLsh(s, d)),
    "q45_lsh_auto_embedding_clusters" -> ((s, d) => Dedup.embeddingClustersLshAuto(s, d)),
    "q46_hash_sample" -> (TA.q46HashSample _),
    "q47_vocab_topk" -> ((s, d) => TA.q47VocabTopK(s, d)),
    "q48_decontamination" -> ((s, d) => Dedup.decontaminationHits(s, d)),
    "q49_repetition_quality" -> (TA.q49Repetition _),
    "q50_incremental_dedup" -> ((s, d) => Dedup.incrementalDedupPairs(s, d)),
    "q51_crossdoc_dup_fraction" -> ((s, d) => Dedup.crossDocDupFraction(s, d)),
    "q52_dedup_corpus" -> ((s, d) => Dedup.dedupCorpus(s, d)),
    "q53_corpus_stats" -> (TA.q53CorpusStats _),
    "q54_token_budget_mix_salted" -> ((s, d) => TA.q54TokenBudgetMixSalted(s, d)),
    "q55_lang_eval" -> (TA.q55LangEval _),
    "q56_ann_label_eval" -> ((s, d) => Similarity.q56AnnLabelEval(s, d)),
    "q57_semantic_dedup" -> ((s, d) => Dedup.semanticDedup(s, d)),
    // q57's production twin (rows-only, q34_lsh/q45_lsh precedent):
    // nlist ~ sqrt(n) keeps the within-cell quadratic term near-constant
    // as the corpus grows — different cells than the fixed-nlist=8 oracle
    // anchor by construction, so no hash oracle; soundness (every dropped
    // vec has a genuine >=threshold smaller-id mate) and agreement vs the
    // anchor are asserted in OperatorsSpec.
    "q57_sqrtn_semantic_dedup" -> ((s, d) => Dedup.semanticDedupSqrtN(s, d)),
    // second oracle point at threshold 0.4: the driver testdata carries no
    // >=0.7 cosine pairs, so the 0.7 anchor's hash gate never exercises
    // the PRUNE path — this row makes the oracle see actual drops
    "q57_semantic_dedup_t04" -> ((s, d) => Dedup.semanticDedup(s, d, threshold = 0.4)),
    "q58_unigram_logprob" -> (TA.q58UnigramLogprob _),
    "q59_sequence_packing" -> ((s, d) => TA.q59SequencePacking(s, d)),
    // production parallelism point (rows-only): shards ~ cluster cores —
    // the oracle anchor pins shards=8 because the DuckDB SQL hardcodes
    // doc_id % 8; OperatorsSpec proves per-shard packing semantics are
    // identical at shards in {8, 64}
    "q59_sequence_packing_p32" -> ((s, d) => TA.q59SequencePacking(s, d, shards = 32)),
  )

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] = Map(
    "q01_agg" -> RQ.q01Sql,
    "q02_filter_project" -> RQ.q02Sql,
    "q03_join_agg" -> RQ.q03Sql,
    "q04_semi_join" -> RQ.q04Sql,
    "q05_anti_join" -> RQ.q05Sql,
    "q06_window_rank" -> RQ.q06Sql,
    "q07_dedup_last_wins" -> RQ.q07Sql,
    "q08_distinct_count" -> RQ.q08Sql,
    "q09_multi_join" -> RQ.q09Sql,
    "q10_set_ops" -> RQ.q10Sql,
    "q11_conditional_agg" -> TQ.q11Sql,
    "q12_string_norm" -> TQ.q12Sql,
    "q13_regex_extract" -> TQ.q13Sql,
    "q14_date_trunc" -> TQ.q14Sql,
    "q15_topk_per_group" -> TQ.q15Sql,
    "q16_explode_distinct" -> TQ.q16Sql,
    "q17_collect_sorted" -> TQ.q17Sql,
    "q18_running_sum" -> TQ.q18Sql,
    "q19_levenshtein" -> TQ.q19Sql,
    "q20_first_nonempty" -> TQ.q20Sql,
    "q21_match_score" -> TQ.q21Sql,
    "q22_lsh_match_score" -> TQ.q22Sql,
    "q22_lsh_match_score_auto" -> TQ.q22Sql,
    "q60_crossref_match" -> TQ.q60Sql,
    "q61_substring_dedup" -> Dedup.q61Sql(),
    "q30_dedup_exact" -> Dedup.q30Sql,
    "q31_dedup_ngram_jaccard" -> Dedup.jaccardPairsSql,
    "q32_dedup_minhash_lsh" -> Dedup.jaccardPairsSql,
    "q33_dedup_simhash" -> Dedup.q33Sql,
    "q34_dedup_embedding_cosine" -> Dedup.q34Sql,
    "q35_ann_topk" -> Similarity.q35Sql,
    "q36_lang_id" -> TA.q36Sql,
    "q37_quality_score" -> TA.q37Sql,
    "q38_token_count" -> TA.q38Sql,
    "q39_fingerprint" -> TA.q39Sql,
    "q40_sessionize" -> TA.q40Sql,
    "q41_binary_meta" -> TA.q41Sql,
    "q42_neardup_clusters" -> Dedup.q42Sql,
    "q43_ann_ivf_exact" -> Similarity.q43ExactSql,
    "q43_ann_ivf_indexed" -> Similarity.q43ExactSql,
    "q44_token_budget_mix" -> TA.q44Sql,
    "q45_embedding_clusters" -> Dedup.q45Sql,
    "q46_hash_sample" -> TA.q46Sql,
    "q47_vocab_topk" -> TA.q47Sql,
    "q48_decontamination" -> Dedup.q48Sql,
    "q49_repetition_quality" -> TA.q49Sql,
    "q50_incremental_dedup" -> Dedup.q50Sql,
    "q51_crossdoc_dup_fraction" -> Dedup.q51Sql,
    "q52_dedup_corpus" -> Dedup.q52Sql,
    "q53_corpus_stats" -> TA.q53Sql,
    "q54_token_budget_mix_salted" -> TA.q54Sql,
    "q55_lang_eval" -> TA.q55Sql,
    "q56_ann_label_eval" -> Similarity.q56Sql,
    "q57_semantic_dedup" -> Dedup.q57Sql,
    "q57_semantic_dedup_t04" -> Dedup.q57SqlAt(0.4),
    "q58_unigram_logprob" -> TA.q58Sql,
    "q59_sequence_packing" -> TA.q59Sql,
  )
}
