"""Driver contract for the graft builder (Ray Data target).

The driver calls ``ray.init`` itself, then ``entry()`` as a smoke check,
runs each ``queries()[name](sf_dir)`` at sf=0.01 and compares against
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash). Nothing here calls ray.init/ray.shutdown.

Engine: candidategeneration_ray — a Ray-Data-native rebuild of
aalto1/candidategeneration's inverted-index build + BM25 query engine
(see SURVEY.md). Query names map to SURVEY.md §2 operator ids in the
comments below.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any


def entry() -> Any:
    """Flagship pipeline at sf0.001: build the static inverted index over
    the documents table (tokenize → postings → bucketed shuffle →
    compressed block-max lists) and serve the fixed query set through
    the block-max WAND engine. Returns (query_id, rank, doc_id, score)."""
    from candidategeneration_ray.pipelines.docquery import q_bm25_topk

    return q_bm25_topk("/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[str], Any]]:
    from candidategeneration_ray.pipelines import docquery as dq
    from candidategeneration_ray.pipelines import events as ev
    from candidategeneration_ray.pipelines import extras as ex
    from candidategeneration_ray.pipelines import sketches as sk
    from candidategeneration_ray.pipelines import clustering as cl
    from candidategeneration_ray.pipelines import relational as rl
    from candidategeneration_ray.pipelines import ivfdelta as ivfd
    from candidategeneration_ray.pipelines import positional as ps
    from candidategeneration_ray.pipelines import textlm as tl
    from candidategeneration_ray.pipelines import lexicon as lx
    from candidategeneration_ray.pipelines import impact as imp

    return {
        # --- core engine operators (SURVEY.md §2) ---
        "tokenize_counts": dq.q_tokenize_counts,        # M1 tokenizer
        "global_stats": dq.q_global_stats,              # A1 global stats
        "df_top50": dq.q_df_top50,                      # A2 document frequency
        "stemmed_df_top50": dq.q_stemmed_df_top50,      # S-stemmer normalization
        "term_postings": dq.q_term_postings,            # M7+M8+O1/O2 list build
        "unigram_list_lengths": dq.q_unigram_list_lengths,  # A4 list lengths
        "postings_bytes": dq.q_postings_bytes,  # on-disk codec accounting
        "postings_bytes_bp": dq.q_postings_bytes_bp,  # binary-packing codec comparison
        "postings_bytes_ef": dq.q_postings_bytes_ef,  # Elias-Fano codec comparison
        "postings_bytes_rice": dq.q_postings_bytes_rice,  # Golomb-Rice codec comparison
        "postings_bytes_bic": dq.q_postings_bytes_bic,  # binary-interpolative codec comparison
        "index_report": dq.q_index_report,      # one-row capacity report
        "codec_report": dq.q_codec_report,      # codec matrix fold (5 codecs)
        "index_integrity": dq.q_index_integrity,  # on-disk format audit
        "pruned_list_lengths": dq.q_pruned_list_lengths,    # O3 build-time pruning
        "delta_update_lists": dq.q_delta_update_lists,      # incremental (LSM) update
        "delta_hit_top5": dq.q_delta_hit_top5,              # HIT family rebuilt after a delta
        "tombstone_delete_lists": dq.q_tombstone_delete_lists,  # LSM delete path
        "delete_bm25_topk": dq.q_delete_bm25_topk,          # exact top-k over deleted index
        "pair_counts_top50": dq.q_pair_counts_top50,    # M5/M6 d-bigram emission
        "filtered_pair_counts": dq.q_filtered_pair_counts,  # M4/J1/D2 filter-set semi-join
        "related_terms": dq.q_related_terms,  # seed-filtered co-occurrence top-5
        "query_keys": dq.q_query_keys,                  # M2/M3 query convert+augment
        "access_counts": dq.q_access_counts,            # A5 access map
        "bm25_topk": dq.q_bm25_topk,                    # FLAGSHIP: WAND top-k (J4/O6/O7)
        "hybrid_topk": dq.q_hybrid_topk,                # dense+sparse RRF fusion
        "ta_fused_topk": dq.q_ta_fused_topk,            # Fagin TA early termination
        "bm25f_topk": dq.q_bm25f_topk,                  # fielded (head-weighted) BM25F
        "cached_bm25_topk": dq.q_cached_bm25_topk,      # lineage-keyed result cache
        "maxscore_topk": dq.q_maxscore_topk,            # DAAT MaxScore, rank-identical
        "bm25_topk_bp": dq.q_bm25_topk_bp,              # binary-packed index serving
        "bm25_topk_ef": dq.q_bm25_topk_ef,              # Elias-Fano index serving
        "bm25_topk_rice": dq.q_bm25_topk_rice,          # Golomb-Rice index serving
        "bm25_topk_bic": dq.q_bm25_topk_bic,            # binary-interpolative index serving
        "collapse_topk": dq.q_collapse_topk,            # field collapsing per source
        "mmr_topk": dq.q_mmr_topk,                      # MMR diversified re-ranking
        "impact_topk": imp.q_impact_topk,               # quantized-impact SAAT serving
        "term_sharded_bm25_topk": dq.q_term_sharded_topk,  # term-partitioned fleet
        "ltr_features": dq.q_ltr_features,              # LTR training-table export
        "asof_bm25_topk": dq.q_asof_bm25_topk,          # time-travel epoch serving
        "ndcg_eval": dq.q_ndcg_eval,                    # graded nDCG@10, integer LUT
        "search_after_topk": dq.q_search_after_topk,    # cursor pagination (page 2)
        "toplayer_prefixes": dq.q_toplayer_prefixes,    # O3/O4 impact-ordered top layer
        "bigram_union_lists": dq.q_bigram_union_lists,  # O5 bigram list construction
        "hit_postings": dq.q_hit_postings,              # J6/HIT prior-ordered postings
        "hit_index_top5": dq.q_hit_index_top5,          # HIT index family build
        "phrase_postings": ps.q_phrase_postings,        # positional family: exact phrase
        "phrase_postings_sharded": ps.q_phrase_postings_sharded,  # term-sharded phrase fleet
        "proximity_docs": ps.q_proximity_docs,          # all terms within a W-window
        "ordered_window_docs": ps.q_ordered_window_docs,  # in-order #odW retrieval
        # LSM twin: base+delta compacted family must equal the
        # full-corpus phrase oracle (phrase semantics are epoch-free)
        "phrase_delta_postings": ps.q_phrase_delta_postings,
        "minspan_topk": ps.q_minspan_topk,              # passage ranking by span
        "phrase_bm25_topk": ps.q_phrase_bm25_topk,      # match-then-rank: phrase + BM25
        "snippets": ps.q_snippets,                      # KWIC snippet extraction
        "rrf_fusion": ps.q_rrf_fusion,                  # reciprocal-rank fusion
        "sdm_topk": ps.q_sdm_topk,                      # sequential dependence model
        "lmdirichlet_topk": ps.q_lmdirichlet_topk,      # 2nd ranking model (QL)
        # --- lexicon / search-frontend features ---
        "prefix_terms": lx.q_prefix_terms,              # wildcard/autocomplete scan
        "fuzzy_terms": lx.q_fuzzy_terms,                # ed<=1 "did you mean"
        "soundex_terms": lx.q_soundex_terms,            # phonetic encoding
        "phonetic_lookup": lx.q_phonetic_lookup,        # sound-alike matches
        "bool_or_docs": lx.q_bool_or_docs,              # m-of-k disjunctive retrieval
        "bool_diff_docs": lx.q_bool_diff_docs,          # AND-NOT set difference
        "boolean_query_docs": lx.q_boolean_query_docs,  # boolean compiler, 2 backends
        "wildcard_docs": lx.q_wildcard_docs,            # wildcard term retrieval
        "corrected_bm25_topk": lx.q_corrected_bm25_topk,  # did-you-mean + rescore
        "synonym_bm25_topk": lx.q_synonym_bm25_topk,    # per-group max blending
        "facet_counts": lx.q_facet_counts,              # faceted result counts
        "substring_docs": lx.q_substring_docs,          # trigram-filtered grep
        "bitmap_index": lx.q_bitmap_index,              # per-value bitset words
        "bitmap_query_counts": lx.q_bitmap_query_counts,  # AND/OR/ANDNOT serving
        "dictionary_bytes": lx.q_dictionary_bytes,  # front-coding accounting
        "topk_candidates": dq.q_topk_candidates,
        "quality_model": dq.q_quality_model,            # Q2/A6 quality model
        "predictive_candidates": dq.q_predictive_candidates,  # Q3/Q5/Q6 greedy selection
        "retrieval_eval": dq.q_retrieval_eval,  # recall/MRR stats vs exact top-k
        "pr_points": dq.q_pr_points,            # exact precision-recall curve
        "hard_negatives": dq.q_hard_negatives,  # BM25 contrastive triple mining
        "passage_bm25_topk": dq.q_passage_bm25_topk,  # MaxP passage retrieval
        "set_cover_select": tl.q_set_cover_select,  # greedy benchmark coverage
        "ltr_rerank_topk": dq.q_ltr_rerank_topk,    # linear model second stage
        "resharded_bm25_topk": dq.q_resharded_bm25_topk,  # elastic re-bucketing
        "important_parts": rl.q_important_parts,    # Q11 fraction-of-total
        "part_supplier_counts": rl.q_part_supplier_counts,  # Q16 distinct-count join
        "dominant_suppliers": rl.q_dominant_suppliers,  # Q20 share rule
        "benford_digits": rl.q_benford_digits,      # first-digit fraud audit
        "ranking_agreement": dq.q_ranking_agreement,  # doc vs MaxP prefix overlap
        "ranking_rbo": dq.q_ranking_rbo,        # exact rank-biased overlap
        "kendall_tau": dq.q_kendall_tau,        # rerank reorder measure
        "query_difficulty": dq.q_query_difficulty,  # QPP feature table
        "selectivity_audit": dq.q_selectivity_audit,  # independence-assumption audit
        "list_overlap_kmv": dq.q_list_overlap_kmv,  # sketch cardinality estimates
        "judgment_pool": dq.q_judgment_pool,        # TREC pooling of 4 systems
        "prf_topk": dq.q_prf_topk,  # Rocchio-style PRF expansion, integer-exact
        "more_like_this": dq.q_more_like_this,  # doc-to-doc retrieval (MLT)
        "textrank_terms": dq.q_textrank_terms,  # integer TextRank keywords
        "forward_export": dq.q_forward_export,  # inverted->forward transpose
        "filtered_bm25_topk": dq.q_filtered_bm25_topk,  # metadata-filtered retrieval
        "dedup_bm25_topk": dq.q_dedup_bm25_topk,  # curated-corpus index rebuild
        "stemmed_bm25_topk": dq.q_stemmed_bm25_topk,  # stemmed-index retrieval
        # --- training-data extras (dedup / similarity / text analysis) ---
        "dedup_exact": ex.q_dedup_exact,
        # exact-mode opt-in: the library default caps hot shingles
        # (safe polarity at scale); the oracle comparison wants exact.
        # BOUND: max_shingle_df=None makes the shared-shingle explosion
        # quadratic in the hottest shingle's df — safe here only
        # because the driver runs at sf<=0.1 (hottest shingle df ~5e3
        # -> ~1e7 pair rows worst case). Do NOT lift these lambdas
        # into a large-scale path; use the capped library default or
        # q_jaccard_pairs_prefix (sub-quadratic, same result).
        "jaccard_pairs": lambda sf: ex.q_jaccard_pairs(sf, max_shingle_df=None),
        # containment twin: exact-mode opt-in like jaccard_pairs
        "containment_pairs":
            lambda sf: ex.q_containment_pairs(sf, max_shingle_df=None),
        # PPJoin-style prefix-filtered plan; hash-matches the SAME
        # jaccard oracle = plan-equivalence proof (sub-quadratic scale path)
        "jaccard_pairs_prefix": ex.q_jaccard_pairs_prefix,
        "minhash_signatures": ex.q_minhash_signatures,
        "minhash_lsh_pairs": ex.q_minhash_lsh_pairs,
        "lsh_precision": ex.q_lsh_precision,    # exact-Jaccard audit of LSH pairs
        "curriculum_order": ex.q_curriculum_order,  # easy-first global training order
        "mixed_lang_docs": ex.q_mixed_lang_docs,    # per-chunk language routing audit
        "dup_clusters": ex.q_dup_clusters,
        "cluster_representatives": ex.q_cluster_representatives,  # keep-best dedup
        "duplicate_spans": ex.q_duplicate_spans,
        "novelty_scores": ex.q_novelty_scores,  # first-occurrence novelty curve
        "heaps_curve": ex.q_heaps_curve,        # vocabulary-growth deciles
        "dedup_substrings": ex.q_dedup_substrings,  # span-removal rewrite (Lee et al.)
        "hashed_embeddings": ex.q_hashed_embeddings,  # hashing-trick text vectors
        "hashed_mips_top10": ex.q_hashed_mips_top10,  # MIPS over hashed vectors
        "maxsim_top10": ex.q_maxsim_top10,      # late-interaction (MaxSim) plan
        "simhash": ex.q_simhash,
        "simhash_neardups": ex.q_simhash_neardups,
        "embedding_neardups": ex.q_embedding_neardups,
        "embedding_neardups_lsh": ex.q_embedding_neardups_lsh,
        "ann_cosine_top10": ex.q_ann_cosine_top10,
        "ann_ivf_top10": ex.q_ann_ivf_top10,
        "ann_sq8_top10": ex.q_ann_sq8_top10,    # scalar-quantized symmetric ANN
        "ann_recall_report": ex.q_ann_recall_report,  # 6-method recall matrix
        "k_anonymity": ex.q_k_anonymity,        # privacy release audit
        "l_diversity": ex.q_l_diversity,        # attribute-disclosure audit
        "t_closeness": ex.q_t_closeness,        # distribution-leak audit (TVD)
        "release_report": ex.q_release_report,  # 5-subsystem release gate
        "label_centroid_dist": ex.q_label_centroid_dist,  # drift diagnostic
        "text_stats": ex.q_text_stats,
        "decision_stump": ex.q_decision_stump,  # exact 0-1-loss best split
        "cv_stump": ex.q_cv_stump,              # k-fold CV, one-pass stats
        "readability": ex.q_readability,        # Flesch score, exact rational
        "char_entropy": ex.q_char_entropy,      # integer Shannon entropy
        "quality_filter": ex.q_quality_filter,
        "repetition_stats": ex.q_repetition_stats,
        "source_sample": ex.q_source_sample,
        "pps_sample": ex.q_pps_sample,      # systematic weighted (PPS) sample
        "priority_sample": ex.q_priority_sample,  # Duffield top-k + HT weights
        "sample_subset_sums": ex.q_sample_subset_sums,  # HT subset estimation
        "tokens_by_source": ex.q_tokens_by_source,
        "train_val_split": ex.q_train_val_split,
        "regex_counts": ex.q_regex_counts,  # PII-ish scrub-pattern scan
        "redact_docs": ex.q_redact_docs,    # redaction transform, md5-verified text
        "langid": ex.q_langid,
        "langid_eval": ex.q_langid_eval,
        "fingerprints": ex.q_fingerprints,
        "winnow_fingerprints": ex.q_winnow_fingerprints,  # MOSS local fingerprints
        "cdc_chunks": ex.q_cdc_chunks,              # content-defined chunking
        "cdc_dedup_stats": ex.q_cdc_dedup_stats,    # chunk-store savings
        "corpus_digest": ex.q_corpus_digest,            # order-insensitive row-hash digest
        "snapshot_diff": ex.q_snapshot_diff,            # versioned-table diff by key
        "doc_chunks": ex.q_doc_chunks,          # flat-map chunker (RAG shape)
        "column_profile": ex.q_column_profile,  # schema-drift validation
        "df_drift": ex.q_df_drift,              # vocabulary drift audit
        "similar_docs": ex.q_similar_docs,      # broadcast-probe Jaccard search
        "top_similar_pairs": ex.q_top_similar_pairs,  # threshold-less top-k sim join
        "fuzzy_name_pairs": ex.q_fuzzy_name_pairs,    # edit-distance join (Myers verify)
        "snm_pairs": ex.q_snm_pairs,                  # sorted-neighborhood blocking
        "part_entities": ex.q_part_entities,          # fuzzy-match entity resolution
        "source_similarity": ex.q_source_similarity,  # dataset-level MinHash overlap
        "delta_dedup": ex.q_delta_dedup,              # new-vs-base ingest dedup
        "source_moments": ex.q_source_moments,  # sufficient-statistics pattern
        "target_encoding": ex.q_target_encoding,  # m-estimate category encoder
        "source_regression": ex.q_source_regression,  # grouped OLS (exact num/den)
        # --- mergeable-summary (sketch) aggregates ---
        "doclen_histogram": sk.q_doclen_histogram,
        "vopt_histogram": sk.q_vopt_histogram,      # exact DP segmentation
        "doclen_quantiles": sk.q_doclen_quantiles,
        "frequent_terms": sk.q_frequent_terms,      # 2-pass Misra-Gries, exact
        "hll_registers": sk.q_hll_registers,            # sketch state, exact
        "hll_registers_by_source": sk.q_hll_registers_by_source,  # keyed sketch
        "bloom_bits": sk.q_bloom_bits,              # bloom sketch state, exact
        "bloom_membership": sk.q_bloom_membership,  # probes incl. false positives
        "cmsketch_counters": sk.q_cmsketch_counters,  # count-min state, exact
        "cmsketch_estimates": sk.q_cmsketch_estimates,  # point queries + truth
        "ams_f2": sk.q_ams_f2,                          # F2 moment sketch state
        "ams_f2_estimate": sk.q_ams_f2_estimate,        # median estimator + truth
        "countsketch_counters": sk.q_countsketch_counters,  # signed-counter state
        "countsketch_estimates": sk.q_countsketch_estimates,  # unbiased medians
        "source_quantile_filter": sk.q_source_quantile_filter,  # dynamic per-source cutoff
        "source_pct_rank": sk.q_source_pct_rank,    # within-group percentile feature
        "source_ntile": sk.q_source_ntile,          # NTILE equi-count buckets
        "kmv_registers": sk.q_kmv_registers,        # bottom-k sketch state
        "kmv_source_overlap": sk.q_kmv_source_overlap,  # intersection estimates
        "source_hist_l1": sk.q_source_hist_l1,      # distribution distance
        "hll_distinct_terms": sk.q_hll_distinct_terms,
        "hll_union_distinct": sk.q_hll_union_distinct,  # keyed-sketch union merge
        # --- clustering (exact-integer Lloyd, value-verified) ---
        "kmeans_centroids": cl.q_kmeans_centroids,
        "kmeans_assignments": cl.q_kmeans_assignments,
        "kmeans_label_eval": cl.q_kmeans_label_eval,  # contingency vs ground-truth labels
        "kmeans_purity": cl.q_kmeans_purity,        # sketch-then-finalize purity
        "kmeans_ari": cl.q_kmeans_ari,              # integer-exact adjusted Rand
        "silhouette_ppm": cl.q_silhouette_ppm,      # internal geometry metric
        "ann_ivf_kmeans_top10": cl.q_ann_ivf_kmeans_top10,
        "pq_codes": cl.q_pq_codes,                  # product-quantization codes
        "ann_pq_top10": cl.q_ann_pq_top10,          # ADC ranking (value-verified)
        "ann_ivfpq_top10": cl.q_ann_ivfpq_top10,    # IVF-PQ (probe + ADC, value-verified)
        "embedding_gram": cl.q_embedding_gram,      # distributed X^T X (PCA prep)
        "gram_power_iteration": cl.q_gram_power_iteration,  # spectral finalizer
        "embedding_jl_sketch": cl.q_embedding_jl_sketch,  # deterministic JL projection
        "knn_graph": cl.q_knn_graph,                # exact integer-L2 kNN graph
        "mutual_knn": cl.q_mutual_knn,              # reciprocal-kNN link filter
        "kcenter_coreset": cl.q_kcenter_coreset,    # greedy k-center data pruning
        "dbscan_clusters": cl.q_dbscan_clusters,    # density clustering + noise
        "semantic_neardups": cl.q_semantic_neardups,  # SemDeDup: cluster-restricted
        "cluster_top_terms": cl.q_cluster_top_terms,  # cross-modal cluster labeling
        "term_embeddings": cl.q_term_embeddings,    # cross-modal term centroids
        "pagerank": cl.q_pagerank,                  # integer PageRank over kNN graph
        "personalized_pagerank": cl.q_personalized_pagerank,  # seeded teleport
        "bfs_hops": cl.q_bfs_hops,                  # multi-source BFS hop distance
        "harmonic_centrality": cl.q_harmonic_centrality,  # pivot closeness
        "stress_centrality": cl.q_stress_centrality,  # integer Brandes family
        "bridge_edges": cl.q_bridge_edges,          # Girvan-Newman edge stress
        "shortest_paths": cl.q_shortest_paths,      # hop-bounded Bellman-Ford
        "triangle_counts": cl.q_triangle_counts,        # graph-motif wedge-check
        "common_neighbors": cl.q_common_neighbors,      # link prediction (wedge anti)
        "neighborhood_jaccard": cl.q_neighborhood_jaccard,  # exact-ratio link score
        "adamic_adar": cl.q_adamic_adar,            # 1/ln(deg) weighted link score
        "kcore_nodes": cl.q_kcore_nodes,                # k-core peeling fixed point
        "densest_subgraph": cl.q_densest_subgraph,      # parallel peeling 2-approx
        "ktruss_edges": cl.q_ktruss_edges,              # edge-cohesion peeling
        "hits_scores": cl.q_hits_scores,            # integer HITS (SURVEY A7)
        "knn_label_vote": cl.q_knn_label_vote,      # semi-supervised labeling
        "walk_cooccurrence": cl.q_walk_cooccurrence,  # DeepWalk context pairs
        "mst_edges": cl.q_mst_edges,                # Borůvka spanning forest
        "single_linkage_clusters": cl.q_single_linkage_clusters,  # dendrogram cut
        "mis_nodes": cl.q_mis_nodes,                # Luby maximal independent set
        "matching_edges": cl.q_matching_edges,      # greedy maximal matching
        "graph_coloring": cl.q_graph_coloring,      # Jones-Plassmann mex colors
        "ivf_delta_counts": ivfd.q_ivf_delta_counts,
        "ivf_delete_counts": ivfd.q_ivf_delete_counts,  # vector tombstones
        # --- corpus-LM / retrieval / mixture operators ---
        "decontaminate": tl.q_decontaminate,        # GPT-3-style shingle overlap
        "lm_bigram_scores": tl.q_lm_bigram_scores,  # pruned bigram LM (CCNet shape)
        "bool_and_docs": tl.q_bool_and_docs,        # conjunctive retrieval from the index
        "bool_and_docs_svs": tl.q_bool_and_docs_svs,  # galloping-intersection twin
        "percolate_matches": tl.q_percolate_matches,  # reverse search at ingest
        "pmi_top50": tl.q_pmi_top50,                # PMI collocation mining
        "mixture_select": tl.q_mixture_select,      # budgeted per-source selection
        "tfidf_top3": tl.q_tfidf_top3,              # per-doc keyword extraction
        "token_offsets": tl.q_token_offsets,            # sequence-packing offsets
        "bpe_merges": tl.q_bpe_merges,                  # BPE tokenizer training
        "bpe_segmented": tl.q_bpe_segmented,            # trained segmentation
        "sequence_manifest": tl.q_sequence_manifest,    # inverse seq->docs manifest
        "kn_bigram_lm": tl.q_kn_bigram_lm,      # Kneser-Ney smoothing, exact rational
        "nb_model": tl.q_nb_model,              # Naive Bayes training table
        "nb_predict": tl.q_nb_predict,          # NB classifier serving (val split)
        "nb_eval": tl.q_nb_eval,                # confusion + exact P/R/F1
        "kappa_eval": tl.q_kappa_eval,          # Cohen's kappa, exact num/den
        "mcnemar_test": tl.q_mcnemar_test,      # paired classifier comparison
        "auc_eval": ex.q_auc_eval,              # exact ROC-AUC (midrank U)
        "perceptron": tl.q_perceptron,          # batch perceptron trajectory
        "chi2_terms": tl.q_chi2_terms,          # chi-square feature selection
        "als_rank1": rl.q_als_rank1,            # rank-1 ALS factorization
        "ks_source_test": sk.q_ks_source_test,  # exact two-sample KS statistic
        "ridge_regression": ex.q_ridge_regression,  # 3x3 Cramer ridge solve
        "gbdt_model": ex.q_gbdt_model,          # boosted stumps, exact SSE
        "isotonic_calibration": ex.q_isotonic_calibration,  # exact PAVA
        "selection_audit": tl.q_selection_audit,    # per-doc reason codes
        "pretrain_select": tl.q_pretrain_select,    # FLAGSHIP COMPOSITION:
        # quality gate -> decontaminate -> exact dedup -> budget selection
        # --- relational / warehouse surface (TPC-H-shaped tables) ---
        "pricing_summary": rl.q_pricing_summary,    # Q1-shape scan+group-agg
        "nation_order_stats": rl.q_nation_order_stats,  # bucketed hash equi-join
        # same join with the 10 hottest probe keys salted across
        # dedicated buckets — must hash-match the unsalted oracle
        "nation_order_stats_salted":
            lambda sf: rl.q_nation_order_stats(sf, hot_k=10),
        "top_customers": rl.q_top_customers,        # group-agg + dataset-side top-k
        "shipping_priority": rl.q_shipping_priority,  # Q3 shape: 2-key multi-join
        "nation_rollup": rl.q_nation_rollup,        # ROLLUP finalizer over the join
        "local_supplier_volume": rl.q_local_supplier_volume,  # Q5 shape: 6-way join
        "customers_no_orders": rl.q_customers_no_orders,  # bucketed ANTI join
        # bloom semi-join reduction: bloom-proven misses skip the
        # shuffle; hash-matches the SAME anti-join oracle
        "customers_no_orders_bloom": rl.q_customers_no_orders_bloom,
        "order_priority_counts": rl.q_order_priority_counts,  # Q4: EXISTS semi
        # Q13 shape: LEFT OUTER join with zero-fill distribution
        "customer_order_distribution": rl.q_customer_order_distribution,
        "large_volume_customers": rl.q_large_volume_customers,  # Q18: HAVING join
        "order_skyline": rl.q_order_skyline,        # 2-phase Pareto frontier
        "nation_median_order": rl.q_nation_median_order,  # holistic (exact median)
        "nation_median_interp": rl.q_nation_median_interp,  # percentile_cont twin
        "nation_mode_priority": rl.q_nation_mode_priority,  # grouped mode
        "fk_audit": rl.q_fk_audit,                  # referential-integrity audit
        "fd_audit": rl.q_fd_audit,                  # functional-dependency audit
        "nation_p90_order": rl.q_nation_p90_order,  # two-pass exact quantile
        "promo_revenue_share": rl.q_promo_revenue_share,  # Q14: dim-broadcast CASE agg
        "small_qty_revenue": rl.q_small_qty_revenue,  # Q17: decorrelated scalar subquery
        "above_avg_idle_customers": rl.q_above_avg_idle_customers,  # Q22: scalar + anti join
        "line_priority_counts": rl.q_line_priority_counts,  # Q12: joined-attr filter + CASE
        "volume_shipping": rl.q_volume_shipping,        # Q7: cross-nation 6-way join
        "market_share": rl.q_market_share,              # Q8: share num/den per year
        "returned_items": rl.q_returned_items,          # Q10: top-k + point dim attach
        "waiting_suppliers": rl.q_waiting_suppliers,    # Q21: exists/not-exists group rule
        "forecast_revenue": rl.q_forecast_revenue,      # Q6: predicate-heavy scan aggregate
        "nation_profit": rl.q_nation_profit,            # Q9: profit by nation x year
        "top_supplier_revenue": rl.q_top_supplier_revenue,  # Q15: max-with-ties view
        "min_price_supplier": rl.q_min_price_supplier,  # Q2: groupwise-min + dims
        "disjunctive_revenue": rl.q_disjunctive_revenue,  # Q19: OR'd predicate scan
        "copurchase_pairs": rl.q_copurchase_pairs,      # market-basket 2-itemsets
        "association_rules": rl.q_association_rules,    # confidence/lift rules (exact)
        "item_cosine_pairs": rl.q_item_cosine_pairs,    # item-item recommender score
        "record_orders": rl.q_record_orders,            # running-max record scan
        "nation_order_stats_ivm": rl.q_nation_order_stats_ivm,  # join-view IVM
        "top_orders_per_customer": rl.q_top_orders_per_customer,  # ROW_NUMBER top-N per group
        "orders_cube": rl.q_orders_cube,                # CUBE grouping-set lattice
        "order_global_rank": rl.q_order_global_rank,    # global rank via range blocks
        "stratified_budget": rl.q_stratified_budget,    # Hamilton budget allocation
        "shard_plan": rl.q_shard_plan,                  # LPT layout planning
        "hash_ring_counts": ex.q_hash_ring_counts,      # consistent hashing
        "hash_ring_rebalance": ex.q_hash_ring_rebalance,  # scale-out movement
        # --- event-stream operators (keyed windowed / ordered ops) ---
        "sessionize": ev.q_sessionize,
        "peak_concurrency": ev.q_peak_concurrency,  # sweep-line interval max
        "active_time": ev.q_active_time,            # interval-union length
        "late_events": ev.q_late_events,            # watermark/allowed-lateness
        "cusum_days": ev.q_cusum_days,              # cumulative drift detection
        "events_zorder_scan": ev.q_events_zorder_scan,  # Morton-layout 2-D pruning
        # two-level (user, time-slice) plan for monster users; hash-matches
        # the SAME sessionize oracle = plan-equivalence proof
        "sessionize_sliced": ev.q_sessionize_sliced,
        "session_length_hist": ev.q_session_length_hist,  # composition histogram
        "time_rollup": ev.q_time_rollup,            # day/week/month grouping sets
        "dow_profile": ev.q_dow_profile,            # weekly seasonality table
        "asof_join": ev.q_asof_join,
        "windowed_counts": ev.q_windowed_counts,
        "windowed_counts_filled": ev.q_windowed_counts_filled,  # gap-fill row generation
        # incremental view maintenance: base+delta folded state must
        # equal the full recompute — SAME windowed_counts oracle
        "windowed_counts_ivm": ev.q_windowed_counts_ivm,
        "events_range_scan": ev.q_events_range_scan,  # partition-pruned time scan
        "windowed_distinct_users": ev.q_windowed_distinct_users,  # exact windowed dedup
        "windowed_heavy_hitters": ev.q_windowed_heavy_hitters,  # keyed 2-pass MG, exact
        "funnel_counts": ev.q_funnel_counts,        # ordered-subsequence funnel
        "cohort_retention": ev.q_cohort_retention,  # signup-cohort x week matrix
        "conversion_delay": ev.q_conversion_delay,  # exact time-to-convert pcts
        "last_touch": ev.q_last_touch,              # group-wise argmax
        "event_dedup_counts": ev.q_event_dedup_counts,  # stream near-dup rule
        "window_top_users": ev.q_window_top_users,  # group-wise top-k per window
        "rolling_spend": ev.q_rolling_spend,        # RANGE-frame rolling window
        "rate_limit_flags": ev.q_rate_limit_flags,  # sliding-window admission
        "running_spend": ev.q_running_spend,        # UNBOUNDED-PRECEDING scan
        "ewma_spend": ev.q_ewma_spend,              # decay recurrence (EWMA)
        "spend_gini": ev.q_spend_gini,              # exact concentration audit
        "scd2_dim": ev.q_scd2_dim,                  # SCD type-2 dimension build
        "scd2_join": ev.q_scd2_join,                # point-in-time temporal join
        "attribution_linear": ev.q_attribution_linear,  # multi-touch attribution
        "user_features": ev.q_user_features,        # one-pass feature vector
        "rfm_segments": ev.q_rfm_segments,          # exact NTILE RFM scoring
        "props_extract": ev.q_props_extract,        # JSON payload extraction
        "campaign_overlap": ev.q_campaign_overlap,  # interval-overlap join
        "session_copresence": ev.q_session_copresence,  # large-large interval self-join
        "gap_histogram": ev.q_gap_histogram,        # LAG-offset window shape
        "type_transitions": ev.q_type_transitions,  # Markov pair mining
        "sliding_counts": ev.q_sliding_counts,
        "events_pivot": ev.q_events_pivot,              # row->column wide pivot
        "user_event_paths": ev.q_user_event_paths,      # ordered string_agg journeys
        "anomalous_days": ev.q_anomalous_days,
        "mad_outlier_days": ev.q_mad_outlier_days,  # median/MAD robust twin
        "daily_autocorr": ev.q_daily_autocorr,  # exact ACF sufficient stats
        "haar_daily": ev.q_haar_daily,          # integer Haar filter bank
        "seasonal_forecast_eval": ev.q_seasonal_forecast_eval,  # MASE baseline          # integer-exact z-score outliers
        "ab_test_flags": ev.q_ab_test_flags,            # integer two-sample test
        "range_join_counts": ev.q_range_join_counts,
        "multimodal_meta": ex.q_multimodal_meta,        # decode stub
        "multimodal_frames": ex.q_multimodal_frames,    # frame-sample stage
        "multimodal_features": ex.q_multimodal_features,  # feature-extract stage
    }


def oracle_sql() -> dict[str, str]:
    from candidategeneration_ray.pipelines.sql_oracles import (
        bloom_oracles, cm_oracles,
        core_oracles, extras_oracles, hll_oracles, kmeans_oracles,
        knn_oracles, mixture_oracles, predictive_oracles,
        graph_oracles, pct_rank_oracles, pretrain_oracles,
        quality_filter_oracles,
        relational_oracles, session_hist_oracles, sketch_oracles,
        sliding_oracles,
        cluster_label_oracles, cohort_oracles, events_topk_oracles,
        funnel_oracles,
        heavy_hitter_oracles, ivf_delta_oracles, kmeans_ari_oracles,
        campaign_oracles, containment_oracles, lexicon_oracles,
        postings_bytes_oracles,
        regex_oracles, related_terms_oracles, rolling_oracles,
        kmeans_eval_oracles,
        keyed_hll_oracles, last_touch_oracles,
        kmeans_purity_oracles, minspan_oracles, phrase_bm25_oracles,
        priority_join_oracles, gap_chunk_profile_oracles,
        copresence_oracles, digest_oracles, gapfill_oracles, late_oracles, cusum_oracles,
        token_offset_oracles,
        jl_oracles,
        gram_oracles,
        regression_oracles,
        ivfpq_oracles,
        pq_oracles,
        range_scan_oracles,
        lsh_plane_oracles,
        holistic_audit_oracles,
        top_pairs_oracles,
        fuzzy_join_oracles,
        bpe_oracles,
        source_similarity_oracles,
        delta_dedup_oracles,
        ppr_oracles,
        label_vote_oracles,
        p90_oracles,
        retrieval_eval_oracles,
        substring_oracles,
        skyline_oracles,
        tpch_shapes_oracles,
        tpch_joins2_oracles,
        pivot_oracles,
        topn_group_oracles,
        sequence_manifest_oracles,
        snapshot_diff_oracles,
        common_neighbor_oracles,
        bool_diff_oracles,
        collapse_oracles, cube_oracles, impact_oracles, ltr_oracles,
        mmr_oracles, ndcg_oracles, ordered_window_oracles,
        ams_cs_oracles, perceptron_oracles, chi2_oracles, als_oracles,
        ks_oracles, ridge_oracles,
        boolean_query_oracles, postings_bytes_bp_oracles, sdm_oracles,
        corrected_query_oracles, index_report_oracles, redact_oracles,
        synonym_oracles,
        wildcard_oracles,
        session11_oracles,
        session12_oracles,
        session13_oracles,
        session14_oracles,
        session16_oracles,
        session17_oracles,
        path_anomaly_oracles,
        global_rank_oracles,
        ab_test_oracles,
        transition_oracles,
        triangle_oracles,
        feature_oracles, hits_oracles,
        props_moments_oracles,
        positional_oracles,
        proximity_oracles, q3_oracles, q5_oracles, rollup_oracles,
        rrf_oracles,
        snippet_oracles, source_quantile_oracles,
        term_embedding_oracles, textlm_oracles,
        windowed_distinct_oracles,
    )

    d = {**core_oracles(), **predictive_oracles(), **extras_oracles(),
            **sketch_oracles(), **kmeans_oracles(), **knn_oracles(),
            **mixture_oracles(), **sliding_oracles(),
            **quality_filter_oracles(), **hll_oracles(),
            **textlm_oracles(), **graph_oracles(),
            **source_quantile_oracles(), **pretrain_oracles(),
            **relational_oracles(), **windowed_distinct_oracles(),
            **cluster_label_oracles(), **kmeans_eval_oracles(),
            **events_topk_oracles(), **kmeans_purity_oracles(),
            **positional_oracles(), **heavy_hitter_oracles(),
            **ivf_delta_oracles(), **proximity_oracles(),
            **kmeans_ari_oracles(), **funnel_oracles(),
            **cohort_oracles(), **q3_oracles(), **minspan_oracles(),
            **rollup_oracles(), **term_embedding_oracles(),
            **snippet_oracles(), **bloom_oracles(),
            **pct_rank_oracles(), **keyed_hll_oracles(),
            **cm_oracles(), **session_hist_oracles(),
            **last_touch_oracles(), **rrf_oracles(),
            **phrase_bm25_oracles(), **q5_oracles(),
            **lexicon_oracles(), **regex_oracles(),
            **rolling_oracles(), **containment_oracles(),
            **postings_bytes_oracles(), **related_terms_oracles(),
            **campaign_oracles(), **priority_join_oracles(),
            **gap_chunk_profile_oracles(), **triangle_oracles(), **feature_oracles(),
            **props_moments_oracles(), **hits_oracles(),
            **transition_oracles(), **label_vote_oracles(),
            **skyline_oracles(), **tpch_shapes_oracles(),
            **tpch_joins2_oracles(), **pivot_oracles(),
            **topn_group_oracles(), **sequence_manifest_oracles(),
            **snapshot_diff_oracles(), **common_neighbor_oracles(),
            **bool_diff_oracles(), **cube_oracles(), **collapse_oracles(), **mmr_oracles(), **impact_oracles(), **ltr_oracles(),
            **ndcg_oracles(), **ordered_window_oracles(),
            **postings_bytes_bp_oracles(), **sdm_oracles(),
            **ams_cs_oracles(), **perceptron_oracles(),
            **chi2_oracles(), **als_oracles(), **ks_oracles(),
            **ridge_oracles(),
            **boolean_query_oracles(), **wildcard_oracles(),
            **corrected_query_oracles(), **synonym_oracles(),
            **index_report_oracles(), **redact_oracles(),
            **path_anomaly_oracles(), **global_rank_oracles(), **ab_test_oracles(),
            **retrieval_eval_oracles(), **copresence_oracles(),
            **substring_oracles(), **holistic_audit_oracles(),
            **p90_oracles(), **gapfill_oracles(), **late_oracles(), **cusum_oracles(), **ppr_oracles(),
            **top_pairs_oracles(), **fuzzy_join_oracles(), **bpe_oracles(), **source_similarity_oracles(), **delta_dedup_oracles(), **digest_oracles(),
            **range_scan_oracles(), **pq_oracles(), **ivfpq_oracles(),
            **lsh_plane_oracles(),
            **regression_oracles(), **gram_oracles(), **jl_oracles(),
            **token_offset_oracles(), **session11_oracles(),
            **session12_oracles(), **session13_oracles(),
            **session14_oracles(), **session16_oracles(),
            **session17_oracles()}
    # the sliced (two-level) sessionize plan must equal the one-level
    # plan — same oracle, so the driver hash-checks plan equivalence
    d["sessionize_sliced"] = d["sessionize"]
    # the prefix-filtered (PPJoin) plan must equal the exact all-pairs
    # plan — same oracle, so the driver hash-checks plan equivalence
    d["jaccard_pairs_prefix"] = d["jaccard_pairs"]
    # term-sharded phrase fleet must equal the single-task server —
    # same oracle, hash-checks the fleet's disjoint-ownership merge
    d["phrase_postings_sharded"] = d["phrase_postings"]
    # IVM-maintained window view must equal the full recompute
    d["windowed_counts_ivm"] = d["windowed_counts"]
    # IVM-maintained JOIN view must equal the full shuffle-join recompute
    d["nation_order_stats_ivm"] = d["nation_order_stats"]
    # bloom-prefiltered anti join must equal the plain anti join
    d["customers_no_orders_bloom"] = d["customers_no_orders"]
    # HLL mergeability: union of per-source sketches must equal the
    # global sketch — same oracle, hash-checks the merge operator
    d["hll_union_distinct"] = d["hll_distinct_terms"]
    # result-cache serving must be invisible to results — same oracle,
    # so the driver hash-checks the cache layer (fill + hit paths)
    d["cached_bm25_topk"] = d["bm25_topk"]
    # DAAT MaxScore must be rank-identical to block-max WAND — same
    # oracle, so the driver hash-checks the pruning strategy itself
    d["maxscore_topk"] = d["bm25_topk"]
    # ingest-time percolation must equal index-side conjunctive AND —
    # same oracle, so the driver hash-checks plan equivalence
    d["percolate_matches"] = d["bool_and_docs"]
    # SvS (binary-probe) intersection must equal the merge intersection
    # — same oracle, hash-checks the list-intersection algorithm swap
    d["bool_and_docs_svs"] = d["bool_and_docs"]
    # the term-partitioned serving fleet must be rank-identical to the
    # single engine — same oracle, hash-checks the distribution strategy
    d["term_sharded_bm25_topk"] = d["bm25_topk"]
    # cursor pagination: page 2 = the same ranking window, ranks 11..20
    d["search_after_topk"] = d["bm25_topk"].replace(
        "WHERE rank <= 10", "WHERE rank BETWEEN 11 AND 20")
    # an index stored under the binary-packing codec must serve the
    # exact same ranking — same oracle, hash-checks codec losslessness
    # through the full build+serve path
    d["bm25_topk_bp"] = d["bm25_topk"]
    d["bm25_topk_ef"] = d["bm25_topk"]
    d["bm25_topk_rice"] = d["bm25_topk"]
    d["bm25_topk_bic"] = d["bm25_topk"]
    # classifier eval: confusion + per-class precision/recall/F1 over
    # the nb_predict oracle's own prediction text (composition proof —
    # truth joins back to documents; classes = distinct true langs)
    d["nb_eval"] = (
        "WITH preds AS MATERIALIZED (\n" + d["nb_predict"] + "\n),\n"
        """conf AS (
  SELECT d.lang AS true_lang, p.pred_lang, CAST(count(*) AS BIGINT) AS n
  FROM preds p JOIN documents d USING (doc_id) GROUP BY 1, 2),
cls AS (SELECT DISTINCT true_lang AS lang FROM conf),
agg AS (
  SELECT c.lang,
    CAST(coalesce((SELECT sum(n) FROM conf WHERE true_lang = c.lang), 0)
         AS BIGINT) AS support,
    CAST(coalesce((SELECT sum(n) FROM conf WHERE true_lang = c.lang
                   AND pred_lang = c.lang), 0) AS BIGINT) AS tp,
    CAST(coalesce((SELECT sum(n) FROM conf WHERE pred_lang = c.lang
                   AND true_lang <> c.lang), 0) AS BIGINT) AS fp,
    CAST(coalesce((SELECT sum(n) FROM conf WHERE true_lang = c.lang
                   AND pred_lang <> c.lang), 0) AS BIGINT) AS fn
  FROM cls c)
SELECT lang, support, tp, fp, fn,
  CASE WHEN tp + fp = 0 THEN CAST(0 AS BIGINT)
       ELSE CAST((1000000 * tp) // (tp + fp) AS BIGINT)
  END AS precision_ppm,
  CASE WHEN tp + fn = 0 THEN CAST(0 AS BIGINT)
       ELSE CAST((1000000 * tp) // (tp + fn) AS BIGINT)
  END AS recall_ppm,
  CASE WHEN 2 * tp + fp + fn = 0 THEN CAST(0 AS BIGINT)
       ELSE CAST((2000000 * tp) // (2 * tp + fp + fn) AS BIGINT)
  END AS f1_ppm
FROM agg""")
    # McNemar's paired test: NB (pred_lang='en') vs the langid
    # stopword-ratio heuristic on the shared is-English task, composed
    # over the SAME nb_predict oracle + the shared words/wstats CTEs;
    # continuity-corrected chi2 as exact num/den ((0,1) when b == c)
    from candidategeneration_ray.pipelines.sql_oracles import _WORDS_CTE

    d["mcnemar_test"] = (
        "WITH preds AS MATERIALIZED (\n" + d["nb_predict"] + "\n),\n"
        + _WORDS_CTE + ",\n"
        """j AS (
  SELECT ((p.pred_lang = 'en') = (d.lang = 'en')) AS a_ok,
         ((5 * coalesce(w.n_stop, 0) >=
           greatest(coalesce(w.n_words, 0), 1)) = (d.lang = 'en')) AS b_ok
  FROM preds p JOIN documents d USING (doc_id)
  LEFT JOIN wstats w ON w.doc_id = d.doc_id),
cnt AS (
  SELECT CAST(count(*) AS BIGINT) AS n,
         CAST(count(*) FILTER (a_ok AND b_ok) AS BIGINT) AS both_right,
         CAST(count(*) FILTER (NOT a_ok AND NOT b_ok) AS BIGINT)
           AS both_wrong,
         CAST(count(*) FILTER (a_ok AND NOT b_ok) AS BIGINT) AS b_cell,
         CAST(count(*) FILTER (NOT a_ok AND b_ok) AS BIGINT) AS c_cell
  FROM j)
SELECT n, both_right, both_wrong, b_cell, c_cell,
  CASE WHEN abs(b_cell - c_cell) > 1
       THEN (abs(b_cell - c_cell) - 1) * (abs(b_cell - c_cell) - 1)
       ELSE CAST(0 AS BIGINT) END AS chi2_num,
  CASE WHEN abs(b_cell - c_cell) > 1 THEN b_cell + c_cell
       ELSE CAST(1 AS BIGINT) END AS chi2_den
FROM cnt""")
    # Cohen's kappa over the SAME nb_predict oracle predictions
    # (composition proof): N·A − Σrow·col over N² − Σrow·col, all
    # integers — chance-corrected agreement with no float division
    d["kappa_eval"] = (
        "WITH preds AS MATERIALIZED (\n" + d["nb_predict"] + "\n),\n"
        """conf AS (
  SELECT d.lang AS true_lang, p.pred_lang, CAST(count(*) AS BIGINT) AS n
  FROM preds p JOIN documents d USING (doc_id) GROUP BY 1, 2),
tot AS (
  SELECT CAST(sum(n) AS HUGEINT) AS nt,
         CAST(coalesce(sum(n) FILTER (true_lang = pred_lang), 0)
              AS HUGEINT) AS na
  FROM conf),
rm AS (SELECT true_lang AS lang, CAST(sum(n) AS HUGEINT) AS rn
       FROM conf GROUP BY 1),
cm AS (SELECT pred_lang AS lang, CAST(sum(n) AS HUGEINT) AS cn
       FROM conf GROUP BY 1),
pe AS (SELECT CAST(coalesce(sum(r.rn * c.cn), 0) AS HUGEINT) AS e
       FROM rm r JOIN cm c USING (lang))
SELECT CAST(nt AS BIGINT) AS n, CAST(na AS BIGINT) AS n_agree,
       CAST(e AS BIGINT) AS pe_cross,
       CAST(nt * na - e AS BIGINT) AS kappa_num,
       CAST(nt * nt - e AS BIGINT) AS kappa_den
FROM tot, pe""")
    # rank-biased overlap: the exact integer weight table applied over
    # the SAME ranking_agreement oracle (composition proof)
    from candidategeneration_ray.pipelines.docquery import rbo_weights

    _rbo_w, _rbo_den = rbo_weights()
    _rbo_vals = ", ".join(f"({d}, {w})" for d, w in sorted(_rbo_w.items()))
    d["ranking_rbo"] = (
        "WITH ag AS (\n" + d["ranking_agreement"] + "\n),\n"
        f"wt(depth, w) AS (VALUES {_rbo_vals})\n"
        "SELECT ag.query_id, CAST(sum(ag.n_common * wt.w) AS BIGINT)"
        " AS rbo_num,\n"
        f"       CAST({_rbo_den} AS BIGINT) AS rbo_den\n"
        "FROM ag JOIN wt USING (depth) GROUP BY ag.query_id")
    # Kendall tau: concordant/discordant pairs over the common docs of
    # the bm25 and LTR-rerank oracles (composition proof)
    d["kendall_tau"] = (
        "WITH a AS (\n" + d["bm25_topk"] + "\n),\n"
        "b AS (\n" + d["ltr_rerank_topk"] + "\n),\n"
        """j AS (SELECT a.query_id, a.doc_id, a.rank AS ra, b.rank AS rb
       FROM a JOIN b USING (query_id, doc_id)),
pairs AS (
  SELECT x.query_id,
         CASE WHEN (x.ra < y.ra) = (x.rb < y.rb)
              THEN 1 ELSE 0 END AS conc
  FROM j x JOIN j y ON y.query_id = x.query_id
                   AND y.doc_id > x.doc_id)
SELECT j.query_id,
       CAST(count(DISTINCT j.doc_id) AS BIGINT) AS n_common,
       CAST(coalesce((SELECT sum(conc) FROM pairs p
                      WHERE p.query_id = j.query_id), 0) AS BIGINT)
         AS concordant,
       CAST(coalesce((SELECT count(*) - sum(conc) FROM pairs p
                      WHERE p.query_id = j.query_id), 0) AS BIGINT)
         AS discordant
FROM j GROUP BY j.query_id""")
    # ANN recall matrix: one row per deterministic method, composing
    # all six ANN oracles against the exact-cosine anchor
    d["ann_recall_report"] = " UNION ALL ".join(
        f"SELECT '{m}' AS method, CAST(count(e.vec_id) AS BIGINT) AS n_hits, "
        f"CAST(coalesce(max(CASE WHEN a.rank = 1 AND e.rank = 1 "
        f"THEN 1 END), 0) AS BIGINT) AS top1_match "
        f"FROM ({d[key]}) a LEFT JOIN ({d['ann_cosine_top10']}) e "
        f"ON e.vec_id = a.vec_id"
        for m, key in [
            ("cosine", "ann_cosine_top10"),
            ("ivf", "ann_ivf_top10"),
            ("ivfk", "ann_ivf_kmeans_top10"),
            ("ivfpq", "ann_ivfpq_top10"),
            ("pq", "ann_pq_top10"),
            ("sq8", "ann_sq8_top10"),
        ])
    # codec matrix fold: ONE row per codec summing the SAME analytic
    # size models the per-term entries verify — composition proof over
    # all five codec oracles
    d["codec_report"] = " UNION ALL ".join(
        f"SELECT '{c}' AS codec, CAST(count(*) AS BIGINT) AS n_terms, "
        f"CAST(sum(n) AS BIGINT) AS n_postings, "
        f"CAST(sum({col}) AS BIGINT) AS docs_bytes "
        f"FROM ({d[key]})"
        for c, key, col in [
            ("varint", "postings_bytes", "docs_bytes"),
            ("bic", "postings_bytes_bic", "docs_bytes_bic"),
            ("bp", "postings_bytes_bp", "docs_bytes_bp"),
            ("ef", "postings_bytes_ef", "docs_bytes_ef"),
            ("rice", "postings_bytes_rice", "docs_bytes_rice"),
        ])
    # time-travel: the bm25 oracle with `documents` rebound to the base
    # ingestion half — an uncompacted ingest must leave the old epoch
    # exactly servable
    d["asof_bm25_topk"] = (
        "WITH base_docs AS MATERIALIZED (SELECT * FROM documents "
        "WHERE doc_id < (SELECT count(*) // 2 FROM documents)),\n"
        + d["bm25_topk"].replace("documents", "base_docs")[len("WITH "):]
    )
    # curated-corpus index: the bm25 oracle with `documents` rebound to
    # the near-dup survivors (the cluster_representatives oracle's
    # keep-best picks) — stats, df and every score re-derive over the
    # deduplicated corpus, hash-verifying the curate→build→serve wiring
    d["dedup_bm25_topk"] = (
        "WITH reps AS MATERIALIZED (\n"
        + d["cluster_representatives"] + "\n),\n"
        "dedup_docs AS MATERIALIZED (\n"
        "  SELECT d.* FROM documents d JOIN reps r ON r.rep_doc = d.doc_id"
        "),\n"
        + d["bm25_topk"].replace("documents", "dedup_docs")[len("WITH "):]
    )
    return d
