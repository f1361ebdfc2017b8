"""Registry ordering: least-recently-driver-checked first.

The external driver samples a PREFIX of the registry (50 queries/round).
Rotating the never-yet-driver-checked queries to the front means each
round's CORRECTNESS_r{N}.json covers the operators with the weakest
external evidence (VERDICT r3 item 1: 46 queries had only local-sweep
evidence). tools/check_correctness.py runs the FULL registry regardless
of order and is the pre-commit gate; CORRECTNESS_full_r4.json is the
committed all-green local sweep.
"""

from __future__ import annotations

from sciscraper_ray.pipelines.queries._shared import ORACLE, QUERIES

# Union of CORRECTNESS_r01/r02/r03 driver samples: every query some driver
# round has verified. The complement (everything newer or never sampled,
# including the round-4 additions media_png_features and
# page_validate_identifiers) goes to the front of the registry.
_DRIVER_CHECKED_R123 = (
    # r01 sample
    "doc_tokenize", "doc_wordscore", "doc_wordscore_refwords",
    "doc_top3_target", "doc_top3_bycatch", "doc_identifiers",
    "doc_parentheticals", "lineitem_pricing", "orders_by_region",
    "top_tokens_global", "source_token_tally", "enrich_wordscore",
    "enrich_ratelimited", "citation_tally", "citations_enriched",
    "link_routing", "host_tally_salted", "events_hourly",
    "events_keep_latest", "events_json_props", "doc_split_assign",
    "doc_chunks", "training_prep", "doc_tfidf_topk", "doc_decontaminate",
    "doc_pii_scrub", "events_sessionize", "hll_distinct_users",
    "events_asof_join", "events_range_join", "dedup_exact",
    "dedup_minhash", "dedup_simhash", "dedup_ngram_jaccard",
    "dedup_components", "dedup_cluster_survivors", "dedup_embedding",
    "knn_cosine", "ann_ivf", "ann_srp_bucketed", "doc_lang_id",
    "doc_quality", "doc_bpe_tokens", "doc_fingerprint", "doc_winnow",
    "media_image_features", "media_audio_frames", "media_video_frames",
    "nested_unwrap", "schema_cast",
    # r03 sample (the round-3 additions + the mid-batch it reached)
    "token_type_stats", "doc_ngram_novelty", "graph_hits",
    "events_type_transitions", "token_zipf_slope",
    "crawl_depth_from_seeds", "link_indegree_histogram",
    "token_pmi_collocations", "doc_lang_mismatch", "redirect_resolve",
    "dedup_teaser_prefix", "host_topk_docs", "page_meta_extract",
    "doc_length_median_by_lang", "crawl_schedule_waves",
    "host_triangle_count", "top_tokens_by_lang", "doc_boilerplate_strip",
    "page_link_graph", "page_anchor_texts", "doc_boolean_retrieval",
    "doc_iqr_filter", "page_charset_decode", "sitemap_roundtrip",
    "scholar_paginate", "doc_bm25_topk", "doc_lr_score",
    "token_inverted_index", "warc_roundtrip", "url_robots_filter",
    "token_pair_counts", "doc_mixture_quota", "doc_unigram_freq_score",
    "events_latest_k", "resumable_extract", "dom_extract",
    "terms_from_txt", "extract_spans", "terms_from_csv", "html_extract",
    "pdf_extract", "page_extract_identifiers",
    "page_extract_identifiers_metadata", "page_extract_pipeline",
    "lineitem_quantiles", "doc_repetition", "orders_anti_join",
    "token_bigram_next", "doc_sample_stratified", "order_lineitem_join",
)


def _rotate_registry() -> None:
    """Rebuild both registries: never-driver-checked first (registration
    order), driver-checked behind (registration order)."""
    checked = set(_DRIVER_CHECKED_R123)

    def reorder(d: dict) -> dict:
        front = [n for n in d if n not in checked]
        back = [n for n in d if n in checked]
        return {n: d[n] for n in front + back}

    qs = reorder(QUERIES)
    QUERIES.clear()
    QUERIES.update(qs)
    osq = reorder(ORACLE)
    ORACLE.clear()
    ORACLE.update(osq)


_rotate_registry()
