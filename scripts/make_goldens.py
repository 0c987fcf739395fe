"""Generate golden (row-count, value-hash) fixtures for the
deterministic rows-only queries — the ones with no SQL oracle
(iterative / approximate / crawl pipelines). Every listed query is a
pure function of its inputs + seeds, so its driver-model hash is stable
across runs AND parallelism levels; tests/test_goldens.py asserts
against these, converting the queries from rows-only to value-checked.

Usage: python scripts/make_goldens.py [sf_dir] [query ...]
Writes tests/data/goldens_<sf>.json (merging over any existing file).
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from rendler_ray.goldenhash import result_hash  # noqa: E402

# every no-oracle query whose output is deterministic (seeded synth
# inputs, seeded algorithms, fixed-point floats). lang_id_docs has a
# real SQL oracle; nothing here is timing- or scheduling-dependent.
GOLDEN_QUERIES = [
    "rouge_l_adjacent_pairs",
    "vacuum_expired_snapshots",
    "approx_distinct_users",
    "approx_percentiles_events",
    "approx_percentiles_by_type",
    "ann_ivf_topk",
    "kmeans_embedding_clusters",
    "pagerank_crawl_graph",
    "hits_crawl_graph",
    "near_dup_source_matrix",
    "pagerank_joined_crawl",
    "connected_components_crawl",
    "bpe_train_merges",
    "bpe_encode_docs",
    "simhash_docs",
    "minhash_dup_groups",
    "ngram_jaccard_pairs",
    "simhash_near_dup_pairs",
    "near_dup_dedup_docs",
    "embedding_near_dup_lsh",
    "crawl_fetch",
    "crawl_edges",
    "crawl_embed",
    "crawl_enriched",
    "crawl_enriched_bpe",
    "crawl_polite",
    "crawl_auto_robots",
    "crawl_redirects",
    "crawl_canonical_groups",
    "training_data_pipeline",
    "crawl_content_dedup",
    "crawl_incremental",
    "crawl_diff_edges",
    "crawl_diff_pages",
    "crawl_prioritized",
    "host_graph_stats",
    "scrub_url_tokens",
    "doc_fingerprint_winnow",
    "near_dup_keep_best_docs",
    "ann_pq_topk",
    "media_text_match",
    "label_prop_crawl",
    "kcore_crawl_graph",
    "pca_project_embeddings",
    "mmr_rerank_docs",
    "knn_graph_lsh_embeddings",
    "media_features",
    "media_thumbnails",
    "media_frame_samples",
    "media_audio_segments",
    "render_interleaved",
    "cdc_chunk_docs",
    "cdc_dedup_stats",
    "near_dup_incremental_docs",
    "scc_crawl_graph",
    "shard_balance_plan",
    "crawl_graph_stats",
    "dp_source_counts",
    "bowtie_crawl_graph",
    "jl_project_embeddings",
    "kcenter_coreset_embeddings",
    "compact_docs_files",
    "compression_ratio_docs",
    "leakage_free_split_docs",
    "adamic_adar_linkpred",
    "media_phash_dedup",
    "personalized_pagerank_crawl",
    "dedup_threshold_sweep",
    "winnow_copy_pairs",
    "crawl_host_budget_audit",
    "crawl_depth_histogram",
    "betweenness_seed_sample",
    "ann_bq_topk",
    "maximal_matching_graph",
    "maxsim_multivector_topk",
    "mst_crawl_graph",
    "ktruss_crawl_graph",
    "isotonic_calibrate_scores",
    "bridges_crawl_graph",
    "articulation_points_graph",
]


def golden_path(sf_dir: str) -> str:
    sf = os.path.basename(os.path.normpath(sf_dir))
    return os.path.join(REPO, "tests", "data", f"goldens_{sf}.json")


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = set(sys.argv[2:])

    import ray
    if not ray.is_initialized():
        ray.init(address="local", num_cpus=8, include_dashboard=False,
                 logging_level="ERROR")
    from ray.data import DataContext
    DataContext.get_current().enable_progress_bars = False

    import __ray_entry__ as E
    qs = E.queries()

    path = golden_path(sf_dir)
    goldens: dict[str, dict] = {}
    if os.path.exists(path):
        with open(path) as f:
            goldens = json.load(f)

    for name in GOLDEN_QUERIES:
        if only and name not in only:
            continue
        t0 = time.time()
        rows, h = result_hash(qs[name](sf_dir))
        goldens[name] = {"rows": rows, "hash": h}
        print(f"{name}: rows={rows} hash={h} [{time.time() - t0:.1f}s]")

    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "w") as f:
        json.dump(dict(sorted(goldens.items())), f, indent=2)
        f.write("\n")
    print(f"wrote {path}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
