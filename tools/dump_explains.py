#!/usr/bin/env python
"""Regenerate EXPLAIN.md: `.explain("formatted")` for the headline queries,
annotated with what to look for in each plan. Run from the repo root:

    python tools/dump_explains.py
"""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from advanced_elb_logs_etl_spark.plans.catalog import CATALOG  # noqa: E402
from advanced_elb_logs_etl_spark.session import get_spark  # noqa: E402

SF = "/root/testdata/sf0.001"

#: query -> what the plan proves
HEADLINERS = {
    "pricing_summary": "partial+final HashAggregate; scan reads only the 5 needed columns",
    "hourly_agg": "single shuffle on the group keys; null-key filter pushed to the scan",
    "error_report": "IN-list filter in PushedFilters — the scan skips non-matching row groups",
    "sessionize": "ONE Exchange hashpartitioning feeds every Window operator (W1-W5)",
    "rolling_5min_count": "RANGE frame on unix_micros over the same single partitioning",
    "dim_enrich_join": "both dimension joins are BroadcastHashJoin — fact side never shuffles",
    "anti_join_uncached": "BroadcastHashJoin LeftAnti — cache-miss probe without a fact shuffle",
    "topk_orders": "TakeOrderedAndProject: per-partition heaps, no global Sort",
    "minhash_lsh_neardup": "banding equi-join on (band, key); no cross join anywhere",
    "ngram_jaccard_pairs": "inverted-index equi-join on shingle hash + partial-agg pair counts",
    "ann_cosine_topk": "broadcast of the query vectors; corpus scan stays shuffle-free until top-k",
    "shipping_priority_q3": "filters pushed to all three scans; customer broadcast into orders; o-lineitem HINTED ShuffledHashJoin (never broadcast the fact side); TakeOrdered top-10",
    "local_supplier_q5": "region filter prunes through two dim hops; 3 broadcast joins",
    "pipeline_e2e_hourly": "full pipeline: 2 broadcast joins, no SortMergeJoin, no Python; "
                           "only shuffles are the dim distinct + countDistinct expand + final agg",
    "decontaminate_corpus": "benchmark hash set broadcast; corpus side narrow map + keyed aggs, no cross join",
    "embedding_neardup_blocked": "IVF-cluster equi-join blocking — candidate pairs scale with cluster "
                                 "co-membership, not corpus^2",
    "interdoc_segment_dedup": "segment explode -> keyed agg -> anti join (no cartesian) -> "
                              "co-partitioned reassembly",
    "chunk_documents": "narrow generate+explode over a materialized token array; no shuffle at all",
    "funnel_conversion": "every join and aggregation hashes on user_id; stage frames shrink "
                         "monotonically",
    "epoch_mix_corpus": "pure generate+explode, zero Exchange operators",
    "order_priority_q4": "EXISTS planned as hash LeftSemi; non-equi ship-late predicate rides the "
                         "equi orderkey join (no NestedLoop)",
    "returned_item_q10": "returnflag pushed to the lineitem scan; customer/nation broadcast; "
                         "top-20 via TakeOrderedAndProject",
    "parts_supplier_q16": "brand/size filters pushed to the part scan; part broadcasts; two-phase "
                          "distinct agg without Expand",
    "first_last_by_key": "min_by/max_by struct form: ONE hash aggregation, no Window operator",
    "sequential_dedup_runs": "lag + running sum share one (user, ts, id) Exchange+Sort; downstream "
                             "aggs reuse the partitioning",
    "levenshtein_block_pairs": "self-join blocked on the source equi key — no CartesianProduct",
    "profile_table_approx": "bound-check gate: exact profile (Expand) + approx profile (no Expand) joined on col_name — two passes measured faster than sketches riding the Expand",
    "zorder_clustering_preview": "Morton z-value is pure codegen integer math; one repartitionByRange-equivalent bucket agg",
    "compaction_plan_bins": "size-DESC cumulative offsets via the range-partitioned two-phase scan - no single-task window",
    "session_window_batch": "native session_window: single hash partition by user, engine-side "
                            "interval merge, no lag/cumsum plumbing",
    "incremental_agg_merge": "two partial hash aggs unioned + tiny merge agg — the re-aggregable "
                             "state shape incremental backfills rely on",
    "decimal_exact_ledger": "DECIMAL sums stay partial+final HashAggregate (Decimal128 state) — "
                            "exactness costs no extra shuffle vs the double ledger",
    "interval_overlap_join": "pair join is a hash equi-join on the band key; overlap range "
                             "predicates ride as join conditions — no CartesianProduct",
    "skew_salted_join": "dim exploded x16 then BroadcastHashJoin on (key, salt) — the fact side "
                        "never shuffles and one hot key spreads over 16 tasks",
    "doc_minhash_containment": "blocked self-join on (lang, bucket) equi keys; array_intersect "
                               "runs per-pair in the join projection, no explode of candidates",
    "unpivot_metrics": "unpivot is an Expand (3 rows per input row, in-place); the only Exchange "
                       "is the final hash agg",
    "time_spine_gap_fill": "spine is generate+explode from the per-series bounds (no driver loop); "
                           "islands window runs over only the missing rows",
    "event_attribution_last_touch": "running conditional max — one Exchange+Sort on user_id "
                                    "replaces a purchases x clicks self-join",
    "ua_family_counts": "the whole rule-table CASE chain is a single whole-stage-codegen "
                        "projection; one 12-key hash agg",
    "setsim_prefix_join": "prefix-filtered Jaccard: candidates from a rare-shingle equi-join "
                          "over the persisted spine — no CartesianProduct, per-doc windows only",
    "ks_two_sample_values": "cumulative CDFs via range-partitioned two-phase scan — no "
                            "single-partition data window; offsets broadcast back",
    "rfm_segmentation": "three scalable_ntile passes: RangePartitioning + per-partition rank; "
                        "the only SinglePartition exchanges carry num_ranges rows",
    "grouping_sets_pricing": "GROUPING SETS = one Expand + ONE hash aggregation; no "
                             "per-granularity rescan or union",
    "centroid_cosine_outliers": "decimal-snapped sums keep HashAggregate shape; centroid and "
                                "norm frames broadcast back to the exploded spine",
    "chi_square_type_bucket": "contingency cells + two margin re-aggs broadcast back; events "
                              "shuffle once into the cell agg",
    "triangle_census": "one-shuffle edge build (grouped array + in-row pair explode); "
                       "degree-ordered wedge join bounds fan-out at ~sqrt(|E|); closure "
                       "probe HINTED ShuffledHashJoin (never sort the wedge stream)",
    "semantic_dedup_corpus": "centroids broadcast into the assignment kernel; candidate "
                             "pairs from a CLUSTER-EQUI self-join (no CartesianProduct); "
                             "exemplar pick is ONE HashAggregate (min struct) — no "
                             "per-component Window, so giant dup components can't "
                             "single-task-sort",
    "gopher_rules_battery": "one narrow whole-stage-codegen Project over (doc_id, text) — "
                            "15 output columns, zero Exchange operators, line/word rules "
                            "fold over split arrays in-row",
    "alternating_components": "two grouped-min shuffles per round over the EDGE set only; "
                              "localCheckpoint per round keeps lineage flat; O(log n) "
                              "rounds regardless of graph diameter",
    "lm_perplexity_filter": "ONE transition agg trains the model; word/floor model frames "
                            "broadcast into scoring; selection is TakeOrderedAndProject "
                            "(never a global sort of per-doc NLL rows)",
    "bm25_topk": "tokenize+explode restricted to the 4 query terms; 1-row corpus stats and "
                 "|q|-row idf broadcast; TakeOrderedAndProject top-50",
    "pq_adc_topk": "LUTs ride as array literals — per-row work is M element_at lookups + "
                   "an integer sum; TakeOrdered(k) per query; rank Window only AFTER the "
                   "k-row limit; zero Python in the search plan",
    "cm_point_frequency": "build = ONE map-side-combinable hash agg onto <= d*w cells "
                          "(localCheckpointed, so the guard + probe read cells, not the "
                          "corpus); probe = |q|*d explode joined against the broadcast "
                          "cell frame; the 1-row geometry guard rides the probe plan",
    "stream_cm_point_frequency": "real micro-batch replay; per batch one bounded cell agg "
                                 "+ a <= d*w-row union with the prior snapshot; estimates "
                                 "probe the materialized store, never the stream",
    "classifier_score_topk": "one evaluate-once n-gram explode; 256-row model joined as "
                             "BroadcastHashJoin; single per-doc HashAggregate; "
                             "TakeOrderedAndProject top-50 (no global Sort)",
    "kmv_distinct_setops": "each build = map-side-partial distinct agg + TakeOrdered(k); "
                           "every downstream frame is k rows (checkpointed cells), the "
                           "set ops and exact lanes stitch as broadcast 1-row frames",
    "stream_kmv_distinct": "real 3-batch replay; per batch a 2k-row TakeOrdered union "
                           "with the prior minima snapshot; the estimate reads the "
                           "k-row store, never the stream",
    "butterfly_census": "wedge self-join equi-keyed on the part side (SHJ probe) + two "
                        "hash aggs; census scalars combine as 1-row broadcast frames — "
                        "no CartesianProduct, no global Sort",
    "attribution_report": "ONE per-user equi-join with the lookback predicate in the "
                          "join condition; all three windows share the (u, conv_id) "
                          "Exchange; one final channel hash agg",
    "khop_reachability": "checkpointed adjacency probed per hop; frontier joins + distinct, "
                         "no re-derivation of the edge pipeline",
    "event_transition_matrix": "ONE keyed lead window then a |types|^2 hash agg; "
                               "row totals broadcast back",
    "view_to_purchase_within_hour": "reverse running min replaces the views x purchases "
                                    "self-join; one keyed window + 1-row fold",
    "feature_hashing_vectors": "explode -> (doc,bucket) agg -> per-doc agg; no vocabulary "
                               "state, no join, no window",
    "auc_mann_whitney": "per-distinct-score hash agg FIRST, then the range-partitioned "
                        "cumulative scan (pinned) and a 1-row fold — no per-pair work, "
                        "no single-partition data window",
    "km_survival": "user-keyed aggs are the only data-sized work; the survival curve is a "
                   "14-row spine x bounded histogram broadcast — no window, no float chain",
    "psi_value_drift": "projection + ONE 10-key hash agg + broadcast 1-row totals — the "
                       "cheapest possible drift-monitor shape",
    "record_linkage_topk": "nation-blocked pair generation is an equi self-join (never a "
                           "CartesianProduct); scoring is pure codegen Column math; "
                           "TakeOrderedAndProject top-200 — no Window anywhere",
    "neyman_allocation_report": "ONE corpus hash agg (count + stddev per stratum, map-side "
                                "combinable); every later operator — the largest-remainder "
                                "windows included — runs over the 5-row strata frame",
    "cm_join_size": "two bounded map-side-combinable cell aggs (<= d*w rows each); the inner "
                    "product is cell-frame joins; the exact-join lane is gate-only "
                    "instrumentation (production form = the estimate alone)",
    "leakage_safe_split_report": "the LSH pair pipeline and the assignment are "
                                 "localCheckpointed once; the split itself is a broadcast "
                                 "left join; the audit lane joins the pinned assignment twice",
    "quantile_sketch_report": "the sketch build is TakeOrdered(k) — ZERO Exchange on the "
                              "build path; the exact-rank lane is one corpus pass against a "
                              "4-row broadcast (gate-only; production = the sketch lane)",
    "stream_quantile_sketch": "real 3-batch replay; per batch one TakeOrdered(k) + a 2k-row "
                              "re-minimize + one k-row store write — state is k rows forever",
    "kmv_retention_matrix": "ONE grouped distinct agg + per-day top-k window builds every "
                            "sketch (localCheckpointed, referenced three times); each "
                            "day-pair probe is a k-row join",
    "cidr_lpm_enrichment": "a chain of per-prefix-length BroadcastHashJoins in one stage — "
                           "the corpus never shuffles until the final report agg "
                           "(shuffleRecordsWritten == 0 pinned in tests/test_ipnet.py)",
    "lpa_copurchase_communities": "per round two node-keyed shuffles over the mirrored edge "
                                  "set only (the pagerank budget); the report is one hash agg "
                                  "on the final one-row-per-node label frame",
    "kmv_sliding_distinct": "ONE grouped distinct agg + per-day top-k window builds the "
                            "sketches (localCheckpointed — the window expansion reads the "
                            "k-row frame, never the corpus); expansion is rows x window",
    "quantile_range_layout": "TakeOrdered(k) sketch build + a 7-value bounded driver collect; "
                             "the balance evidence is ONE corpus hash agg over the assigned "
                             "range ids — no global sort anywhere",
    "bloom_dedup_report": "bloom lane: explode -> <= m_bits-row agg -> broadcast-back -> one "
                          "item-keyed agg; the exact first-seen window is gate-only "
                          "instrumentation (production form = the bloom lane alone)",
    "stream_bloom_dedup": "real 3-batch replay; per batch one bounded bit agg + a broadcast "
                          "of <= m_bits state rows + one batch-keyed agg — history never "
                          "re-scanned, state bounded forever",
    "rrf_hybrid_retrieval": "both lanes end in TakeOrdered(100); the fusion is full-outer "
                            "equi-joins + TakeOrdered(50) over 100-row frames — the only "
                            "corpus-sized work lives inside the lanes",
    "entity_resolution_report": "nation-blocked equi self-join + codegen scoring; min-label "
                                "components run over ONLY the link edges; backfill is one "
                                "broadcast left join + two hash aggs",
    "stream_kmv_retention_matrix": "real 3-batch replay into the grouped k-minima store; "
                                   "the matrix is k-row joins over the final state — "
                                   "history never re-scanned",
    "kcore_copurchase_report": "edges checkpointed once; per peel round ONE mirrored-degree "
                               "hash agg + two BROADCAST semi-joins of the survivor frame "
                               "(node universe = the part dimension) + an early fixpoint "
                               "stop; the report is one exploded distinct-count agg per k",
    "sorted_neighborhood_linkage": "global rank via the range-partitioned two-phase scan "
                                   "(no single-partition data window); pair generation is "
                                   "ONE rank equi-join; payloads re-attach as two broadcasts "
                                   "of the narrow attribute frame; FS scoring is codegen "
                                   "Column math into a 3-row hash agg",
    "sq_adc_topk": "training is ONE pass of 2*dim min/max aggregates (no row expansion); "
                   "the codes checkpoint IS the materialized index; each query probes as a "
                   "literal array + TakeOrdered(k) — zero Python and zero shuffle in the "
                   "search plan",
}


def main() -> None:
    spark = get_spark(app_name="explain-dump", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    out = ["# EXPLAIN — headline query plans",
           "",
           "Generated by `python tools/dump_explains.py` (sf0.001 inputs; plan",
           "shape is scale-invariant). Annotations state the property each plan",
           "is expected to show; tests/test_plan_quality.py asserts the same",
           "properties mechanically.",
           ""]
    for name, note in HEADLINERS.items():
        df = CATALOG[name][0](spark, SF)
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        out.append(f"## {name}")
        out.append("")
        out.append(f"*Expected property: {note}*")
        out.append("")
        out.append("```")
        out.append(buf.getvalue().rstrip())
        out.append("```")
        out.append("")
    with open(os.path.join(REPO, "EXPLAIN.md"), "w") as fh:
        fh.write("\n".join(out))
    print("wrote EXPLAIN.md")
    spark.stop()


if __name__ == "__main__":
    main()
