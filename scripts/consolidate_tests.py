"""One-shot consolidation of the round-numbered test files into
per-domain modules (round-9 VERDICT #9). Pure refactor: every test
function moves VERBATIM (ast.get_source_segment), each destination
gets the union of its contributors' imports plus exactly the
module-level helpers/fixtures/constants its tests reference
(transitive closure by name). Collected-test parity is checked by
the caller via pytest --collect-only."""

from __future__ import annotations

import ast
import re
from collections import OrderedDict
from pathlib import Path

TESTS = Path(__file__).resolve().parent.parent / "tests"

SOURCES = [
    "test_round4_ops.py",
    "test_round6b_ops.py",
    "test_round6c_ops.py",
    "test_round6d_ops.py",
    "test_round6e_ops.py",
    "test_round7_ops.py",
    "test_round9_ops.py",
]

# destination -> list of test names (must cover every test exactly once)
PLAN = {
    "test_ops_spatial.py": [
        "test_quad_polygons_convex_ccw_and_away_from_wrap",
        "test_point_in_polygon_matches_numpy_half_planes",
        "test_region_time_bounds_are_the_conjunction",
        "test_proper_motion_matches_numpy_polyfit",
        "test_sexagesimal_round_trips",
        "test_sky_coverage_consistency",
        "test_half_plane_pairs_equal_brute",
        "test_tracklet_links_consecutive_days_only",
        "test_adaptive_density_split_semantics",
        "test_angular_corr_matches_numpy_brute_force",
        "test_mjd_convert_roundtrip_and_integer_identity",
        "test_bayes_match_prefers_photometric_twin",
        "test_mutual_xmatch_is_one_to_one_subset",
        "test_completeness_totals_and_fraction",
        "test_stream_xmatch_equals_batch",
        "test_pm_epoch_xmatch_brute_force_and_propagation_matters",
        "test_hess_diagram_integer_bins",
        "test_dipole_exact_integer_recompute",
        "test_galactic_profile_totals_and_rotation",
        "test_self_nearest_matches_numpy",
    ],
    "test_ops_timeseries.py": [
        "test_sessionize_matches_pandas_reconstruction",
        "test_variability_eta_near_two_for_iid_noise",
        "test_resample_gapfill_dense_spine",
        "test_interpolate_linear_semantics",
        "test_win_ewma_recomputes_in_pandas",
        "test_sigma_clip_matches_pandas",
        "test_structure_function_matches_pandas",
        "test_zscore_anomaly_matches_pandas_rolling",
        "test_cusum_drift_exact_integers_and_zero_terminal",
        "test_autocorr_matches_pandas",
        "test_theilsen_matches_numpy_median",
        "test_pct_change_exact_division",
        "test_heatmap_hour_dow_integer_arithmetic",
        "test_arg_extrema_matches_idxmax",
        "test_arg_extrema_tie_pins_smallest_key",
    ],
    "test_ops_dedup.py": [
        "test_substring_dedup_crafted",
        "test_incremental_dedup_crafted",
        "test_minhash_md5_identical_docs_pair",
        "test_minhash_md5_jaccard_recomputes",
        "test_url_dedup_canonical_invariants",
        "test_mm_phash_dedup_groups_match_exact_text_groups",
        "test_dedup_cluster_is_transitive_closure_of_pairs",
        "test_containment_short_inside_long",
        "test_containment_is_invisible_to_jaccard",
        "test_ngram_novelty_first_doc_attribution",
    ],
    "test_ops_llm.py": [
        "test_mix_temperature_weights_flatten",
        "test_chunk_docs_coverage_and_fps",
        "test_split_stratified_partitions_corpus",
        "test_embed_quantize_recomputes_in_numpy",
        "test_reservoir_sample_is_hash_smallest",
        "test_knn_ivf_sq8_close_to_ivf_raw",
        "test_triangle_k4_and_open_wedge",
        "test_triangle_matches_duckdb_on_crafted_fixture",
        "test_filter_rules_recompute_and_nondegenerate",
        "test_importance_sampling_membership",
        "test_bpe_pairs_match_counter",
        "test_embed_stats_matches_numpy",
        "test_source_overlap_sets",
    ],
    "test_ops_aggregates.py": [
        "test_quantile_sketch_within_one_bin_of_exact",
        "test_weighted_median_crossing",
        "test_gini_matches_closed_form_and_bounds",
        "test_benford_shares_and_expectations",
        "test_hll_portable_exact_sketch_recompute",
        "test_hll_linear_counting_branch",
        "test_count_min_overestimates_never_under",
        "test_rollup_subtotals_consistent",
        "test_mad_matches_numpy_lower_median",
        "test_variant_matches_json_recompute",
        "test_mode_deterministic_tiebreak",
        "test_symmetric_diff_sets",
    ],
    "test_ops_io_streaming.py": [
        "test_scd2_intervals_partition_each_users_timeline",
        "test_jsonl_roundtrip_counts",
        "test_bloom_prune_no_false_negatives_and_bounded_fp",
        "test_referential_audit_detects_orphans",
        "test_cdc_apply_delete_wins_over_update",
        "test_partition_overwrite_replaces_only_target",
        "test_orc_roundtrip_fingerprint",
        "test_file_manifest_disjoint_and_total",
        "test_stream_parquet_sink_equals_batch",
        "test_csv_malformed_quarantine_split",
        "test_stream_topk_matches_batch_rank",
        "test_lateral_topn_equals_window_rank",
        "test_udtf_chunks_cover_every_token",
    ],
    "test_engine_invariants.py": [
        "test_udaf_grouped_agg_matches_declarative",
        "test_udaf_grouped_agg_group_straddles_arrow_batches",
        "test_embcos_exact_parallelized_plan_and_rows",
        "test_fof_exact_rows_unchanged_by_rewrite",
        "test_gini_overflow_raises_not_null",
        "test_gini_no_trip_on_fixture",
        "test_dup_fraction_probe_is_exact",
        "test_drop_plans_matching_unpersists_ckpt_blocks",
        "test_drop_plans_matching_evicts_dependents",
    ],
}

HEADERS = {
    "test_ops_spatial.py": (
        "Spatial / astronomy operator semantics vs independent numpy\n"
        "reconstruction (consolidated from the round-4..7 files in round\n"
        "10): polygon regions, proper motion, cross-matches, tracklets,\n"
        "sky statistics. The DuckDB hash oracle is the driver's job;\n"
        "these catch wrong-but-self-consistent math."
    ),
    "test_ops_timeseries.py": (
        "Time-series / window operator semantics vs pandas/numpy\n"
        "recomputation (consolidated from the round-4..7 files in round\n"
        "10): sessionization, resampling, rolling statistics, drift."
    ),
    "test_ops_dedup.py": (
        "Dedup-family semantics on crafted corpora (consolidated from\n"
        "the round-6..7 files in round 10): minhash, url, substring,\n"
        "containment, incremental, phash, cluster transitivity."
    ),
    "test_ops_llm.py": (
        "LLM-pipeline operator semantics (consolidated from the\n"
        "round-4..7 files in round 10): sampling, splits, quantization,\n"
        "ANN variants, embedding graph ops, corpus statistics."
    ),
    "test_ops_aggregates.py": (
        "Aggregate / sketch semantics vs closed forms and exact\n"
        "recomputation (consolidated from the round-6..7 files in round\n"
        "10): quantile sketch, HLL, count-min, gini, weighted median."
    ),
    "test_ops_io_streaming.py": (
        "Source/sink and streaming parity tests (consolidated from the\n"
        "round-4..7 files in round 10): CDC, SCD2, partition overwrite,\n"
        "format roundtrips, stream==batch equivalences."
    ),
    "test_engine_invariants.py": (
        "Engine-internal invariants (formerly test_round9_ops.py):\n"
        "Arrow kernel parity, plan-cache block release and dependent\n"
        "eviction, overflow guards, routing probes."
    ),
}


def parse(fname):
    src = (TESTS / fname).read_text()
    lines = src.splitlines()
    tree = ast.parse(src)
    imports, helpers, tests, other = [], OrderedDict(), OrderedDict(), []
    for node in tree.body:
        if isinstance(
            node, (ast.FunctionDef, ast.AsyncFunctionDef)
        ) and node.decorator_list:
            # get_source_segment excludes decorators — slice by lines
            start = min(d.lineno for d in node.decorator_list) - 1
            # decorator line may start with '@' one line above expr
            while start > 0 and lines[start - 1].lstrip().startswith("@"):
                start -= 1
            if not lines[start].lstrip().startswith("@"):
                start_scan = node.decorator_list[0].lineno - 1
                while not lines[start_scan].lstrip().startswith("@"):
                    start_scan -= 1
                start = start_scan
            seg = "\n".join(lines[start : node.end_lineno])
        else:
            seg = ast.get_source_segment(src, node)
        if isinstance(node, (ast.Import, ast.ImportFrom)):
            imports.append(seg)
        elif isinstance(node, (ast.FunctionDef, ast.AsyncFunctionDef)):
            if node.name.startswith("test_"):
                tests[node.name] = seg
            else:
                helpers[node.name] = seg
        elif isinstance(node, ast.Assign):
            names = [t.id for t in node.targets if isinstance(t, ast.Name)]
            helpers[names[0] if names else f"_anon{len(helpers)}"] = seg
        elif isinstance(node, ast.Expr) and isinstance(node.value, ast.Constant):
            continue  # module docstring
        else:
            other.append(seg)
    return imports, helpers, tests, other


def main():
    parsed = {f: parse(f) for f in SOURCES}
    all_tests = {}
    origin = {}
    for f, (_, _, tests, _) in parsed.items():
        for name, seg in tests.items():
            assert name not in all_tests, f"duplicate test {name}"
            all_tests[name] = seg
            origin[name] = f
    planned = [t for lst in PLAN.values() for t in lst]
    assert sorted(planned) == sorted(all_tests), (
        set(planned) ^ set(all_tests)
    )

    for dest, names in PLAN.items():
        contributors = sorted({origin[n] for n in names})
        imports: list[str] = []
        for f in contributors:
            for imp in parsed[f][0]:
                if imp not in imports:
                    imports.append(imp)
        # helper closure by name-reference over included sources
        body_parts = [all_tests[n] for n in names]
        included: OrderedDict[str, str] = OrderedDict()
        changed = True
        while changed:
            changed = False
            blob = "\n".join(body_parts) + "\n".join(included.values())
            for f in contributors:
                for hname, hseg in parsed[f][1].items():
                    if hname in included:
                        continue
                    if re.search(rf"\b{re.escape(hname)}\b", blob):
                        included[hname] = hseg
                        changed = True
        # module-level statements (load_all() etc.) from contributors
        other: list[str] = []
        for f in contributors:
            for seg in parsed[f][3]:
                if seg not in other:
                    other.append(seg)
        future = [i for i in imports if "__future__" in i]
        rest = [i for i in imports if "__future__" not in i]
        out = ['"""' + HEADERS[dest] + '"""', ""]
        out += future + rest + [""]
        out += other + [""]
        out += list(included.values())
        out += ["", ""]
        out += body_parts
        text = "\n\n".join(
            p for p in ("\n".join(out[:len(future) + len(rest) + 2 + len(other) + 1]),)
        )
        # simpler assembly: join sections with blank lines
        sections = []
        sections.append('"""' + HEADERS[dest] + '"""')
        if future:
            sections.append("\n".join(future))
        if rest:
            sections.append("\n".join(rest))
        if other:
            sections.append("\n".join(other))
        sections.extend(included.values())
        sections.extend(all_tests[n] for n in names)
        (TESTS / dest).write_text("\n\n\n".join(sections) + "\n")
        print(f"{dest}: {len(names)} tests, {len(included)} helpers, "
              f"from {contributors}")


if __name__ == "__main__":
    main()
