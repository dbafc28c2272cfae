"""Regression pin for the BENCH_r11 `parsed: null` failure.

The driver tail-captures ~2000 chars of bench.py stdout and parses the
final JSON line. Round 11's protocol v5 appended the per-query load map
to that line and overflowed the window. These tests pin the v6 contract:
the machine line stays compact at suite size, and the telemetry payload
(which IS allowed to be big) carries the per-query readings instead.
"""

import json
import sys
import os

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench

# The 25 headline queries of the current suite (v4/v5/v6 names +
# bm25_search added in r12) — the realistic worst case for
# machine-line length. KEEP IN SYNC with bench.py's timed() calls:
# the sync is machine-checked by test_suite_list_matches_bench below.
SUITE = [
    "fit_se_k8", "fit_kl_k4", "transform_count", "assign_agg",
    "soft_assign", "doc_pipeline", "minhash_lsh", "knn_cosine",
    "bm25_search", "doc_langid_tokens", "fit_se_k32_pruned",
    "fit_se_k32_exact_arrow",
    "dedup_components", "corpus_prepare", "line_dedup", "pack_concat",
    "corpus_drift", "incremental_dedup", "events_asof_funnel",
    "bpe_train_pack", "dsir_weights", "quality_lr_train_score",
    "ivfpq_encode_topk", "opq_encode_topk", "fit_soft_k4",
]


def test_suite_list_matches_bench():
    """The emission pin must exercise the REAL suite size: every
    headline timed() name in bench.py appears in SUITE (diagnostics
    sink entries excluded), so adding a bench query without updating
    this pin fails CI instead of silently shrinking the worst case."""
    import re
    src = open(os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "bench.py")).read()
    named = re.findall(r'timed\(\s*"([a-z0-9_]+)"', src)
    headline = [n for n in named if "expr_1iter" not in n]
    assert sorted(set(headline)) == sorted(set(SUITE)), (
        set(headline) ^ set(SUITE))


def _machine(contended):
    timings = {q: 3.141 for q in SUITE}
    diagnostics = {"fit_se_k32_exact_expr_1iter": 2.752}
    return bench.build_machine_line(
        timings, diagnostics, 0.1, 600000, contended,
        start_busy=0.002, start_load=6.23, start_wait_sec=0.0)


def test_machine_line_fits_capture_window():
    line = json.dumps(_machine(contended=[]))
    assert len(line) <= bench.MACHINE_LINE_BUDGET, len(line)
    assert bench.MACHINE_LINE_BUDGET < bench.CAPTURE_WINDOW_CHARS


def test_machine_line_fits_with_contention():
    # Even a fully-contended round (every query flagged) must parse.
    line = json.dumps(_machine(contended=list(SUITE[:5])))
    assert len(line) <= bench.MACHINE_LINE_BUDGET, len(line)


def test_machine_line_shape_matches_r10_contract():
    m = _machine(contended=[])
    # The keys the driver parsed in rounds 1-10, plus the small v5
    # contention fields. NO per-query `load` map here — that is the
    # exact field that broke r11.
    assert "load" not in m
    assert set(m) == {
        "metric", "value", "unit", "queries", "diagnostics", "sf",
        "rows_lineitem", "contended", "start_busy", "start_load",
        "start_wait_sec", "protocol",
    }
    assert m["metric"] == "e2e_operator_suite_sec"
    assert m["unit"] == "sec"
    assert m["value"] == round(3.141 * len(SUITE), 3)
    assert m["protocol"].startswith("v6")
    # round-trips
    assert json.loads(json.dumps(m)) == m


def test_telemetry_carries_per_query_load():
    load = {q: {"busy": 0.002, "load1": 6.5, "hot_runs": 0} for q in SUITE}
    t = bench.build_telemetry(load, [], 0.002, 6.23, 0.0, 0.1)
    assert set(t["load"]) == set(SUITE)
    assert t["protocol"].startswith("v6")
    # the sidecar is allowed to be big — just has to round-trip
    assert json.loads(json.dumps(t)) == t


def test_shrink_degrades_oversized_lines_parseably():
    """Runtime backstop (r12 advisor): a machine line that would
    overflow the capture window degrades stepwise — contended
    truncation only when long, then diagnostics drop, then slowest-
    queries-only with queries_dropped — and ALWAYS serializes under
    budget with the full suite total intact."""
    big = {q: 3.141 for q in SUITE}
    big.update({f"future_query_with_a_rather_long_name_{i:03d}": 1.234
                for i in range(200)})
    machine = bench.build_machine_line(
        big, {"diag": 1.0}, 0.1, 600000, [],
        start_busy=0.002, start_load=6.23, start_wait_sec=0.0)
    total = machine["value"]
    line = bench.shrink_machine_line(machine)
    assert len(line) <= bench.MACHINE_LINE_BUDGET
    parsed = json.loads(line)
    assert parsed["value"] == total          # full total preserved
    assert parsed["queries_dropped"] > 0     # truncation is flagged
    assert "diagnostics" not in parsed
    # short contended lists must NOT grow a spurious "..." marker
    assert parsed["contended"] == []
    # an in-budget line passes through untouched
    small = bench.build_machine_line(
        {q: 3.141 for q in SUITE}, {"d": 1.0}, 0.1, 600000, ["x"],
        start_busy=0.002, start_load=6.23, start_wait_sec=0.0)
    out = json.loads(bench.shrink_machine_line(small))
    assert out["queries"] == {q: 3.141 for q in SUITE}
    assert out["contended"] == ["x"] and "queries_dropped" not in out
