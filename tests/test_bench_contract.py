"""Pin bench.py's one-JSON-line output contract (VERDICT r13 task 2).

The driver parses the LAST stdout line of bench.py as JSON with keys
metric/value/unit/queries/subtotals/calibration/sf; losing that parse
silently loses the round-over-round PERF comparison (it happened to
BENCH_r12: prev_bench_ok=false, every speedup null). These tests run
the emission path (`bench.build_payload`) on synthetic timings — no
Spark — so any repo-side change that would break the contract fails
fast in CI instead of surfacing as a null PERF file a round later.
"""

import json

import bench


def _payload():
    timings = {n: 0.125 for n in bench.HEADLINE}
    calib = {"scan": 0.25, "join": 0.75, "window": 1.1}
    inblock = {q: 0.24 for q in bench.INBLOCK_ANCHOR_QUERIES}
    return bench.build_payload(timings, calib, inblock, "/root/testdata/sf0.1")


def test_payload_is_one_parseable_json_line():
    s = json.dumps(_payload())
    assert "\n" not in s and "\r" not in s
    round_trip = json.loads(s)
    assert isinstance(round_trip, dict)


def test_payload_required_keys_and_types():
    p = _payload()
    assert p["metric"] == "headline_queries_total"
    assert p["unit"] == "sec"
    assert isinstance(p["value"], float)
    assert isinstance(p["queries"], dict)
    assert isinstance(p["subtotals"], dict)
    assert isinstance(p["calibration"], dict)
    assert p["sf"] == 0.1
    # the driver's comparison joins on per-query names: every headline
    # entry must appear (entries may be ADDED round-over-round, never
    # removed or renamed)
    assert set(p["queries"]) == set(bench.HEADLINE)
    # total is the exact sum of the per-query seconds
    assert p["value"] == round(sum(p["queries"].values()), 3)


def test_payload_subtotals_partition_the_total():
    p = _payload()
    expected = {
        "core14_r1r2_comparable",
        "llm_heavies_added_r3",
        "heavies_added_r4",
        "heavies_added_r5",
        "heavies_added_r6",
        "heavies_added_r7",
        "heavies_added_r8",
        "heavies_added_r9",
        "heavies_added_r10",
        "heavies_added_r10plus",
    }
    assert set(p["subtotals"]) == expected
    assert abs(sum(p["subtotals"].values()) - p["value"]) < 0.05


def test_payload_calibration_block():
    p = _payload()
    c = p["calibration"]
    for key in (
        "sec",
        "ref_sec",
        "anchors_sec",
        "anchor_refs_sec",
        "anchor_drifts",
        "inblock_anchors_sec",
        "inblock_drifts",
        "drift",
        "core14_drift_normalized",
    ):
        assert key in c, key
    assert set(c["anchors_sec"]) == {"scan", "join", "window"}
    assert set(c["inblock_anchors_sec"]) == set(bench.INBLOCK_ANCHOR_QUERIES)
    # frozen references — their whole value is cross-round identity
    assert c["anchor_refs_sec"] == {"scan": 0.229, "join": 0.765, "window": 1.131}
