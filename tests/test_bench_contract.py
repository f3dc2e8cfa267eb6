"""bench.py is driver-facing infrastructure: it must emit ONE JSON line
with the headline section (frozen 15 names) and the heavy-tail section.
A breakage here silently costs a round of perf evidence, so the
contract is pinned — names resolve in the registry and the two sections
stay disjoint."""

from __future__ import annotations

import importlib.util
import os


def _load_bench():
    path = os.path.join(os.path.dirname(os.path.dirname(__file__)), "bench.py")
    spec = importlib.util.spec_from_file_location("bench", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_bench_names_registered_and_disjoint():
    from flink_cdc_2_3_0_src_spark import queries as catalog

    bench = _load_bench()
    qs = set(catalog.queries())
    missing_head = [n for n in bench.HEADLINE if n not in qs]
    missing_heavy = [n for n in bench.HEAVY_TAIL if n not in qs]
    assert not missing_head, missing_head
    assert not missing_heavy, missing_heavy
    assert len(bench.HEADLINE) == 15  # frozen cross-round series
    assert not set(bench.HEADLINE) & set(bench.HEAVY_TAIL)


def test_bench_emits_contract_json(spark):
    """Run the bench main at the smoke SF and validate the JSON line
    (uses the session fixture's JVM — bench's get_spark returns the
    active session)."""
    import io
    import json
    import os
    from contextlib import redirect_stdout

    bench = _load_bench()
    prior = os.environ.get("SPARK_GRAFT_SF_DIR")
    os.environ["SPARK_GRAFT_SF_DIR"] = "/root/testdata/sf0.001"
    try:
        buf = io.StringIO()
        with redirect_stdout(buf):
            bench.main()
    finally:
        # restore, don't destroy, any pre-existing value
        if prior is None:
            del os.environ["SPARK_GRAFT_SF_DIR"]
        else:
            os.environ["SPARK_GRAFT_SF_DIR"] = prior
    line = buf.getvalue().strip().splitlines()[-1]
    doc = json.loads(line)
    assert doc["metric"] == "headline_queries_total"
    assert doc["unit"] == "sec" and doc["value"] > 0
    assert set(doc["queries"]) == set(bench.HEADLINE)
    assert set(doc["heavy_tail"]) == set(bench.HEAVY_TAIL)
    assert doc["heavy_tail_total"] > 0
    assert doc["sf"] == 0.001
    # noise defense (r6, tightened r8): per-query medians over k reps,
    # two sf-independent calibration probes (codegen + full shuffle)
    # for cross-round normalization, and per-query [min, max] noise
    # bands so a drift can be judged against the same-run spread
    assert doc["reps"] >= 1
    assert doc["calibration_sec"] > 0
    assert doc["calibration_shuffle_sec"] > 0
    assert set(doc["noise_band"]) == set(bench.HEADLINE)
    assert set(doc["heavy_tail_noise_band"]) == set(bench.HEAVY_TAIL)
    for name, (lo, hi) in doc["noise_band"].items():
        assert 0 < lo <= doc["queries"][name] <= hi, name
