"""Perf regression gate plumbing (VERDICT r4 item 7) — band logic only;
the real numbers come from the TPU runs in benchmarks/refresh_all.sh."""

import json
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO / "benchmarks"))


def test_bands_cover_all_committed_metrics():
    bands = json.loads((REPO / "benchmarks" / "bands.json").read_text())
    results = json.loads(
        (REPO / "benchmarks" / "results.json").read_text()
    )
    timed = {k for k, v in results.items()
             if isinstance(v, dict) and "value" in v}
    assert timed <= set(bands), timed - set(bands)
    assert "bench_flagship" in bands
    for k, b in bands.items():
        assert b["max_seconds"] > b["committed"] > 0, k


def test_check_bands_logic(tmp_path):
    from run_all import check_bands

    bands = {
        "a": {"max_seconds": 1.0, "committed": 0.8, "band": 1.25},
        "b": {"max_seconds": 0.1, "committed": 0.066, "band": 1.5},
        "bench_flagship": {"max_seconds": 0.07, "committed": 0.05,
                           "band": 1.5},
    }
    f = tmp_path / "bands.json"
    f.write_text(json.dumps(bands))
    ok = {"a": {"value": 0.9}, "b": {"value": 0.05}}
    assert check_bands(ok, bands_path=f) == []
    bad = {"a": {"value": 1.2}, "b": {"value": 0.05}}
    msgs = check_bands(bad, bands_path=f)
    assert len(msgs) == 1 and msgs[0].startswith("a:")
    missing = {"a": {"value": 0.9}}
    msgs = check_bands(missing, bands_path=f)
    assert len(msgs) == 1 and "missing" in msgs[0]


def test_committed_results_inside_bands():
    """The committed results.json must itself pass the gate (fresh
    clones start green)."""
    from run_all import check_bands

    results = json.loads(
        (REPO / "benchmarks" / "results.json").read_text()
    )
    assert check_bands(results) == []
