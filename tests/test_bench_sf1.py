"""The bench's sf1 aggregation: every recorded 10x-input window rides
into BENCH_r*.json (headline = best, median + per-window list alongside),
deduplicated by measured_unix, with the first window's known-invalid
pool control excluded."""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402


def _window(ts, scaling, pool=0.9, kernel=20_000_000):
    return {"measured_unix": ts, "sf1_scaling_2_8": scaling,
            "sf1_pool_scaling_2_8": pool, "sf1_tokens": 1000,
            "kernel_tokens_per_sec": kernel}


def _setup(tmp_path, monkeypatch, files):
    bdir = tmp_path / "BENCH"
    bdir.mkdir()
    for name, payload in files.items():
        (bdir / name).write_text(json.dumps(payload))
    monkeypatch.setattr(bench, "REPO", str(tmp_path))
    monkeypatch.setattr(bench, "SF1_PATH",
                        str(bdir / "sf1_scaling.json"))


def test_sf1_runs_dedup_order_and_nowrite_flag(tmp_path, monkeypatch):
    _setup(tmp_path, monkeypatch, {
        "sf1_run_nowrite_pool.json": _window(10, 0.5, pool=1.01),
        "sf1_run_b.json": _window(30, 0.7),
        # sf1_scaling.json duplicates run_b by timestamp -> deduped
        "sf1_scaling.json": _window(30, 0.7),
        "sf1_run_a.json": _window(20, 0.3),
        # no scaling number (e.g. a profile artifact) -> skipped
        "sf1_run_profile.json": {"measured_unix": 40, "spark_sec": {}},
    })
    runs = bench._sf1_runs()
    assert [d["measured_unix"] for d in runs] == [10, 20, 30]
    assert [d["_pool_control_valid"] for d in runs] == [False, True, True]


def test_embed_sf1_headline_is_best_with_median(tmp_path, monkeypatch):
    _setup(tmp_path, monkeypatch, {
        "sf1_run_nowrite_pool.json": _window(10, 0.9, pool=1.01),
        "sf1_run_a.json": _window(20, 0.3, pool=0.6),
        "sf1_run_b.json": _window(30, 0.7, pool=0.95),
    })
    out = {}
    bench._embed_sf1(out)
    # best window wins even when the nowrite run has the top number --
    # its SPARK number stands, only its pool control is voided
    assert out["sf1_scaling_2_8"] == 0.9
    assert out["sf1_pool_scaling_2_8"] is None
    assert out["sf1_scaling_2_8_median"] == 0.7
    assert len(out["sf1_windows"]) == 3
    assert out["sf1_windows"][1]["sf1_pool_scaling_2_8"] == 0.6
    assert not any(k.startswith("_") for k in out["sf1"])


def test_embed_sf1_no_windows_is_a_noop(tmp_path, monkeypatch):
    _setup(tmp_path, monkeypatch, {})
    out = {}
    bench._embed_sf1(out)
    assert out == {}
