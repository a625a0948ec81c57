"""Cross-invocation floor caches in bench.py (pure python, no Spark)."""

import importlib.util
import json
import os


def _load_bench(tmp_path, monkeypatch):
    monkeypatch.setenv(
        "BENCH_TICK_FLOORS_CACHE", str(tmp_path / "tick_floors.json")
    )
    monkeypatch.setenv(
        "BENCH_FLOORS_CACHE", str(tmp_path / "scaling_floors.json")
    )
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    spec = importlib.util.spec_from_file_location(
        "bench_under_test", os.path.join(root, "bench.py")
    )
    m = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(m)
    return m


def test_tick_floor_cache_merges_minima_per_size(tmp_path, monkeypatch):
    m = _load_bench(tmp_path, monkeypatch)
    m._merge_tick_floor_cache(
        {100: {"scratch": {"a": 100, "b": 50}, "tick": {"a": 30}, "cycles": 2}}
    )
    c = m._merge_tick_floor_cache({
        100: {"scratch": {"a": 80, "b": 70}, "tick": {"a": 40, "c": 9},
              "cycles": 3},
        400: {"scratch": {"a": 300}, "tick": {"a": 33}, "cycles": 1},
    })
    s100 = c["sizes"]["100"]
    assert s100["scratch"] == {"a": 80, "b": 50}
    assert s100["tick"] == {"a": 30, "c": 9}
    assert s100["cycles_total"] == 5 and c["invocations"] == 2
    assert c["sizes"]["400"]["scratch"] == {"a": 300}
    assert c["sizes"]["400"]["cycles_total"] == 1
    # persisted and reload-compatible
    stored = json.load(open(tmp_path / "tick_floors.json"))
    assert stored == c


def test_tick_floor_cache_resets_on_fingerprint_change(tmp_path, monkeypatch):
    m = _load_bench(tmp_path, monkeypatch)
    m._merge_tick_floor_cache(
        {100: {"scratch": {"a": 10}, "tick": {"a": 5}, "cycles": 1}}
    )
    stored = json.load(open(tmp_path / "tick_floors.json"))
    stored["fingerprint"] = "stale"
    json.dump(stored, open(tmp_path / "tick_floors.json", "w"))
    c = m._merge_tick_floor_cache(
        {100: {"scratch": {"a": 99}, "tick": {"a": 77}, "cycles": 1}}
    )
    assert c["sizes"]["100"]["scratch"] == {"a": 99}
    assert c["sizes"]["100"]["tick"] == {"a": 77}
    assert c["invocations"] == 1  # reset, not merged


def test_scaling_floor_cache_still_merges(tmp_path, monkeypatch):
    m = _load_bench(tmp_path, monkeypatch)
    m._merge_floor_cache({"s": 100}, {"s": 25}, {"s": 90}, {"s": 20}, 2)
    c = m._merge_floor_cache({"s": 110}, {"s": 20}, {"s": 80}, {"s": 30}, 3)
    assert c["lo"] == {"s": 100} and c["hi"] == {"s": 20}
    assert c["lo_task"] == {"s": 80} and c["hi_task"] == {"s": 20}
    assert c["rounds_total"] == 5 and c["invocations"] == 2
