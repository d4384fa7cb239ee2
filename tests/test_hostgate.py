"""Host-interference gate logic (tools/hostgate.py): the accept rule
that decides which bench/probe samples land in round artifacts. Logic
only — no calibration spins (the spin kernels are exercised by every
gated bench run; spinning 32 subprocesses inside the test suite would
poison concurrently-collected timings)."""

from __future__ import annotations

import os
import sys

sys.path.insert(
    0,
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 "tools"),
)

import hostgate  # noqa: E402


def _g(cal1, cal32, steal=0):
    return {"cal1_s": cal1, "cal32_s": cal32, "steal_jiffies": steal, "t": 0.0}


def test_best_cals_is_per_key_minimum():
    best = hostgate.best_cals([_g(0.30, 5.0), _g(0.25, 6.0), _g(0.28, 4.5)])
    assert best == {"cal1_s": 0.25, "cal32_s": 4.5}


def test_accept_within_tolerances():
    best = {"cal1_s": 0.25, "cal32_s": 4.0}
    # cal1 +15% boundary inclusive, cal32 +40% boundary inclusive
    ok = [_g(0.25 * 1.15, 4.0), _g(0.25, 4.0 * 1.40)]
    assert hostgate.accept(ok, best)


def test_reject_on_single_core_drift():
    best = {"cal1_s": 0.25, "cal32_s": 4.0}
    # one measurement of the sample breaches cal1 tol -> whole sample out
    assert not hostgate.accept([_g(0.25, 4.0), _g(0.30, 4.0)], best)


def test_reject_on_whole_host_drift():
    best = {"cal1_s": 0.25, "cal32_s": 4.0}
    assert not hostgate.accept([_g(0.25, 5.7)], best)


def test_custom_tolerances():
    best = {"cal1_s": 0.25, "cal32_s": 4.0}
    g = [_g(0.30, 4.0)]  # +20% cal1
    assert not hostgate.accept(g, best)
    assert hostgate.accept(g, best, tol1=0.25)


def test_read_steal_nonnegative_int():
    s = hostgate.read_steal()
    assert isinstance(s, int) and s >= 0


def test_probe_only_exhausted_batch_does_not_overwrite(tmp_path, monkeypatch,
                                                       capsys):
    """A --replace batch whose every sample was gate-rejected must land
    as rejected_batches audit data, leaving the row's medians/ratios/
    totals untouched (in either direction): fallback medians computed
    from certified-rejected samples are not landing evidence."""
    import json

    import bench_scale_100x as b

    art = {
        "base_s": {"r": 1.0},
        "scaled_s": {"r": 10.0},
        "ratio": {"r": 10.0},
        "probes": {
            "r": {
                "runs_base_s": [1.0],
                "runs_scaled_s": [10.0],
                "median_base_s": 1.0,
                "median_scaled_s": 10.0,
                "spread_scaled": 1.0,
            }
        },
    }
    p = tmp_path / "art.json"
    p.write_text(json.dumps(art))
    exhausted = {
        "runs_base_s": [2.0],
        "runs_scaled_s": [99.0],
        "median_base_s": 2.0,
        "median_scaled_s": 99.0,
        "spread_scaled": 1.0,
        "gate": {"gate_exhausted": True, "accepted": 0, "rejected": 1,
                 "samples": []},
    }
    monkeypatch.setattr(b, "_run_probes", lambda *a, **k: {"r": exhausted})
    b.probe_only(["r"], 1, "x", "y", str(p), replace=True)
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["scaled_s"]["r"] == 10.0  # landing median untouched
    assert out["ratio"]["r"] == 10.0
    assert len(out["probes"]["r"]["rejected_batches"]) == 1
    assert out["probes"]["r"]["rejected_batches"][0]["median_scaled_s"] == 99.0
    # the fold is also WRITTEN back to the artifact (atomic replace),
    # not just printed — the write is the committed evidence path
    assert json.loads(p.read_text()) == out


def test_probe_only_accepted_batch_replaces(tmp_path, monkeypatch, capsys):
    """Control: a batch with accepted samples DOES replace under
    --replace, superseding the old runs."""
    import json

    import bench_scale_100x as b

    art = {
        "base_s": {"r": 1.0},
        "scaled_s": {"r": 10.0},
        "ratio": {"r": 10.0},
        "probes": {
            "r": {
                "runs_base_s": [1.0],
                "runs_scaled_s": [10.0],
                "median_base_s": 1.0,
                "median_scaled_s": 10.0,
                "spread_scaled": 1.0,
            }
        },
    }
    p = tmp_path / "art.json"
    p.write_text(json.dumps(art))
    accepted = {
        "runs_base_s": [1.1],
        "runs_scaled_s": [8.0],
        "median_base_s": 1.1,
        "median_scaled_s": 8.0,
        "spread_scaled": 1.0,
        "gate": {"accepted": 1, "rejected": 0, "samples": []},
    }
    monkeypatch.setattr(b, "_run_probes", lambda *a, **k: {"r": accepted})
    b.probe_only(["r"], 1, "x", "y", str(p), replace=True)
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["scaled_s"]["r"] == 8.0
    assert out["probes"]["r"]["superseded"]["median_scaled_s"] == 10.0
