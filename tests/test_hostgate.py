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


def _write_art(tmp_path, art):
    import json

    p = tmp_path / "art.json"
    p.write_text(json.dumps(art))
    return p


def test_exhausted_batch_never_lands_for_inline_median_row(tmp_path,
                                                           monkeypatch,
                                                           capsys):
    """ADVICE r11 (medium): a row whose landing median lives INLINE in
    base_s/scaled_s with no probes entry must also be protected — a
    fully gate-exhausted batch lands as rejected audit data, never as
    medians."""
    import json

    import bench_scale_100x as b

    art = {"base_s": {"r": 1.0}, "scaled_s": {"r": 10.0},
           "ratio": {"r": 10.0}}
    p = _write_art(tmp_path, art)
    exhausted = {
        "runs_base_s": [2.0], "runs_scaled_s": [99.0],
        "median_base_s": 2.0, "median_scaled_s": 99.0,
        "spread_scaled": 1.0,
        "gate": {"gate_exhausted": True, "accepted": 0, "rejected": 1,
                 "samples": []},
    }
    monkeypatch.setattr(b, "_run_probes", lambda *a, **k: {"r": exhausted})
    b.probe_only(["r"], 1, "x", "y", str(p), replace=True)
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["scaled_s"]["r"] == 10.0
    assert out["base_s"]["r"] == 1.0
    assert out["ratio"]["r"] == 10.0
    assert len(out["probes"]["r"]["rejected_batches"]) == 1
    assert "median_scaled_s" not in out["probes"]["r"]  # audit-only stub


def test_exhausted_batch_on_brand_new_row_lands_audit_only(tmp_path,
                                                           monkeypatch,
                                                           capsys):
    """A row with NO landing evidence anywhere (e.g. the longdoc rows
    before their first clean cell) gets an audit-only probes stub from
    an exhausted batch — base_s/scaled_s gain no key, totals move 0."""
    import json

    import bench_scale_100x as b

    art = {"base_s": {"other": 1.0}, "scaled_s": {"other": 5.0},
           "ratio": {"other": 5.0}}
    p = _write_art(tmp_path, art)
    exhausted = {
        "runs_base_s": [2.0], "runs_scaled_s": [99.0],
        "median_base_s": 2.0, "median_scaled_s": 99.0,
        "spread_scaled": 1.0,
        "gate": {"gate_exhausted": True, "accepted": 0, "rejected": 1,
                 "samples": []},
    }
    monkeypatch.setattr(b, "_run_probes",
                        lambda *a, **k: {"newrow": exhausted})
    b.probe_only(["newrow"], 1, "x", "y", str(p))
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert "newrow" not in out["base_s"]
    assert "newrow" not in out["scaled_s"]
    assert out["total_ratio"] == 5.0
    assert len(out["probes"]["newrow"]["rejected_batches"]) == 1


def test_accepted_batch_after_rejected_stub_carries_audit(tmp_path,
                                                          monkeypatch,
                                                          capsys):
    """When a clean window finally lands medians for a row whose probes
    entry is a rejected-audit-only stub, the medians land AND the audit
    history rides along."""
    import json

    import bench_scale_100x as b

    art = {
        "base_s": {"other": 1.0}, "scaled_s": {"other": 5.0},
        "ratio": {"other": 5.0},
        "probes": {"r": {"rejected_batches": [{"sidecar": True,
                                               "n_samples": 3}]}},
    }
    p = _write_art(tmp_path, art)
    accepted = {
        "runs_base_s": [1.1], "runs_scaled_s": [8.0],
        "median_base_s": 1.1, "median_scaled_s": 8.0,
        "spread_scaled": 1.0,
        "gate": {"accepted": 1, "rejected": 0, "samples": []},
    }
    monkeypatch.setattr(b, "_run_probes", lambda *a, **k: {"r": accepted})
    b.probe_only(["r"], 1, "x", "y", str(p))
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["scaled_s"]["r"] == 8.0
    assert out["probes"]["r"]["rejected_batches"][0]["n_samples"] == 3


def test_sidecar_moves_raw_samples_and_is_idempotent(tmp_path):
    """Rejected batches' raw samples move to the _rejected.json sidecar
    on write; an inline per-batch summary (counts, medians, cal ranges)
    stays; a second pass moves nothing more."""
    import json

    import bench_scale_100x as b

    raw_sample = {
        "base_s": 2.0, "scaled_s": 60.0,
        "gate_before": _g(0.5, 9.0), "gate_after": _g(0.6, 11.0),
    }
    batch = {
        "runs_base_s": [2.0], "runs_scaled_s": [60.0],
        "median_base_s": 2.0, "median_scaled_s": 60.0,
        "spread_scaled": 1.0,
        "gate": {"gate_exhausted": True, "accepted": 0, "rejected": 1,
                 "samples": [raw_sample]},
    }
    art = {"base_s": {}, "scaled_s": {},
           "probes": {"r": {"rejected_batches": [batch]}}}
    apath = str(tmp_path / "art.json")
    moved = b._sidecar_rejected(art, apath)
    assert moved == 1
    inline = art["probes"]["r"]["rejected_batches"][0]
    assert inline["sidecar"] is True
    assert inline["n_samples"] == 1
    assert inline["median_scaled_s"] == 60.0
    assert inline["cal32_range"] == [9.0, 11.0]
    assert inline["gate_exhausted"] is True
    side = json.loads((tmp_path / "art_rejected.json").read_text())
    assert side["r"][0]["gate"]["samples"][0]["scaled_s"] == 60.0
    assert b._sidecar_rejected(art, apath) == 0  # idempotent


def test_norm_per_cal32():
    """Host-normalized metric: sample seconds per same-window cal32
    second (mean of the two brackets)."""
    import bench_scale_100x as b

    s = {"base_s": 2.0, "scaled_s": 30.0,
         "gate_before": _g(0.25, 4.0), "gate_after": _g(0.25, 6.0)}
    assert b._norm_per_cal32(s, "scaled_s") == 6.0  # 30 / mean(4,6)
    assert b._norm_per_cal32({"scaled_s": 1.0}, "scaled_s") is None


def test_probe_summary_norm_uses_all_samples():
    """The normalized medians pool ALL samples (they are meaningful
    precisely for rejected ones), while the landing medians use only
    accepted samples."""
    import bench_scale_100x as b

    clean = {"base_s": 1.0, "scaled_s": 8.0,
             "gate_before": _g(0.25, 4.0), "gate_after": _g(0.25, 4.0)}
    dirty = {"base_s": 2.0, "scaled_s": 16.0,
             "gate_before": _g(0.25, 8.0), "gate_after": _g(0.25, 8.0)}
    best = {"cal1_s": 0.25, "cal32_s": 4.0}
    out = b._probe_summary([clean, dirty], best)
    assert out["median_scaled_s"] == 8.0  # accepted only
    assert out["gate"]["accepted"] == 1 and out["gate"]["rejected"] == 1
    # normalized: clean 8/4=2.0, dirty 16/8=2.0 -> median 2.0 over BOTH
    assert out["median_scaled_per_cal32"] == 2.0


def test_pair_only_folds_ratio_from_all_sessions(tmp_path, monkeypatch,
                                                 capsys):
    """pair_only: per-pass A/B ratios pool all sessions (drift-robust);
    absolute medians come from gate-accepted sessions only; totals and
    base_s/scaled_s untouched (contrast rows stay out of headlines)."""
    import json

    import bench_scale_100x as b

    def fake_session(a_base, b_base, a_scaled, b_scaled, cal32):
        g = _g(0.25, cal32)
        return {
            "pair": ["A", "B"], "passes": 2,
            "base": {
                "runs_a_s": [a_base, a_base], "runs_b_s": [b_base, b_base],
                "rows_a": 90, "rows_b": 100,
                "ratio_per_pass": [round(a_base / b_base, 3)] * 2,
                "gate_before": g, "gate_after": g,
            },
            "scaled": {
                "runs_a_s": [a_scaled, a_scaled],
                "runs_b_s": [b_scaled, b_scaled],
                "rows_a": 900, "rows_b": 1000,
                "ratio_per_pass": [round(a_scaled / b_scaled, 3)] * 2,
                "gate_before": g, "gate_after": g,
            },
        }

    sessions = [
        fake_session(4.0, 5.0, 40.0, 50.0, 4.0),   # clean window
        fake_session(8.0, 10.0, 80.0, 100.0, 9.0),  # dirty: 2x host
    ]
    results = iter(sessions)

    class FakeProc:
        returncode = 0
        stderr = ""

        @property
        def stdout(self):
            return "PAIR_RESULT " + json.dumps(next(results))

    monkeypatch.setattr(b, "_pretouch", lambda dirs: None)
    monkeypatch.setattr(b.subprocess, "run", lambda *a, **k: FakeProc())
    monkeypatch.setattr(b, "_Preflight", lambda *a, **k: type(
        "P", (), {"wait_clean": lambda self: True, "skips": 0,
                  "starved": False})())
    monkeypatch.setattr(
        hostgate, "warm", lambda: None
    )
    art = {"base_s": {"other": 1.0}, "scaled_s": {"other": 5.0},
           "ratio": {"other": 5.0}}
    p = _write_art(tmp_path, art)
    b.pair_only("A", "B", 2, 2, "x", "y", str(p))
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    e = out["paired"]["A_vs_B"]
    assert e["gate"]["accepted"] == 1 and e["gate"]["rejected"] == 1
    # ratio pools all 4 pass-pairs (all 0.8)
    assert e["scaled"]["median_ratio_a_over_b"] == 0.8
    assert e["scaled"]["ratio_n_pairs"] == 4
    # absolute medians: accepted session only
    assert e["scaled"]["median_a_s"] == 40.0
    assert e["scaled"]["median_b_s"] == 50.0
    assert e["scaled"]["pair_recall_a_over_b"] == 0.9
    # headline surface untouched
    assert out["base_s"] == {"other": 1.0}
    assert out["scaled_s"] == {"other": 5.0}


def test_replace_landing_carries_rejected_audit_history(tmp_path,
                                                        monkeypatch,
                                                        capsys):
    """--replace supersedes the old runs but must NOT drop the row's
    rejected_batches audit history."""
    import json

    import bench_scale_100x as b

    art = {
        "base_s": {"r": 1.0}, "scaled_s": {"r": 10.0},
        "ratio": {"r": 10.0},
        "probes": {"r": {
            "runs_base_s": [1.0], "runs_scaled_s": [10.0],
            "median_base_s": 1.0, "median_scaled_s": 10.0,
            "spread_scaled": 1.0,
            "rejected_batches": [{"sidecar": True, "n_samples": 4}],
        }},
    }
    p = _write_art(tmp_path, art)
    accepted = {
        "runs_base_s": [1.1], "runs_scaled_s": [8.0],
        "median_base_s": 1.1, "median_scaled_s": 8.0,
        "spread_scaled": 1.0,
        "gate": {"accepted": 1, "rejected": 0, "samples": []},
    }
    monkeypatch.setattr(b, "_run_probes", lambda *a, **k: {"r": accepted})
    b.probe_only(["r"], 1, "x", "y", str(p), replace=True)
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["scaled_s"]["r"] == 8.0
    assert out["probes"]["r"]["superseded"]["median_scaled_s"] == 10.0
    assert out["probes"]["r"]["rejected_batches"][0]["n_samples"] == 4


def test_best_cals_sheds_transient_turbo_readings():
    """One anomalously-fast reading (host capacity spike ABOVE the
    sustained clean level) must not anchor the session baseline — with
    >=10 readings the P10 quantile sheds it; the minimum would have
    rejected every genuinely clean sample (the r11/r12 batch-burn
    signature)."""
    clean = [_g(0.25, 3.6) for _ in range(11)]
    spike = _g(0.20, 2.42)
    best = hostgate.best_cals(clean + [spike])
    assert best == {"cal1_s": 0.25, "cal32_s": 3.6}
    # a clean sample accepts against the quantile baseline
    assert hostgate.accept([_g(0.26, 3.8)], best)
    # ... and would have been rejected against the raw-min baseline
    raw_min = {"cal1_s": 0.20, "cal32_s": 2.42}
    assert not hostgate.accept([_g(0.26, 3.8)], raw_min)


def test_best_cals_small_n_keeps_min_behavior():
    """bench.py brackets a run with 2 gates: below 10 readings the
    quantile index floors to 0 == raw minimum (legacy behavior)."""
    best = hostgate.best_cals([_g(0.30, 5.0), _g(0.25, 4.0)])
    assert best == {"cal1_s": 0.25, "cal32_s": 4.0}


def test_best_cals_sheds_recurrent_turbo_fraction():
    """Turbo bursts are RECURRENT (~10-15% of readings), not one-offs:
    the P25 anchor must land in the sustained-clean cluster even when
    several turbo readings exist."""
    pool = [_g(0.21, 3.1)] * 3 + [_g(0.25, 3.6)] * 14 + [_g(0.31, 5.0)] * 3
    best = hostgate.best_cals(pool)
    assert best == {"cal1_s": 0.25, "cal32_s": 3.6}
    assert hostgate.accept([_g(0.26, 3.9)], best)   # sustained-clean: in
    assert not hostgate.accept([_g(0.31, 5.0)], best)  # contended: out


def test_preflight_seeds_pool_before_first_verdict(monkeypatch):
    """The first wait_clean() of a batch must not self-accept: with an
    empty pool the session "best" IS the first reading, so a dirty
    first window would always fire a sample. The scheduler seeds the
    pool to 3 readings and judges the freshest one — a dirty opening
    window now sleeps instead of burning the batch's first sample."""
    import bench_scale_100x as b

    # host: fluctuating opener — dirty, clean, dirty. The freshest
    # seed reading (dirty 9.2) is the verdict subject; the clean seed
    # (3.6) anchors the baseline, so the opener sleeps instead of
    # firing (pre-seeding, reading #1 would have self-accepted)
    readings = iter([_g(0.32, 9.0), _g(0.25, 3.6), _g(0.31, 9.2),
                     _g(0.26, 3.8)])
    slept = []

    class FakeHG:
        TOL1, TOL32 = hostgate.TOL1, hostgate.TOL32
        measure = staticmethod(lambda: next(readings))
        best_cals = staticmethod(hostgate.best_cals)
        accept = staticmethod(hostgate.accept)

    pool: list = []
    pre = b._Preflight(pool, poll_s=1.0, wait_budget_s=10.0)
    pre._hg = FakeHG
    monkeypatch.setattr(b.time, "sleep", lambda s: slept.append(s))
    assert pre.wait_clean() is True
    # seeded to 3 before the first verdict; the dirty opener was judged
    # against the seeded best (3.6) -> one skip+sleep, then the 4th
    # (clean) reading fires
    assert len(pool) == 4
    assert pre.skips == 1 and slept == [1.0]


def test_preflight_clean_opener_fires_after_seeding(monkeypatch):
    """A genuinely clean opening window costs only the 2 extra seed
    readings, then fires immediately (no sleep)."""
    import bench_scale_100x as b

    readings = iter([_g(0.25, 3.6), _g(0.26, 3.7), _g(0.25, 3.65)])

    class FakeHG:
        TOL1, TOL32 = hostgate.TOL1, hostgate.TOL32
        measure = staticmethod(lambda: next(readings))
        best_cals = staticmethod(hostgate.best_cals)
        accept = staticmethod(hostgate.accept)

    pool: list = []
    pre = b._Preflight(pool, poll_s=1.0, wait_budget_s=10.0)
    pre._hg = FakeHG
    monkeypatch.setattr(b.time, "sleep",
                        lambda s: (_ for _ in ()).throw(AssertionError))
    assert pre.wait_clean() is True
    assert len(pool) == 3 and pre.skips == 0
