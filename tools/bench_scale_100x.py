"""Second chained 10x scale step: sf1 -> sf10 (= 100x the sf0.1 base).

tools/bench_scale.py measures sf0.1 -> sf1; this harness re-runs a
curated LINEAR-FOOTPRINT subset of the same workloads at sf1 (base) and
sf10 (tools/gen_scale_fixture.py, 100 tiles of sf0.1: 10M events, 500k
documents, 200k embeddings), so the two steps together measure a real
100x data range — the compounding evidence behind SCALE.md's "would
this hold at 1000x" analyses.

Subset rationale (what's excluded and why, so the omission is explicit
rather than silent):
- the method-tagged adjudication unions (sampling_ops, llm_prep_ops,
  corpus_stats_ops, multimodal_ops) embed exact-oracle recomputation by
  DESIGN (the correctness gate's cost, not the production path); their
  production constituents are measured individually below;
- the PERSISTED ANN serving layout IS measured here: IVF index build
  (one-time ingest cost, scaled nlist = constant cell size) and the
  partition-pruned query pass timed as SEPARATE rows, plus the IVF+PQ
  build + distributed query path, plus the two stateless ANN rungs
  (SRP-LSH and flat PQ+refine over the fixed query set). The transient
  knn_* rows (index rebuilt per query call) stay first-step-only — they
  measure the same arithmetic with the build cost mixed in;
- z-order layout is a full-table rewrite (IO-bound; linear by
  construction — file count = ceil(bytes/target)).

ENGINE vs SIMULATION rows: etl_job_sync is split into
`etl_payload_build` (pure driver-side Python building the REST-client
payloads from the customer table — the REFERENCE CLIENT's role, grows
with the fixture but is NOT an engine scaling signal) and
`etl_spark_sync` (payloads prebuilt, the two run_etl syncs +
materialization timed alone). The headline `total_ratio` covers ENGINE
rows only: `etl_payload_build` (driver simulation) and `etl_job_sync`
(which embeds that simulation) are reported per-row for attribution but
excluded from the totals; `all_rows_total_ratio` keeps the
everything-in number for continuity with r8/r9 artifacts.

ISOLATED PROBES (mechanized): any row whose scaled-pass time disagrees
with the committed SCALE_STEP_100X.json by more than --probe-threshold
(default 1.5x, either direction) is automatically re-measured in 3
FRESH sessions (subprocess per run, same warm-up discipline) and the
probe MEDIAN is what lands in scaled_s/base_s/ratio; the inline value
and all probe runs are preserved under "probes" so the spread is
auditable. --force-probe=row1,row2 probes rows unconditionally;
--no-probe disables the phase (e.g. for quick smoke runs).

Usage: python tools/bench_scale_100x.py [sf1_dir] [sf10_dir]
           [--probe-threshold X] [--force-probe a,b] [--no-probe]
           [--probe-only=a,b --reps=N [--replace] [--max-rounds=N]]
Prints one JSON line; paste into SCALE.md's 100x section.
"""

from __future__ import annotations

import json
import os
import statistics
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench_scale import workloads  # noqa: E402  (tools/ sibling)

SUBSET = [
    "flagship_occupancy",
    "etl_job_sync",
    "etl_payload_build",
    "etl_spark_sync",
    "ivf_index_build",
    "ivf_index_query",
    "ivfpq_index_build",
    "ivfpq_index_query_dist",
    "srp_lsh_topk",
    "pq_flat_topk",
    "dedup_exact",
    "dedup_minhash_lsh",
    "dedup_minhash_lsh_margin",
    "dedup_minhash_lsh_bounded",
    "dedup_minhash_lsh_hiprec",
    "longdoc_corpus_build",
    "dedup_lsh_longdoc",
    "dedup_lsh_longdoc_margin",
    "repeated_passages_hashed",
    "bm25_rank",
    "text_analysis",
    "stream_windowed_counts",
    "pagerank_events_8r",
    "bloom_prejoin_filter",
    "funnel_steps",
    "cohort_retention_weekly",
    "negative_sample_k8",
    "weighted_sample_top1k",
    "training_shuffle_64shards",
    "kmeans_assign_k16",
    "decontam_strike_5gram",
]

# rows that are NOT engine scaling signals (driver-side REST-client
# payload simulation, and the combined row that embeds it) — reported
# for attribution, excluded from the headline totals
SIMULATION_ROWS = {"etl_payload_build", "etl_job_sync"}

# probe-mode dependency graph: rows whose thunk consumes state another
# row's thunk produces (payload dicts, persisted index paths). Probing
# a dependent row runs its deps first, untimed, in the same session.
DEPS = {
    "etl_spark_sync": ["etl_payload_build"],
    "ivf_index_query": ["ivf_index_build"],
    "ivfpq_index_query_dist": ["ivfpq_index_build"],
    "dedup_lsh_longdoc": ["longdoc_corpus_build"],
    "dedup_lsh_longdoc_margin": ["longdoc_corpus_build"],
}


def build_workloads(spark, sf_dir: str, base_dir: str):
    """Full thunk dict for one SF dir (bench_scale's workloads plus the
    100x-only rows). Returns (thunks, cleanup_fn). State produced by one
    thunk for another (ETL payloads, ANN index paths) lives in closure
    dicts keyed by sf_dir, so deps must run first — run() follows SUBSET
    order; probe mode follows DEPS."""
    from uma_etl_iis_loader_spark.plans.fixtures import (
        materialize_schedule_fixture,
    )

    materialize_schedule_fixture(spark, sf_dir)
    w = workloads(spark, sf_dir, base_dir)

    def lsh_hiprec():
        # the banding-contrast row: the default harness row runs the
        # RECALL-oriented operating point (16 bands x 4 rows — LSH
        # s-threshold ~0.5, so it must surface moderately-similar
        # pairs, and the 100-tile fixture plants ~s=0.25 copies whose
        # candidate count grows ~quadratically with tiles BY DESIGN of
        # that operating point); this row is the DEDUP-grade point
        # (8 bands x 8 rows — s-threshold ~0.77): per-band collision
        # for the planted s~0.25 pairs is s^8, so candidates — and the
        # verify join — stay linear. Same corpus, same signatures
        # budget; banding is the knob, measured.
        from uma_etl_iis_loader_spark.io import read_fixture
        from uma_etl_iis_loader_spark.operators.dedup import (
            minhash_lsh_pairs,
        )

        docs = read_fixture(spark, sf_dir, "documents")
        return minhash_lsh_pairs(
            docs, num_hashes=64, bands=8, n=3, threshold=0.6,
            char_level=False,
        )

    w["dedup_minhash_lsh_hiprec"] = lsh_hiprec

    def lsh_bounded():
        # the same RECALL-oriented operating point as the default row
        # (16 bands x 4 rows, threshold 0.35) under the production
        # bounds: buckets above max_bucket=32 verify by representative
        # chaining (m-1 comparisons; connected_components downstream
        # restores the family closure — component equality on dup-
        # family fixtures is law-tested in tests/test_dedup.py). This
        # is how a hard recall requirement is SERVED on a boilerplate-
        # dense corpus without paying m^2/2 verifies per dup family.
        from uma_etl_iis_loader_spark.io import read_fixture
        from uma_etl_iis_loader_spark.operators.dedup import (
            minhash_lsh_pairs,
        )

        docs = read_fixture(spark, sf_dir, "documents")
        return minhash_lsh_pairs(
            docs, num_hashes=64, bands=16, n=3, threshold=0.35,
            char_level=False, max_bucket=32,
        )

    w["dedup_minhash_lsh_bounded"] = lsh_bounded

    def lsh_margin():
        # the estimate-first cascade at the recall operating point:
        # pairs whose signature-estimated Jaccard falls below
        # threshold - 0.2 skip the exact gram intersection
        # (false-negative prob per true pair <= exp(-2*0.2^2*64) ~ 0.6%,
        # Hoeffding). Emitted pairs are a SUBSET of the grouped row's
        # (estimate only ever skips; everything emitted is still
        # exact-verified), so measured recall = rows(margin)/rows(grouped)
        # — computed below from the captured row counts.
        from uma_etl_iis_loader_spark.io import read_fixture
        from uma_etl_iis_loader_spark.operators.dedup import (
            minhash_lsh_pairs,
        )

        docs = read_fixture(spark, sf_dir, "documents")
        return minhash_lsh_pairs(
            docs, num_hashes=64, bands=16, n=3, threshold=0.35,
            char_level=False, sig_margin=0.2,
        )

    w["dedup_minhash_lsh_margin"] = lsh_margin

    # --- etl_job_sync phase split: driver payload build vs Spark sync ---
    payloads: dict[str, tuple] = {}

    def etl_payload_build():
        from uma_etl_iis_loader_spark.plans.queries_reference import (
            etl_api_payloads,
        )

        payloads[sf_dir] = etl_api_payloads(sf_dir)
        return spark.range(1)

    def etl_spark_sync():
        from uma_etl_iis_loader_spark.plans.etl_job import run_etl

        api1, api2 = payloads[sf_dir]  # prebuilt by etl_payload_build
        out1 = run_etl(spark, api1, now_ts="2026-03-01 00:00:00")
        seed = {
            k: out1[k]
            for k in (
                "system_state", "faculties", "departments",
                "specialities", "student_groups", "employees",
                "departments_employees", "auditories",
            )
        }
        out2 = run_etl(
            spark, api2, now_ts="2026-03-08 00:00:00", initial=seed
        )
        return out2["student_groups"]

    w["etl_payload_build"] = etl_payload_build
    w["etl_spark_sync"] = etl_spark_sync

    # --- persisted ANN serving layout: build and query timed apart ---
    # scaled nlist keeps cell size ~125 vectors (the production recipe);
    # queries are the base SF's fixed set, so query work scales with the
    # CORPUS only. Build rows measure the one-time ingest cost; query
    # rows measure the partition-pruned serving pass the layout exists
    # for (PartitionFilter pruning itself is plan-asserted in
    # tests/test_similarity.py).
    import shutil
    import tempfile

    from pyspark.sql import functions as F

    from uma_etl_iis_loader_spark.io import read_fixture as _rf
    from uma_etl_iis_loader_spark.operators.similarity import (
        build_ivf_index,
        build_ivfpq_index,
        ivf_index_topk,
        ivfpq_topk,
        srp_lsh_topk,
    )

    ann_paths: dict[str, str] = {}

    def _emb():
        return _rf(spark, sf_dir, "embeddings", split=False)

    def _fixed_queries():
        emb_base = _rf(spark, base_dir, "embeddings", split=False)
        return emb_base.filter(F.col("vec_id") % 25 == 0).select(
            F.col("vec_id").alias("query_id"), "embedding"
        )

    def _nlist():
        return max(16, _emb().count() // 125)

    def ivf_index_build():
        base = tempfile.mkdtemp(prefix="scale100x_ivf_")
        ann_paths["ivf"] = base + "/idx"
        build_ivf_index(_emb(), ann_paths["ivf"], nlist=_nlist())
        return spark.read.parquet(ann_paths["ivf"] + "/centroids")

    def ivf_index_query():
        return ivf_index_topk(
            spark, ann_paths["ivf"], _fixed_queries(), k=10, nprobe=8
        )

    def ivfpq_index_build():
        base = tempfile.mkdtemp(prefix="scale100x_ivfpq_")
        ann_paths["ivfpq"] = base + "/idx"
        build_ivfpq_index(
            _emb(), ann_paths["ivfpq"], nlist=_nlist(), m=8, ksub=256,
            opq_iters=0,
        )
        return spark.read.parquet(ann_paths["ivfpq"] + "/centroids")

    def ivfpq_index_query_dist():
        return ivfpq_topk(
            spark, ann_paths["ivfpq"], _fixed_queries(), k=10,
            nprobe=8, distributed=True,
        )

    w["ivf_index_build"] = ivf_index_build
    w["ivf_index_query"] = ivf_index_query
    w["ivfpq_index_build"] = ivfpq_index_build
    w["ivfpq_index_query_dist"] = ivfpq_index_query_dist

    def srp_topk_row():
        # the STATELESS ANN rung: data-independent hyperplane signatures
        # (pure map on the ingest side, no training pass, survives
        # arbitrary appends) + banded candidate join + exact-cosine
        # rescore. Production banding for a 200k-vector corpus:
        # 32 bits / 4 bands = 8-bit chunks — random-pair collision
        # ~0.4%/band, so the candidate join stays ~|Q| x |C| x 1.6%
        # instead of brute force's |Q| x |C|. Serves the append-heavy /
        # no-retrain regime; IVF(+PQ) serves the read-heavy one.
        return srp_lsh_topk(
            _emb(), _fixed_queries(), k=10, n_bits=32, bands=4, d=64
        )

    def pq_flat_row():
        # the flat PQ+refine rung (bench_scale's pq_fixed_q shape):
        # constant-size codebook train + linear Arrow encode + ADC scan
        # with partition-local top-k + exact rescore of k*4 candidates.
        # Serves memory-bound corpora where 8-byte codes must replace
        # 256-byte vectors but cell-pruned layouts aren't warranted
        # (uniform query load, no hot cells).
        from uma_etl_iis_loader_spark.operators.similarity import (
            pq_encode,
            pq_topk,
            train_pq_codebooks,
        )

        emb = _emb()
        books = train_pq_codebooks(emb, m=8, ksub=256)
        return pq_topk(
            pq_encode(emb, books), books, _fixed_queries(), k=10,
            refine_corpus=emb, refine_factor=4,
        )

    w["srp_lsh_topk"] = srp_topk_row
    w["pq_flat_topk"] = pq_flat_row

    # --- sig_margin winning regime: LONG documents (grams >> hashes) ---
    # r10 measured cascade parity at the fixture's ~50-word docs (the
    # estimate costs about what it saves); the design claim "wins when
    # grams >> num_hashes" is exercised here on a long-doc corpus built
    # from the fixture itself: sliding windows of 20 consecutive
    # doc_ids, stride 4 — ~1,080-word long docs (54-word fixture
    # average). Distance-d window neighbors share (20-4d) of their
    # (20+4d) source docs (d=1: J~0.67 = the TRUE pairs at threshold
    # 0.5; d=2: 0.43; d=3: 0.25), and the tile-marker perturbation
    # makes cross-tile same-window copies J~0.25 — a sub-threshold
    # candidate population that grows QUADRATICALLY with tiles
    # (C(tiles,2) collisions per window family at ~6% LSH collision
    # rate), exactly the regime the cascade exists for: at threshold
    # 0.5, sig_margin 0.2 (estimate cut 0.3; Hoeffding per-true-pair
    # miss <= exp(-2*0.2^2*64) ~ 0.6%), the 64-element signature
    # estimate skips the ~1,080-gram exact intersection for every
    # planted sub-threshold candidate, while d=1 (est ~0.67) and d=2
    # (est ~0.43) pairs still reach the exact verify in BOTH rows.
    # The corpus is materialized ONCE as a dep row (longdoc_corpus_
    # build, untimed in probes) so the margin-vs-plain contrast
    # measures the verify path, not the shared window-concat shuffle.
    longdoc_paths: dict[str, str] = {}

    def longdoc_corpus_build():
        docs = _rf(spark, sf_dir, "documents")
        exploded = (
            docs.select(
                "doc_id",
                "text",
                F.explode(F.sequence(F.lit(0), F.lit(4))).alias("j"),
            )
            .select(
                (F.floor(F.col("doc_id") / 4) - F.col("j")).alias("win_id"),
                "doc_id",
                "text",
            )
            .filter(F.col("win_id") >= 0)
        )
        long_docs = (
            exploded.groupBy("win_id")
            .agg(
                F.concat_ws(
                    " ",
                    F.transform(
                        F.array_sort(
                            F.collect_list(F.struct("doc_id", "text"))
                        ),
                        lambda s: s["text"],
                    ),
                ).alias("text")
            )
            .select(F.col("win_id").alias("doc_id"), "text")
        )
        base_tmp = tempfile.mkdtemp(prefix="scale100x_longdoc_")
        longdoc_paths[sf_dir] = base_tmp + "/docs"
        long_docs.write.parquet(longdoc_paths[sf_dir])
        return spark.read.parquet(longdoc_paths[sf_dir])

    def _longdoc_lsh(margin):
        from uma_etl_iis_loader_spark.operators.dedup import (
            minhash_lsh_pairs,
        )

        ld = spark.read.parquet(longdoc_paths[sf_dir])
        return minhash_lsh_pairs(
            ld, num_hashes=64, bands=16, n=3, threshold=0.5,
            char_level=False, sig_margin=margin,
        )

    w["longdoc_corpus_build"] = longdoc_corpus_build
    w["dedup_lsh_longdoc"] = lambda: _longdoc_lsh(None)
    w["dedup_lsh_longdoc_margin"] = lambda: _longdoc_lsh(0.2)

    def cleanup():
        for p in ann_paths.values():
            shutil.rmtree(os.path.dirname(p), ignore_errors=True)
        for p in longdoc_paths.values():
            shutil.rmtree(os.path.dirname(p), ignore_errors=True)

    return w, cleanup


def run(spark, sf_dir: str, base_dir: str, names=None):
    """Time each row; returns (times, row_counts)."""
    w, cleanup = build_workloads(spark, sf_dir, base_dir)
    out, counts = {}, {}
    try:
        for name in names or SUBSET:
            t0 = time.time()
            counts[name] = w[name]().count()
            out[name] = round(time.time() - t0, 3)
    finally:
        cleanup()
    return out, counts


def _warmup(spark, base: str):
    r = spark.read.parquet(os.path.join(base, "region.parquet"))
    r.alias("a").join(r.alias("b"), "r_regionkey").count()


def probe_row(name: str, base: str, scaled: str) -> None:
    """One fresh-session isolated probe: warm at base (deps + row,
    untimed), timed base run, then deps + timed scaled run. Host-gate
    calibrations (tools/hostgate.py) bracket the timed work — the
    parent gates the sample against the session's best calibration.
    Prints one PROBE_RESULT line."""
    import hostgate

    from uma_etl_iis_loader_spark.session import build_session

    spark = build_session("bench_scale_100x_probe")
    spark.sparkContext.setLogLevel("ERROR")
    _warmup(spark, base)
    deps = DEPS.get(name, [])

    w, cleanup = build_workloads(spark, base, base)
    try:
        for d in deps:
            w[d]().count()
        w[name]().count()  # warm pass: codegen shapes
        hostgate.warm()
        gate_before = hostgate.measure()
        t0 = time.time()
        rows_base = w[name]().count()
        base_s = round(time.time() - t0, 3)
    finally:
        cleanup()

    w, cleanup = build_workloads(spark, scaled, base)
    try:
        for d in deps:
            w[d]().count()
        t0 = time.time()
        rows_scaled = w[name]().count()
        scaled_s = round(time.time() - t0, 3)
    finally:
        cleanup()
    gate_after = hostgate.measure()
    print(
        "PROBE_RESULT "
        + json.dumps(
            {
                "row": name,
                "base_s": base_s,
                "scaled_s": scaled_s,
                "rows_base": rows_base,
                "rows_scaled": rows_scaled,
                "gate_before": gate_before,
                "gate_after": gate_after,
            }
        )
    )


def _sample_gates(s):
    return [s["gate_before"], s["gate_after"]] if "gate_before" in s else []


def _accepted(samples, best):
    """Split samples into (accepted, rejected) against the session-best
    calibration. Legacy samples with no gate info count as accepted
    (pre-gate artifacts merge unchanged)."""
    import hostgate

    acc, rej = [], []
    for s in samples:
        gs = _sample_gates(s)
        (acc if not gs or hostgate.accept(gs, best) else rej).append(s)
    return acc, rej


def _run_probes(rows, base, scaled, reps=3, max_rounds=None):
    """Fresh-session HOST-GATED probes: interleaved rounds (every row
    once, then again — a slow host window spreads across rows instead
    of poisoning one row's sample) until every row holds `reps`
    samples whose bracketing calibrations (tools/hostgate.py: fixed-
    work single-core + whole-host spins before AND after the timed
    work) sit within tolerance of the SESSION-BEST calibration, or
    `max_rounds` (default 3*reps) is exhausted. Medians land over the
    accepted samples only; every raw sample — accepted or gated out —
    is preserved with its calibrations, so the gate decision is
    auditable, never prose."""
    import hostgate

    # pre-touch both fixtures into the OS page cache (bench.py's
    # discipline): the first probe of a session otherwise pays the sf10
    # first-touch disk I/O inside its timed scaled pass — a ~10x
    # one-sample outlier the CPU-calibration gate cannot see
    for d in (base, scaled):
        for root, _dirs, files in os.walk(d):
            for fname in sorted(files):
                with open(os.path.join(root, fname), "rb") as fh:
                    while fh.read(1 << 22):
                        pass

    max_rounds = max_rounds or 3 * reps
    samples: dict[str, list[dict]] = {n: [] for n in rows}
    all_gates: list[dict] = []
    for i in range(max_rounds):
        best = hostgate.best_cals(all_gates) if all_gates else None
        pending = [
            n for n in rows
            if not best or len(_accepted(samples[n], best)[0]) < reps
        ]
        if not pending:
            break
        for name in pending:
            p = subprocess.run(
                [sys.executable, os.path.abspath(__file__),
                 "--probe-row", name, base, scaled],
                capture_output=True, text=True, timeout=3600,
            )
            line = next(
                (ln for ln in reversed(p.stdout.splitlines())
                 if ln.startswith("PROBE_RESULT ")),
                None,
            )
            if line is None:
                print(
                    f"probe {name} round {i} failed rc={p.returncode}: "
                    f"{p.stderr[-500:]}",
                    file=sys.stderr,
                )
                continue
            r = json.loads(line[len("PROBE_RESULT "):])
            samples[name].append(r)
            all_gates.extend(_sample_gates(r))
    best = hostgate.best_cals(all_gates) if all_gates else None
    return {
        name: _probe_summary(ss, best)
        for name, ss in samples.items()
        if ss
    }


def _probe_summary(samples, best):
    """Summarize one row's probe samples: medians over gate-ACCEPTED
    samples (falls back to all samples, flagged `gate_exhausted`, if
    the gate rejected every one); all raw samples preserved."""
    import hostgate

    acc, rej = _accepted(samples, best) if best else (samples, [])
    gate_exhausted = not acc
    use = acc or samples
    runs_b = [s["base_s"] for s in use]
    runs_s = [s["scaled_s"] for s in use]
    out = {
        "runs_base_s": runs_b,
        "runs_scaled_s": runs_s,
        "median_base_s": round(statistics.median(runs_b), 3),
        "median_scaled_s": round(statistics.median(runs_s), 3),
        "spread_scaled": round(max(runs_s) / max(min(runs_s), 1e-3), 2),
    }
    if "rows_base" in use[0]:
        out["rows_base"] = use[0]["rows_base"]
        out["rows_scaled"] = use[0]["rows_scaled"]
    if best:
        out["gate"] = {
            "best_cals": best,
            "tol1": hostgate.TOL1,
            "tol32": hostgate.TOL32,
            "accepted": len(acc),
            "rejected": len(rej),
            "samples": samples,  # raw, incl. per-sample calibrations
        }
        if gate_exhausted:
            out["gate"]["gate_exhausted"] = True
    return out


def probe_only(rows, reps, base, scaled, artifact_path,
               replace=False, max_rounds=None) -> None:
    """Top-up mode: run `reps` more interleaved fresh-session GATED
    probe rounds for `rows` and fold them into the committed artifact
    without repeating the 17-minute inline passes. Default: run lists
    APPEND (legacy continuity; medians/ratios/totals recompute over the
    union). ``--replace``: the new gated summary REPLACES the row's
    runs — the old (pre-gate, window-suspect) runs are preserved under
    ``superseded`` for audit, and the landing medians come from gated
    samples only. This is how a noisy-window artifact converges.
    ``--max-rounds=N`` caps the interleaved rounds (default 3*reps) so
    a batch fits a wall-clock budget on a host that keeps rejecting.

    A fully gate-EXHAUSTED batch (zero accepted samples for a row that
    already has landing medians) never overwrites those medians in
    either direction: its fallback medians are by construction computed
    from certified-rejected samples, so the batch lands as raw audit
    data under ``rejected_batches`` instead — the gate's verdict
    ("no clean window existed") is recorded, the landing evidence is
    not diluted."""
    art = json.load(open(artifact_path))
    new = _run_probes(rows, base, scaled, reps=reps, max_rounds=max_rounds)
    probes = art.setdefault("probes", {})
    for name, pr in new.items():
        old = probes.get(name)
        if (
            old is not None
            and pr.get("gate", {}).get("gate_exhausted")
            and "median_scaled_s" in old
        ):
            old.setdefault("rejected_batches", []).append(pr)
            continue
        if old is not None and not replace:
            runs_b = old["runs_base_s"] + pr["runs_base_s"]
            runs_s = old["runs_scaled_s"] + pr["runs_scaled_s"]
            merged = {
                "runs_base_s": runs_b,
                "runs_scaled_s": runs_s,
                "median_base_s": round(statistics.median(runs_b), 3),
                "median_scaled_s": round(statistics.median(runs_s), 3),
                "spread_scaled": round(
                    max(runs_s) / max(min(runs_s), 1e-3), 2
                ),
            }
            if "gate" in pr:
                merged["gate"] = pr["gate"]
            for carry in ("rejected_batches", "superseded"):
                if carry in old:
                    merged[carry] = old[carry]
            merged["inline_base_s"] = old.get("inline_base_s")
            merged["inline_scaled_s"] = old.get("inline_scaled_s")
            merged["prior_scaled_s"] = old.get("prior_scaled_s")
            probes[name] = merged
        else:
            if old is not None:
                pr["superseded"] = {
                    k: old.get(k)
                    for k in (
                        "runs_base_s", "runs_scaled_s",
                        "median_base_s", "median_scaled_s",
                        "spread_scaled",
                    )
                }
                pr["inline_base_s"] = old.get("inline_base_s")
                pr["inline_scaled_s"] = old.get("inline_scaled_s")
                pr["prior_scaled_s"] = old.get("prior_scaled_s")
            else:
                pr["inline_base_s"] = art["base_s"].get(name)
                pr["inline_scaled_s"] = art["scaled_s"].get(name)
            probes[name] = pr
        art["base_s"][name] = probes[name]["median_base_s"]
        art["scaled_s"][name] = probes[name]["median_scaled_s"]
    art["ratio"] = {
        k: round(art["scaled_s"][k] / max(art["base_s"][k], 1e-3), 2)
        for k in art["base_s"]
    }
    eng_b = sum(
        v for k, v in art["base_s"].items() if k not in SIMULATION_ROWS
    )
    eng_s = sum(
        v for k, v in art["scaled_s"].items() if k not in SIMULATION_ROWS
    )
    art["base_total_s"] = round(eng_b, 2)
    art["scaled_total_s"] = round(eng_s, 2)
    art["total_ratio"] = round(eng_s / eng_b, 2)
    art["all_rows_total_ratio"] = round(
        sum(art["scaled_s"].values()) / sum(art["base_s"].values()), 2
    )
    tmp = artifact_path + ".tmp"
    with open(tmp, "w") as fh:
        json.dump(art, fh, indent=1)
    os.replace(tmp, artifact_path)  # atomic: a crash never truncates
    print(json.dumps(art))


def main() -> None:
    from uma_etl_iis_loader_spark.session import build_session

    argv = sys.argv[1:]
    if argv and argv[0] == "--probe-row":
        probe_row(argv[1], argv[2], argv[3])
        return

    threshold, force, do_probe = 1.5, [], True
    probe_only_rows, reps, replace, max_rounds = None, 3, False, None
    pos = []
    for a in argv:
        if a.startswith("--probe-threshold"):
            threshold = float(a.split("=", 1)[1])
        elif a.startswith("--force-probe"):
            force = [s for s in a.split("=", 1)[1].split(",") if s]
        elif a.startswith("--probe-only"):
            probe_only_rows = [s for s in a.split("=", 1)[1].split(",") if s]
        elif a.startswith("--reps"):
            reps = int(a.split("=", 1)[1])
        elif a.startswith("--max-rounds"):
            max_rounds = int(a.split("=", 1)[1])
        elif a == "--no-probe":
            do_probe = False
        elif a == "--replace":
            replace = True
        else:
            pos.append(a)
    base = pos[0] if pos else "/root/repo/testdata_sf1"
    scaled = pos[1] if len(pos) > 1 else "/root/repo/testdata_sf10"
    for d, tiles, src in ((base, 10, "/root/testdata/sf0.1"),
                          (scaled, 100, "/root/testdata/sf0.1")):
        if not os.path.isdir(d):
            sys.exit(
                f"fixture dir {d} missing (gitignored) — regenerate with:\n"
                f"  python tools/gen_scale_fixture.py {src} {d} {tiles}"
            )
    if os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g") == "8g":
        print(
            "warning: sf10 aggregations OOM the 8g default heap — "
            "run with SPARK_GRAFT_DRIVER_MEM=48g",
            file=sys.stderr,
        )
    prior_artifact = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "SCALE_STEP_100X.json",
    )
    if probe_only_rows is not None:
        probe_only(probe_only_rows, reps, base, scaled, prior_artifact,
                   replace=replace, max_rounds=max_rounds)
        return
    spark = build_session("bench_scale_100x")
    spark.sparkContext.setLogLevel("ERROR")
    _warmup(spark, base)

    run(spark, base, base)  # warm pass: codegen shapes
    t_base, n_base = run(spark, base, base)
    t_scaled, n_scaled = run(spark, scaled, base)

    # mechanized isolated probes: compare this run's scaled pass to the
    # committed artifact; disagreement beyond the threshold (either
    # direction) = window-suspect cell -> fresh-session median-of-3
    prior_path = prior_artifact
    flagged = list(force)
    prior_scaled = {}
    if os.path.isfile(prior_path):
        try:
            prior_scaled = json.load(open(prior_path)).get("scaled_s", {})
        except (json.JSONDecodeError, OSError):
            pass
    for k, cur in t_scaled.items():
        pri = prior_scaled.get(k)
        if pri and k not in flagged:
            hi, lo = max(cur, pri), max(min(cur, pri), 1e-3)
            if hi / lo > threshold:
                flagged.append(k)
    probes = {}
    if do_probe and flagged:
        print(f"probing (fresh-session median-of-3): {flagged}",
              file=sys.stderr)
        probes = _run_probes(flagged, base, scaled)
        for k, pr in probes.items():
            pr["inline_base_s"] = t_base[k]
            pr["inline_scaled_s"] = t_scaled[k]
            pr["prior_scaled_s"] = prior_scaled.get(k)
            t_base[k] = pr["median_base_s"]
            t_scaled[k] = pr["median_scaled_s"]

    ratios = {k: round(t_scaled[k] / max(t_base[k], 1e-3), 2) for k in t_base}
    eng_b = sum(v for k, v in t_base.items() if k not in SIMULATION_ROWS)
    eng_s = sum(v for k, v in t_scaled.items() if k not in SIMULATION_ROWS)
    margin_recall = {
        d: (
            round(
                n["dedup_minhash_lsh_margin"] / n["dedup_minhash_lsh"], 4
            )
            if n.get("dedup_minhash_lsh")
            else None
        )
        for d, n in (("base", n_base), ("scaled", n_scaled))
    }
    longdoc_recall = {
        d: (
            round(n["dedup_lsh_longdoc_margin"] / n["dedup_lsh_longdoc"], 4)
            if n.get("dedup_lsh_longdoc")
            else None
        )
        for d, n in (("base", n_base), ("scaled", n_scaled))
    }
    print(
        json.dumps(
            {
                "metric": "scale_step_second_10x",
                "base_dir": base,
                "scaled_dir": scaled,
                "base_s": t_base,
                "scaled_s": t_scaled,
                "ratio": ratios,
                # ENGINE totals: driver-side REST-payload simulation
                # (etl_payload_build, and etl_job_sync which embeds it)
                # excluded; etl_spark_sync carries the engine cost
                "base_total_s": round(eng_b, 2),
                "scaled_total_s": round(eng_s, 2),
                "total_ratio": round(eng_s / eng_b, 2),
                "excluded_from_total": sorted(SIMULATION_ROWS),
                "all_rows_total_ratio": round(
                    sum(t_scaled.values()) / sum(t_base.values()), 2
                ),
                # sig_margin cascade: emitted pairs are a subset of the
                # grouped row's, so recall = rows(margin)/rows(grouped)
                "lsh_margin_pair_recall": margin_recall,
                "lsh_longdoc_pair_recall": longdoc_recall,
                "lsh_pair_rows": {
                    k: n_scaled.get(k)
                    for k in (
                        "dedup_minhash_lsh", "dedup_minhash_lsh_margin",
                        "dedup_minhash_lsh_bounded",
                        "dedup_lsh_longdoc", "dedup_lsh_longdoc_margin",
                    )
                },
                "probes": probes,
            }
        )
    )


if __name__ == "__main__":
    main()
