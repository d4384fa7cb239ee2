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
- the ANN index families (knn_*, pq, ivfpq) were measured at the first
  step with the scaled-nlist recipe; at sf10 the corpus-sized query
  batch is a ~10-minute run that measures the same constant-cell-size
  arithmetic — skipped for harness runtime, noted here;
- z-order layout is a full-table rewrite (IO-bound; linear by
  construction — file count = ceil(bytes/target)).

Usage: python tools/bench_scale_100x.py [sf1_dir] [sf10_dir]
Prints one JSON line; paste into SCALE.md's 100x section.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench_scale import workloads  # noqa: E402  (tools/ sibling)

SUBSET = [
    "flagship_occupancy",
    "etl_job_sync",
    "dedup_exact",
    "dedup_minhash_lsh",
    "dedup_minhash_lsh_hiprec",
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


def run(spark, sf_dir: str, base_dir: str) -> dict[str, float]:
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
    out = {}
    for name in SUBSET:
        t0 = time.time()
        w[name]().count()
        out[name] = round(time.time() - t0, 3)
    return out


def main() -> None:
    from uma_etl_iis_loader_spark.session import build_session

    base = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/testdata_sf1"
    scaled = sys.argv[2] if len(sys.argv) > 2 else "/root/repo/testdata_sf10"
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
    spark = build_session("bench_scale_100x")
    spark.sparkContext.setLogLevel("ERROR")
    r = spark.read.parquet(os.path.join(base, "region.parquet"))
    r.alias("a").join(r.alias("b"), "r_regionkey").count()

    run(spark, base, base)  # warm pass: codegen shapes
    t_base = run(spark, base, base)
    t_scaled = run(spark, scaled, base)
    ratios = {k: round(t_scaled[k] / max(t_base[k], 1e-3), 2) for k in t_base}
    print(
        json.dumps(
            {
                "metric": "scale_step_second_10x",
                "base_dir": base,
                "scaled_dir": scaled,
                "base_s": t_base,
                "scaled_s": t_scaled,
                "ratio": ratios,
                "base_total_s": round(sum(t_base.values()), 2),
                "scaled_total_s": round(sum(t_scaled.values()), 2),
                "total_ratio": round(
                    sum(t_scaled.values()) / sum(t_base.values()), 2
                ),
            }
        )
    )


if __name__ == "__main__":
    main()
