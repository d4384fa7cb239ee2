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
- the PERSISTED ANN serving layout IS measured here (r9): IVF index
  build (one-time ingest cost, scaled nlist = constant cell size) and
  the partition-pruned query pass timed as SEPARATE rows, plus the
  IVF+PQ build + distributed query path. The transient knn_* rows
  (index rebuilt per query call) stay first-step-only — they measure
  the same arithmetic with the build cost mixed in;
- z-order layout is a full-table rewrite (IO-bound; linear by
  construction — file count = ceil(bytes/target)).

etl_job_sync is additionally split into `etl_payload_build` (pure
driver-side Python building the REST-client payloads from the customer
table — grows with the fixture but is NOT an engine scaling signal)
and `etl_spark_sync` (payloads prebuilt, the two run_etl syncs +
materialization timed alone) so growth attributes to the right side.

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
    "etl_payload_build",
    "etl_spark_sync",
    "ivf_index_build",
    "ivf_index_query",
    "ivfpq_index_build",
    "ivfpq_index_query_dist",
    "dedup_exact",
    "dedup_minhash_lsh",
    "dedup_minhash_lsh_bounded",
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

    from uma_etl_iis_loader_spark.io import read_fixture as _rf
    from uma_etl_iis_loader_spark.operators.similarity import (
        build_ivf_index,
        build_ivfpq_index,
        ivf_index_topk,
        ivfpq_topk,
    )

    ann_paths: dict[str, str] = {}

    def _emb():
        return _rf(spark, sf_dir, "embeddings", split=False)

    def _fixed_queries():
        from pyspark.sql import functions as F

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

    out = {}
    for name in SUBSET:
        t0 = time.time()
        w[name]().count()
        out[name] = round(time.time() - t0, 3)
    for p in ann_paths.values():
        shutil.rmtree(os.path.dirname(p), ignore_errors=True)
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
