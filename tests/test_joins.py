from __future__ import annotations

from pyspark.sql import functions as F

from uma_etl_iis_loader_spark.operators.joins import (
    anti_missing,
    backfill_first_match,
    fk_repair_placeholders,
    normalized_lookup,
    semi_fk_filter,
)


def test_semi_fk_filter(spark):
    child = spark.createDataFrame([(1, 10), (2, 99)], "id long, fk long")
    dim = spark.createDataFrame([(10,)], "id long")
    out = semi_fk_filter(child, dim, "fk").collect()
    assert [(r.id, r.fk) for r in out] == [(1, 10)]


def test_anti_missing(spark):
    cur = spark.createDataFrame([(1,), (2,)], "id long")
    inc = spark.createDataFrame([(2,), (3,)], "id long")
    assert [r.id for r in anti_missing(cur, inc, "id").collect()] == [1]


def test_fk_repair_placeholders(spark):
    dim = spark.createDataFrame([(1, "F1")], "id long, name string")
    child = spark.createDataFrame([(1,), (7,), (None,)], "faculty_id long")
    out = fk_repair_placeholders(
        child,
        dim,
        "faculty_id",
        "id",
        {"name": F.concat(F.lit("Unknown Faculty "), F.col("id").cast("string"))},
    )
    assert {(r.id, r.name) for r in out.collect()} == {
        (1, "F1"),
        (7, "Unknown Faculty 7"),
    }


def test_normalized_lookup_name_or_abbr(spark):
    dim = spark.createDataFrame(
        [(1, "Computer Science", "CS"), (2, "Maths", "MA")],
        "id long, name string, abbr string",
    )
    facts = spark.createDataFrame(
        [("  computer science ",), ("ma",), ("nope",)], "dept string"
    )
    out = normalized_lookup(facts, dim, "dept", "id", ["name", "abbr"])
    got = {(r.dept.strip(), r.resolved_id) for r in out.collect()}
    assert got == {("computer science", 1), ("ma", 2), ("nope", None)}


def test_backfill_first_match_deterministic(spark):
    target = spark.createDataFrame([("G1",), ("G2",)], "name string")
    src = spark.createDataFrame(
        [("G1", 3, 30), ("G1", 1, 10), ("G1", 2, 20)],
        "name string, ord int, cnt int",
    )
    out = backfill_first_match(target, src, "name", "ord", "cnt", "students")
    got = {(r.name, r.students) for r in out.collect()}
    assert got == {("G1", 10), ("G2", None)}


def test_salted_join_matches_plain_join(spark):
    from uma_etl_iis_loader_spark.operators.joins import salted_join

    # hot key: 90% of left rows share key 1
    left = spark.createDataFrame(
        [(1 if i % 10 else 2, i) for i in range(1000)], "k long, v long"
    )
    right = spark.createDataFrame([(1, "hot"), (2, "cold")], "k long, name string")
    got = {(r.k, r.v, r.name) for r in salted_join(left, right, "k").collect()}
    want = {(r.k, r.v, r.name) for r in left.join(right, "k").collect()}
    assert got == want
    # salt actually spreads the hot key across buckets
    from pyspark.sql import functions as F

    salted = left.withColumn(
        "s", F.pmod(F.xxhash64(F.monotonically_increasing_id()), F.lit(16))
    )
    assert salted.filter(F.col("k") == 1).select("s").distinct().count() > 8


# ---------------------------------------------------------------------------
# fuzzy_lookup — SymSpell deletion-neighborhood edit-distance join
# ---------------------------------------------------------------------------


def _lev(a: str, b: str) -> int:
    """Reference Levenshtein (unit-cost insert/delete/substitute)."""
    if len(a) < len(b):
        a, b = b, a
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


def _brute_resolve(fact_keys, names, max_dist):
    """Driver-side oracle: per fact key the (dist, id)-min match ≤ max_dist."""
    out = {}
    for k in fact_keys:
        kn = k.strip().lower()
        best = None
        for name, nid in names:
            d = _lev(kn, name.strip().lower())
            if d <= max_dist and (best is None or (d, nid) < best):
                best = (d, nid)
        out[k] = best
    return out


def test_fuzzy_lookup_golden(spark):
    from uma_etl_iis_loader_spark.operators.joins import fuzzy_lookup

    dim = spark.createDataFrame(
        [(1, "Main Hall"), (2, "Annex"), (3, "Library")], "id long, name string"
    )
    facts = spark.createDataFrame(
        [("main hall",), ("Mian Hall",), (" anex ",), ("librray",), ("gym",), (None,)],
        "ref string",
    )
    out = fuzzy_lookup(facts, dim, "ref", "id", "name", max_dist=2, dist_col="d")
    got = {(r.ref, r.resolved_id, r.d) for r in out.collect()}
    assert got == {
        ("main hall", 1, 0),   # exact (normalized) match wins at distance 0
        ("Mian Hall", 1, 2),   # transposition = 2 edits
        (" anex ", 2, 1),      # trim + one insertion
        ("librray", 3, 2),
        ("gym", None, None),   # nothing within distance 2
        (None, None, None),    # null key passes through unresolved
    }


def test_fuzzy_lookup_matches_brute_force(spark):
    """Completeness of the deletion-neighborhood block: every brute-force
    levenshtein match ≤ d is found (the SymSpell guarantee), and the
    (dist, id)-min tie-break agrees — for d=1 and d=2 over a corpus with
    dense distance-1 neighbors (shared prefixes, 1-char edits)."""
    from uma_etl_iis_loader_spark.operators.joins import fuzzy_lookup

    names = [
        (10, "room-a1"), (11, "room-a2"), (12, "room-b1"), (13, "roomb1"),
        (14, "hall"), (15, "halls"), (16, "x"), (17, "xy"),
    ]
    fact_keys = [
        "room-a1", "room-a", "rom-a1", "room-ab1", "hal", "hallss",
        "x", "", "zzzzz", "ROOM-B1 ",
    ]
    dim = spark.createDataFrame(names, "id long, name string")
    facts = spark.createDataFrame([(k,) for k in fact_keys], "ref string")
    for d in (1, 2):
        out = fuzzy_lookup(facts, dim, "ref", "id", "name", max_dist=d, dist_col="d")
        got = {r.ref: (r.d, r.resolved_id) for r in out.collect()}
        want = _brute_resolve(
            [k for k in fact_keys if k.strip()], [(n, i) for i, n in names], d
        )
        for k in fact_keys:
            if not k.strip():
                assert got[k] == (None, None)
            elif want.get(k) is None:
                assert got[k] == (None, None), (d, k, got[k])
            else:
                assert got[k] == want[k], (d, k, got[k], want[k])


def test_fuzzy_lookup_exact_beats_fuzzy_tiebreak(spark):
    """A distance-0 match must win even when a lower-id dim row sits at
    distance 1 (struct-min orders by dist FIRST)."""
    from uma_etl_iis_loader_spark.operators.joins import fuzzy_lookup

    dim = spark.createDataFrame([(1, "cat"), (2, "cart")], "id long, name string")
    facts = spark.createDataFrame([("cart",)], "ref string")
    out = fuzzy_lookup(facts, dim, "ref", "id", "name", max_dist=1).collect()
    assert out[0].resolved_id == 2


# ---------------------------------------------------------------------------
# bloom_semi_filter — explicit pre-join runtime filter
# ---------------------------------------------------------------------------


def test_bloom_filter_no_false_negatives_and_composes(spark):
    """Every true match survives the bloom pre-filter (superset
    semantics), so the downstream join result is IDENTICAL with and
    without it — and on disjoint keys the filter actually prunes."""
    from uma_etl_iis_loader_spark.operators.joins import (
        bloom_semi_filter,
        build_bloom,
    )
    from pyspark.sql import functions as F

    dim = spark.range(0, 500).select((F.col("id") * 3).alias("k"))
    probe = spark.range(0, 20_000).select(
        F.col("id").alias("k"), (F.col("id") * 7).alias("v")
    )
    bloom = build_bloom(dim, "k", num_bits=1 << 16, num_hashes=5)
    filtered = bloom_semi_filter(probe, bloom, "k", num_bits=1 << 16, num_hashes=5)

    want = {(r.k, r.v) for r in probe.join(dim, "k").collect()}
    got = {(r.k, r.v) for r in filtered.join(dim, "k").collect()}
    assert got == want and len(want) == 500

    # pruning is real: probe keys 1500..20000 are all non-members; at
    # 2^16 bits / 1500 distinct member keys the fp rate is a few percent
    n_kept = filtered.count()
    assert n_kept < 3000, n_kept  # vs 20_000 unfiltered
    # and every true member was kept
    member_keys = {r.k for r in filtered.collect()}
    assert {r.k for r in dim.collect() if r.k < 20_000} <= member_keys


def test_bloom_filter_keeps_nulls(spark):
    from uma_etl_iis_loader_spark.operators.joins import (
        bloom_semi_filter,
        build_bloom,
    )

    dim = spark.createDataFrame([(1,), (2,)], "k long")
    probe = spark.createDataFrame([(1,), (None,), (999,)], "k long")
    bloom = build_bloom(dim, "k", num_bits=1 << 10, num_hashes=3)
    kept = {
        r.k for r in bloom_semi_filter(probe, bloom, "k", 1 << 10, 3).collect()
    }
    assert None in kept and 1 in kept


def _fuzzy_property_check(spark, names, fact_keys, d):
    from uma_etl_iis_loader_spark.operators.joins import fuzzy_lookup

    dim = spark.createDataFrame(list(enumerate(names)), "id long, name string")
    facts = spark.createDataFrame([(k,) for k in fact_keys], "ref string")
    out = fuzzy_lookup(facts, dim, "ref", "id", "name", max_dist=d, dist_col="d")
    got = {r.ref: (r.d, r.resolved_id) for r in out.collect()}
    want = _brute_resolve(fact_keys, [(n, i) for i, n in enumerate(names)], d)
    for k in fact_keys:
        if not k.strip():
            assert got[k] == (None, None)
        else:
            assert got[k] == (want.get(k) or (None, None)), (d, k, got[k], want.get(k))


def test_fuzzy_lookup_property_random_corpora(spark):
    """Hypothesis: over random short alphabets (dense accidental
    neighborhoods), the blocked plan equals the brute-force levenshtein
    definition for d in {1, 2} — completeness (SymSpell guarantee),
    soundness (verify step), and tie-break."""
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    word = st.text(alphabet="abc", min_size=0, max_size=5)

    @settings(
        max_examples=10,
        deadline=None,
        suppress_health_check=[HealthCheck.function_scoped_fixture],
    )
    @given(
        names=st.lists(word.filter(lambda s: s.strip()), min_size=1, max_size=6),
        fact_keys=st.lists(word, min_size=1, max_size=6, unique=True),
        d=st.sampled_from([1, 2]),
    )
    def inner(names, fact_keys, d):
        _fuzzy_property_check(spark, names, fact_keys, d)

    inner()


def test_bloom_filter_params_from_frame_override_mismatch(spark):
    """The bloom frame carries num_bits/num_hashes, so a caller passing
    WRONG fallback parameters still gets zero false negatives — the
    embedded build-time parameters win (ADVICE r5)."""
    from uma_etl_iis_loader_spark.operators.joins import (
        bloom_semi_filter,
        build_bloom,
    )
    from pyspark.sql import functions as F

    dim = spark.range(0, 300).select((F.col("id") * 2).alias("k"))
    probe = spark.range(0, 2000).select(F.col("id").alias("k"))
    bloom = build_bloom(dim, "k", num_bits=1 << 14, num_hashes=4)
    assert {"bits", "num_bits", "num_hashes"} <= set(bloom.columns)
    # deliberately mismatched fallback args — must be ignored
    kept = {
        r.k
        for r in bloom_semi_filter(
            probe, bloom, "k", num_bits=1 << 20, num_hashes=7
        ).collect()
    }
    members = {r.k for r in dim.collect() if r.k < 2000}
    assert members <= kept  # superset guarantee survives the mismatch


def test_bloom_filter_probe_with_bits_column(spark):
    """A probe frame that already owns a `bits` column passes through
    untouched — the broadcast filter columns use collision-safe internal
    names (ADVICE r5)."""
    from uma_etl_iis_loader_spark.operators.joins import (
        bloom_semi_filter,
        build_bloom,
    )

    dim = spark.createDataFrame([(1,), (2,)], "k long")
    probe = spark.createDataFrame(
        [(1, "a"), (999, "b")], "k long, bits string"
    )
    bloom = build_bloom(dim, "k", num_bits=1 << 10, num_hashes=3)
    rows = bloom_semi_filter(probe, bloom, "k").collect()
    assert {r.k: r.bits for r in rows}[1] == "a"
    assert "bits" in bloom_semi_filter(probe, bloom, "k").columns


def test_bloom_filter_missing_meta_requires_params(spark):
    """Legacy bloom frames (bits only) need explicit fallback params;
    omitting them is a loud error, not a silent wrong answer."""
    import pytest

    from uma_etl_iis_loader_spark.operators.joins import (
        bloom_semi_filter,
        build_bloom,
    )

    dim = spark.createDataFrame([(1,), (2,)], "k long")
    probe = spark.createDataFrame([(1,), (999,)], "k long")
    legacy = build_bloom(dim, "k", num_bits=1 << 10, num_hashes=3).select("bits")
    with pytest.raises(ValueError, match="num_bits"):
        bloom_semi_filter(probe, legacy, "k")
    kept = {
        r.k
        for r in bloom_semi_filter(
            probe, legacy, "k", num_bits=1 << 10, num_hashes=3
        ).collect()
    }
    assert 1 in kept
