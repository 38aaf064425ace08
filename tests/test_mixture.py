"""Corpus mixture operators: token-budget selection, domain reweighting,
source overlap, and SemDeDup-style semantic dedup — planted-case exactness
plus the invariants the oracles can't see (cluster-blocking recall)."""

from __future__ import annotations

import math
import random

from pyspark.sql import functions as F

from databricks_etl_pipelines_spark.operators.curation import (
    domain_mixture_weights,
    source_overlap,
    token_budget_select,
    token_budget_select_bounded,
)
from databricks_etl_pipelines_spark.operators.dedup import (
    embedding_cosine_pairs,
    semantic_dedup_pairs,
)


def test_token_budget_select_greedy_prefix(spark):
    # group "a": quality-ordered tokens 50, 40, 30 with budget 95 keeps the
    # first two (cum 50, 90) and cuts the third (cum 120 > 95); once the
    # budget is crossed NOTHING later re-enters, even if it would fit —
    # greedy-prefix semantics, not knapsack
    rows = [
        ("a", 1, 90, 50),
        ("a", 2, 80, 40),
        ("a", 3, 70, 30),
        ("a", 4, 60, 4),   # would fit after doc 3 is cut — must stay cut
        ("b", 5, 99, 200),  # single doc over budget: group keeps nothing
        ("c", 6, 10, 95),   # exactly at budget boundary: kept
    ]
    df = spark.createDataFrame(
        rows, "source string, doc_id long, quality long, n_tokens long"
    )
    out = token_budget_select(
        df, "source", "quality", "n_tokens", "doc_id", 95
    )
    kept = {r.doc_id: r.cum_tokens for r in out.collect()}
    assert kept == {1: 50, 2: 90, 6: 95}


def test_token_budget_select_tiebreak_is_doc_id(spark):
    # equal quality everywhere: selection must be by doc_id ascending
    rows = [("a", i, 50, 40) for i in (5, 3, 1, 4, 2)]
    df = spark.createDataFrame(
        rows, "source string, doc_id long, quality long, n_tokens long"
    )
    out = token_budget_select(df, "source", "quality", "n_tokens", "doc_id", 100)
    assert sorted(r.doc_id for r in out.collect()) == [1, 2]


def _tbs_rows(seed, n_groups=4, n_rows=400, dup_every=3, null_every=17):
    """Adversarial planted data for budget selection: duplicate priorities
    (tiebreak paths), NULL priorities (DESC NULLS LAST), zero-token rows
    (boundary semantics), and one group holding half the rows (skew)."""
    rng = random.Random(seed)
    rows = []
    for i in range(n_rows):
        g = "g0" if i % 2 == 0 else f"g{rng.randrange(1, n_groups)}"
        pri = None if i % null_every == 0 else rng.randrange(0, n_rows // dup_every)
        tok = 0 if i % 29 == 0 else rng.randrange(1, 120)
        rows.append((g, i, pri, tok))
    return rows


def test_token_budget_select_bounded_matches_reference(spark):
    """The bounded two-pass variant must be bit-identical to the
    single-window reference — including ties, NULL priorities, zero-token
    boundary rows, and a skewed group — across bucket counts (n_buckets=1
    degenerates to the reference plan, 256 > distinct priorities)."""
    for seed in (3, 11):
        df = spark.createDataFrame(
            _tbs_rows(seed),
            "source string, doc_id long, quality long, n_tokens long",
        )
        ref = token_budget_select(
            df, "source", "quality", "n_tokens", "doc_id", 2_000
        )
        expect = sorted(map(tuple, ref.collect()))
        for n_buckets in (1, 8, 256):
            got = token_budget_select_bounded(
                df, "source", "quality", "n_tokens", "doc_id", 2_000,
                n_buckets=n_buckets,
            )
            assert sorted(map(tuple, got.select(*ref.columns).collect())) == expect


def test_token_budget_select_bounded_prefilters_before_window(spark):
    """Two-pass shape check: the bounded plan must carry the quantile
    aggregate and the bucket-prefix join BELOW the exact window, and the
    pre-filter must actually shrink the window input (here: a 10-row budget
    prefix out of 400 rows survives to the final window)."""
    df = spark.createDataFrame(
        _tbs_rows(5), "source string, doc_id long, quality long, n_tokens long"
    )
    out = token_budget_select_bounded(
        df, "source", "quality", "n_tokens", "doc_id", 200, n_buckets=32
    )
    plan = out._jdf.queryExecution().optimizedPlan().toString()
    assert "percentile_approx" in plan
    # the exact cum_tokens window sits above the bucket-prefix join
    assert plan.index("Window") < plan.index("Join")


def test_domain_mixture_weights_uniform_target_and_cap(spark):
    # tokens: a=800, b=100, c=100 → shares 0.8/0.1/0.1, uniform target 1/3
    rows = [("a", 800), ("b", 100), ("c", 100)]
    df = spark.createDataFrame(rows, "source string, n_tokens long")
    out = {
        r.source: r
        for r in domain_mixture_weights(df, "source", "n_tokens").collect()
    }
    assert math.isclose(out["a"].token_share, 0.8)
    assert math.isclose(out["a"].weight, (1 / 3) / 0.8)
    assert math.isclose(out["b"].weight, (1 / 3) / 0.1)  # 3.33 < default cap
    # tiny domain hits the cap instead of exploding
    rows = [("a", 10_000), ("b", 10)]
    df = spark.createDataFrame(rows, "source string, n_tokens long")
    out = {
        r.source: r
        for r in domain_mixture_weights(
            df, "source", "n_tokens", weight_cap=5.0
        ).collect()
    }
    assert out["b"].weight == 5.0


def test_domain_mixture_weights_explicit_target(spark):
    rows = [("web", 300), ("code", 100)]
    df = spark.createDataFrame(rows, "source string, n_tokens long")
    out = {
        r.source: r
        for r in domain_mixture_weights(
            df, "source", "n_tokens", target_shares={"web": 0.5, "code": 0.5}
        ).collect()
    }
    assert math.isclose(out["web"].weight, 0.5 / 0.75)
    assert math.isclose(out["code"].weight, 0.5 / 0.25)


def test_source_overlap_counts_and_zero_pair(spark):
    # a: {x, y, z}; b: {y, z, w}; c: {q}  → (a,b) jaccard 2/4,
    # (a,c) and (b,c) must still appear with jaccard 0
    rows = [
        ("a", "x"), ("a", "y"), ("a", "z"), ("a", "z"),  # dup fp collapses
        ("b", "y"), ("b", "z"), ("b", "w"),
        ("c", "q"),
    ]
    df = spark.createDataFrame(rows, "source string, fp string")
    out = {
        (r.group_a, r.group_b): r
        for r in source_overlap(df, "source", "fp").collect()
    }
    assert set(out) == {("a", "b"), ("a", "c"), ("b", "c")}
    ab = out[("a", "b")]
    assert (ab.fp_a, ab.fp_b, ab.fp_common) == (3, 3, 2)
    assert math.isclose(ab.jaccard, 2 / 4)
    assert out[("a", "c")].fp_common == 0
    assert out[("a", "c")].jaccard == 0.0


def _planted_embeddings(spark, n_noise=200, n_dup_pairs=8, dim=16, seed=7):
    rng = random.Random(seed)

    def unit(v):
        n = math.sqrt(sum(x * x for x in v))
        return [x / n for x in v]

    rows, planted = [], []
    vid = 0
    for _ in range(n_noise):
        rows.append((vid, unit([rng.gauss(0, 1) for _ in range(dim)])))
        vid += 1
    for _ in range(n_dup_pairs):
        base = unit([rng.gauss(0, 1) for _ in range(dim)])
        near = unit([x + rng.gauss(0, 0.005) for x in base])
        rows.append((vid, base))
        rows.append((vid + 1, near))
        planted.append((vid, vid + 1))
        vid += 2
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    return df, planted


def test_semantic_dedup_finds_planted_pairs(spark):
    df, planted = _planted_embeddings(spark)
    pairs = semantic_dedup_pairs(
        df, "embedding", "vec_id", n_clusters=8, threshold=0.99
    )
    got = {(r.id_a, r.id_b) for r in pairs.collect()}
    # near-identical vectors land in the same KMeans cluster, so every
    # planted pair must be recalled (cosine ≈ 1 >> 0.99)
    assert set(planted) <= got


def test_semantic_dedup_subset_of_brute_force(spark):
    df, _ = _planted_embeddings(spark)
    blocked = semantic_dedup_pairs(
        df, "embedding", "vec_id", n_clusters=8, threshold=0.9
    )
    exact = embedding_cosine_pairs(
        df, "embedding", "vec_id", threshold=0.9, sign_bits=0
    )
    got = {(r.id_a, r.id_b) for r in blocked.collect()}
    truth = {(r.id_a, r.id_b) for r in exact.collect()}
    # cluster blocking can only LOSE pairs, never invent them
    assert got <= truth


def test_quota_by_quality_bounded_matches_reference(spark):
    from databricks_etl_pipelines_spark.operators.curation import (
        quota_by_quality,
        quota_by_quality_bounded,
    )

    for seed in (2, 9):
        df = spark.createDataFrame(
            _tbs_rows(seed),
            "source string, doc_id long, quality long, n_tokens long",
        )
        ref = quota_by_quality(df, "source", "quality", 40, "doc_id")
        expect = sorted(map(tuple, ref.collect()))
        for n_buckets in (1, 8, 256):
            got = quota_by_quality_bounded(
                df, "source", "quality", 40, "doc_id", n_buckets=n_buckets
            )
            assert sorted(map(tuple, got.select(*ref.columns).collect())) == expect


def test_token_budget_bounded_rejects_non_numeric_priority(spark):
    """The bounded variant's quantile pre-filter needs a numeric priority
    (percentile_approx); a non-numeric orderable priority must fail fast
    with a pointer to the exact single-window form, never silently
    mis-bucket."""
    import pytest as _pytest

    from databricks_etl_pipelines_spark.operators.curation import (
        token_budget_select_bounded,
    )

    df = spark.createDataFrame(
        [("a", 1, "low", 10), ("a", 2, "high", 20)],
        "source string, doc_id long, pri string, n_tokens long",
    )
    with _pytest.raises(TypeError, match="numeric priority"):
        token_budget_select_bounded(
            df, "source", "pri", "n_tokens", "doc_id", 25
        )


def test_mixture_epoch_plan_schedule(spark):
    """Planted two-domain corpus: big domain (800 of 1000 tokens) vs a
    uniform 50% target -> f = 0.625: no full epoch, a hash-chosen subset
    once; small domain f = 2.5: 2 full epochs + a hash-chosen third.
    Epochs per doc form a dense 0..n-1 prefix, group totals match the
    floor/fraction arithmetic, and the plan reproduces exactly."""
    import collections

    from databricks_etl_pipelines_spark.operators.curation import (
        mixture_epoch_plan,
    )

    rows = [(i, "big", 8) for i in range(100)] + [
        (i + 100, "small", 2) for i in range(100)
    ]
    docs = spark.createDataFrame(
        rows, "doc_id long, lang string, n_tokens long"
    )

    def run():
        return mixture_epoch_plan(
            docs, "lang", "n_tokens", "doc_id",
            target_shares={"big": 0.5, "small": 0.5}, seed=42, max_epochs=8,
        ).collect()

    got = run()
    per_doc = collections.defaultdict(list)
    for r in got:
        per_doc[(r.doc_id, r.lang)].append(r.epoch)
    for (_, _), es in per_doc.items():
        assert sorted(es) == list(range(len(es)))
    big = {d for d, g in per_doc if g == "big"}
    small_counts = {d: len(per_doc[(d, "small")]) for d, g in per_doc
                    if g == "small"}
    # big: f = 0.625 -> every included doc exactly once, strict subset
    assert all(len(per_doc[(d, "big")]) == 1 for d in big)
    assert 0 < len(big) < 100
    # small: f = 2.5 -> every doc 2 or 3 epochs, both kinds present
    assert set(small_counts.values()) == {2, 3}
    assert len(small_counts) == 100
    # deterministic replay
    assert sorted(map(tuple, got)) == sorted(map(tuple, run()))


def test_mixture_epoch_plan_max_epochs_cap(spark):
    """A tiny domain under a huge target share is capped at max_epochs."""
    from databricks_etl_pipelines_spark.operators.curation import (
        mixture_epoch_plan,
    )

    rows = [(0, "tiny", 1)] + [(i + 1, "big", 100) for i in range(10)]
    docs = spark.createDataFrame(
        rows, "doc_id long, lang string, n_tokens long"
    )
    plan = mixture_epoch_plan(
        docs, "lang", "n_tokens", "doc_id",
        target_shares={"tiny": 0.5, "big": 0.5}, seed=42, max_epochs=4,
    )
    tiny = plan.filter("lang = 'tiny'").collect()
    assert sorted(r.epoch for r in tiny) == [0, 1, 2, 3]


def test_dsir_weights_separate_target_vocab(spark):
    """Planted DSIR case: target docs draw from vocab A, off-domain docs
    from vocab B. A raw doc written in vocab A must outscore one written
    in vocab B, a mixed doc lands between, and weights are finite for
    buckets never seen in the target (add-one smoothing)."""
    from databricks_etl_pipelines_spark.operators.curation import (
        dsir_importance_weights,
    )

    a = "alpha beta gamma delta epsilon"
    b = "zork quux blarg fnord wibble"
    rows = [
        (0, "tgt", a), (1, "tgt", a), (2, "tgt", a),
        (3, "raw", a),                      # target-like raw doc
        (4, "raw", b),                      # off-domain raw doc
        (5, "raw", a + " " + b),            # mixed
    ]
    df = spark.createDataFrame(rows, "doc_id long, kind string, text string")
    out = {
        r.doc_id: r
        for r in dsir_importance_weights(
            df, "text", "doc_id", F.col("kind") == "tgt", n_buckets=32
        ).collect()
    }
    assert len(out) == 6
    assert all(math.isfinite(r.dsir_weight) for r in out.values())
    # raw additive weight: the pure vocab-A doc beats the pure vocab-B doc
    assert out[3].dsir_weight > out[4].dsir_weight
    # per-token form is the length-comparable ranking: A > mixed > B
    per_tok = {d: r.dsir_weight_per_token for d, r in out.items()}
    assert per_tok[3] > per_tok[5] > per_tok[4]
    # identical texts score identically regardless of target membership
    assert out[0].dsir_weight == out[3].dsir_weight


def _es_python_sample(ids_weights, k, seed):
    """Pure-Python replay of the A-ES deterministic sampler (hashlib md5 +
    Karp-Rabin rolling; shares no code with the operator)."""
    import hashlib

    def bucket(doc_id):
        h = hashlib.md5(f"{doc_id}:{seed}".encode()).hexdigest()
        acc = 0
        for c in h:
            acc = (acc * 257 + ord(c)) % 2147483647
        return acc % 1_000_000

    keyed = [
        (math.log((bucket(i) + 1) / 1_000_001.0) / w, i)
        for i, w in ids_weights
    ]
    keyed.sort(key=lambda t: (-t[0], t[1]))
    return [i for _, i in keyed[:k]]


def test_weighted_sample_matches_python_replay_and_prefers_heavy(spark):
    """Spark selection == the pure-Python deterministic replay for two
    seeds, and across 60 seeds (replayed in Python — same formula) the
    weight-100 item is drawn far more often than any weight-1 item."""
    from databricks_etl_pipelines_spark.operators.curation import (
        weighted_sample_without_replacement,
    )

    ids_weights = [(i, 100 if i == 7 else 1) for i in range(20)]
    rows = [("g", i, w) for i, w in ids_weights]
    df = spark.createDataFrame(rows, "grp string, doc_id long, w int")
    for seed in (42, 7):
        got = sorted(
            r.doc_id
            for r in weighted_sample_without_replacement(
                df, "grp", "w", "doc_id", 5, seed=seed
            ).collect()
        )
        assert got == sorted(_es_python_sample(ids_weights, 5, seed))
        assert len(set(got)) == 5  # without replacement
    hits = sum(
        7 in _es_python_sample(ids_weights, 5, seed) for seed in range(60)
    )
    # P(select | w=100 among 19 w=1, k=5) ~ 1; a fair sampler w/o weights
    # would give ~15/60. Anything >= 45 shows the weight drives selection.
    assert hits >= 45, hits


def test_weighted_sample_rejects_nonpositive_weights(spark):
    """w=0 would null the A-ES key (rows silently sort last) and w<0 would
    invert the preference — both must fail fast with a clear message, not
    silently corrupt the sample."""
    import pytest

    from databricks_etl_pipelines_spark.operators.curation import (
        weighted_sample_without_replacement,
    )

    for bad_w in (0, -3):
        df = spark.createDataFrame(
            [("g", 1, 5), ("g", 2, bad_w)], "grp string, doc_id long, w int"
        )
        with pytest.raises(Exception, match="weights must be > 0"):
            weighted_sample_without_replacement(
                df, "grp", "w", "doc_id", 2
            ).collect()


def test_dsir_score_counts_unseen_bucket_tokens(spark):
    """Scoring a NEW batch against a prebuilt profile: tokens hashing to
    buckets the reference corpus never produced must still be counted
    (densified profile, smoothed unseen ratio) — n_tokens is the true
    token count and the weight stays finite."""
    from databricks_etl_pipelines_spark.operators.curation import (
        dsir_log_ratios,
        dsir_score,
    )

    ref = spark.createDataFrame(
        [(0, "tgt", "alpha beta alpha beta"), (1, "raw", "alpha beta gamma")],
        "doc_id long, kind string, text string",
    )
    ratios = dsir_log_ratios(ref, "text", F.col("kind") == "tgt", n_buckets=512)
    # 512 buckets + 3 ref words -> these 6 novel tokens almost surely hit
    # buckets with zero reference mass
    batch = spark.createDataFrame(
        [(99, "zyx wvu tsr qpo nml kji")], "doc_id long, text string"
    )
    out = dsir_score(batch, ratios, "text", "doc_id", n_buckets=512).collect()
    assert len(out) == 1
    assert out[0].n_tokens == 6
    assert math.isfinite(out[0].dsir_weight)
