"""Hypothesis property tests (SURVEY §5 item 3): PII operators, Jaccard
invariants, and the as-of join vs a brute-force reference implementation.

Spark round-trips are expensive per example, so each property batches the
generated examples into ONE DataFrame and checks all rows in one action.
"""

from __future__ import annotations

import datetime as dt
import hashlib

from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

from databricks_etl_pipelines_spark.functions.privacy import (
    mask_card_number,
    tokenize_pii,
)
from databricks_etl_pipelines_spark.operators.joins import asof_join

TEXT = st.text(
    alphabet=st.characters(blacklist_categories=("Cs",)), min_size=1, max_size=40
)


@settings(max_examples=10, deadline=None)
@given(st.lists(TEXT, min_size=1, max_size=20, unique=True))
def test_tokenize_matches_local_sha256_and_normalizes(spark, values):
    df = spark.createDataFrame([(v,) for v in values], "v string")
    rows = df.select(
        "v",
        tokenize_pii("v").alias("tok"),
        tokenize_pii(F.concat(F.lit("  "), F.upper("v"), F.lit(" "))).alias(
            "tok_noisy"
        ),
    ).collect()
    for r in rows:
        # NB: Spark trim strips ASCII space only (not \r\t\n) — model that
        norm = r.v.strip(" ").lower()
        expected = hashlib.sha256(norm.encode("utf-8")).hexdigest()
        assert r.tok == expected               # engine == reference semantics
        # normalization: upper + padding never changes the token, unless
        # case-folding is non-trivial for this alphabet (e.g. ß, İ)
        if norm == r.v.strip(" ").upper().lower():
            assert r.tok_noisy == r.tok


@settings(max_examples=10, deadline=None)
@given(st.lists(st.text(alphabet="0123456789", min_size=8, max_size=24),
                min_size=1, max_size=20))
def test_mask_always_shows_only_last4(spark, cards):
    df = spark.createDataFrame([(c,) for c in cards], "card string")
    rows = df.select("card", mask_card_number("card").alias("m")).collect()
    for r in rows:
        assert r.m == "****-****-****-" + r.card[-4:]
        # no more than 4 original digits survive
        assert sum(ch.isdigit() for ch in r.m) <= 4


@settings(max_examples=5, deadline=None)
@given(
    st.lists(  # (key, time-offset-seconds, side) events
        st.tuples(
            st.integers(min_value=0, max_value=2),
            st.integers(min_value=0, max_value=1000),
            st.booleans(),
        ),
        min_size=1,
        max_size=25,
    )
)
def test_asof_join_matches_bruteforce(spark, rows):
    base = dt.datetime(2024, 1, 1)
    left = [
        (i, k, base + dt.timedelta(seconds=s))
        for i, (k, s, is_left) in enumerate(rows)
        if is_left
    ]
    right = [
        (i + 1000, k, base + dt.timedelta(seconds=s), float(i))
        for i, (k, s, is_left) in enumerate(rows)
        if not is_left
    ]
    if not left or not right:
        return
    ldf = spark.createDataFrame(left, "lid long, k long, t timestamp")
    rdf = spark.createDataFrame(right, "rid long, k long, t timestamp, v double")
    got = {
        r.lid: r.matched_rid
        for r in asof_join(ldf, rdf, key="k", left_time="t", right_time="t").collect()
    }
    for lid, k, t in left:
        cands = [(rt, rid) for rid, rk, rt, _ in right if rk == k and rt <= t]
        expected = max(cands)[1] if cands else None
        assert got[lid] == expected, (lid, k, t, cands)


WORDS = st.lists(
    st.sampled_from(["alpha", "beta", "gamma", "delta", "x", "yy"]),
    min_size=1, max_size=30,
)


@settings(max_examples=10, deadline=None)
@given(st.lists(WORDS, min_size=1, max_size=12))
def test_passages_partition_the_text(spark, docs):
    """word_passages is a partition of the token stream: re-joining the
    chunks reproduces the text, every chunk but the last has exactly
    `size` words, and none is empty."""
    from databricks_etl_pipelines_spark.functions.textfns import (
        word_passages,
    )

    rows = spark.createDataFrame(
        [(i, " ".join(ws)) for i, ws in enumerate(docs)],
        "doc_id long, text string",
    ).select("doc_id", "text", word_passages("text", 5).alias("p")).collect()
    for r in rows:
        assert " ".join(r.p) == r.text
        assert all(len(c.split(" ")) == 5 for c in r.p[:-1])
        assert 1 <= len(r.p[-1].split(" ")) <= 5


@settings(max_examples=10, deadline=None)
@given(st.lists(WORDS, min_size=2, max_size=12))
def test_repetition_ratios_bounded_and_consistent(spark, docs):
    """Ratios live in [0,1]; a text of one repeated word maximizes all
    repetition signals; all-distinct words minimize them."""
    from databricks_etl_pipelines_spark.plans.queries_llm import (
        text_repetition_signals,
    )

    docs = docs + [["solo"] * 8, ["a1", "b2", "c3", "d4"]]
    path_docs = [(i, " ".join(ws)) for i, ws in enumerate(docs)]
    import tempfile

    with tempfile.TemporaryDirectory() as td:
        spark.createDataFrame(
            path_docs, "doc_id long, text string"
        ).write.mode("overwrite").parquet(f"{td}/documents.parquet")
        got = {
            r.doc_id: r
            for r in text_repetition_signals(spark, td).collect()
        }
    for i, ws in enumerate(docs):
        r = got[i]
        for v in (r.distinct_word_ratio, r.top_word_ratio,
                  r.dup_bigram_ratio):
            assert -1e-9 <= v <= 1 + 1e-9
        assert r.n_words == len(ws)
    solo = got[len(docs) - 2]
    assert solo.distinct_word_ratio == round(1 / 8, 6)
    assert solo.top_word_ratio == 1.0
    assert solo.dup_bigram_ratio == round(1 - 1 / 7, 6)
    uniq = got[len(docs) - 1]
    assert uniq.distinct_word_ratio == 1.0
    assert uniq.dup_bigram_ratio == 0.0


@settings(max_examples=8, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.integers(0, 2),                      # group id
            st.one_of(st.none(), st.integers(0, 5)),  # priority (dup-heavy, NULLs)
            st.integers(0, 30),                     # tokens (zeros included)
        ),
        min_size=1,
        max_size=25,
    ),
    st.integers(1, 120),                            # budget
)
def test_token_budget_bounded_property_matches_reference(spark, rows, budget):
    """For ARBITRARY small inputs (duplicate priorities, NULLs, zero-token
    rows, any budget) the bounded two-pass selection must equal the
    single-window reference exactly — the planted-seed tests sample this
    space, the property sweeps it."""
    from databricks_etl_pipelines_spark.operators.curation import (
        token_budget_select,
        token_budget_select_bounded,
    )

    data = [(f"g{g}", i, p, t) for i, (g, p, t) in enumerate(rows)]
    df = spark.createDataFrame(
        data, "source string, doc_id long, quality long, n_tokens long"
    )
    ref = sorted(
        map(tuple, token_budget_select(
            df, "source", "quality", "n_tokens", "doc_id", budget
        ).collect())
    )
    got = sorted(
        map(tuple, token_budget_select_bounded(
            df, "source", "quality", "n_tokens", "doc_id", budget, n_buckets=4
        ).select("source", "doc_id", "quality", "n_tokens", "cum_tokens")
        .collect())
    )
    assert got == ref


@given(
    st.integers(min_value=1, max_value=13),
    st.integers(min_value=1, max_value=13),
    st.integers(min_value=0, max_value=2**32 - 1),
)
@settings(max_examples=60, deadline=None)
def test_bmp_codec_round_trip_property(h, w, seed):
    """encode(decode) identity for arbitrary 24-bit images — every width
    exercises a different row-stride padding (w*3 mod 4 cycles through
    all four pad lengths)."""
    import numpy as np

    from databricks_etl_pipelines_spark.operators.multimodal import (
        bmp_decode,
        bmp_encode,
    )

    rng = np.random.default_rng(seed)
    rgb = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
    back = bmp_decode(bmp_encode(rgb))
    assert back.shape == rgb.shape
    assert (back == rgb).all()


@settings(max_examples=8, deadline=None)
@given(
    st.lists(st.integers(min_value=0, max_value=50), min_size=1,
             max_size=40),
    st.integers(min_value=1, max_value=16),
    st.integers(min_value=1, max_value=6),
)
def test_pack_concat_chunks_matches_serial_replay(spark, sizes, chunk, nparts):
    """For any token-size sequence, chunk size, and partition count, the
    distributed prefix-scan layout equals a serial Python replay."""
    from databricks_etl_pipelines_spark.operators.packing import (
        pack_concat_chunks,
    )

    docs = spark.createDataFrame(
        list(enumerate(sizes)), "doc_id long, n_tokens long"
    )
    got = {
        r.doc_id: (r.n_tokens, r.tok_start, r.chunk_start, r.chunk_end,
                   r.n_chunks)
        for r in pack_concat_chunks(
            docs, "doc_id", "n_tokens", chunk_tokens=chunk,
            n_partitions=nparts,
        ).collect()
    }
    start = 0
    for d, nt in enumerate(sizes):
        cs = start // chunk
        ce = (start + nt - 1) // chunk if nt else cs
        assert got[d] == (nt, start, cs, ce, (ce - cs + 1) if nt else 0)
        start += nt
    assert len(got) == len(sizes)


TOKS3 = st.lists(st.sampled_from("abc"), min_size=1, max_size=12)


@settings(max_examples=10, deadline=None)
@given(st.lists(TOKS3, min_size=2, max_size=10))
def test_duplicated_span_report_matches_bruteforce(spark, docs):
    """Span report vs a brute-force Python reference on tiny-alphabet
    corpora (dense repeats stress the interval-union coverage and the
    min_docs cross-doc rule, including within-doc-only repeats which must
    NOT count)."""
    from databricks_etl_pipelines_spark.operators.dedup import (
        duplicated_span_report,
    )

    n = 3
    toks = {i: ts for i, ts in enumerate(docs)}
    grams: dict[str, set] = {}
    for i, ts in toks.items():
        for p in range(len(ts) - n + 1):
            grams.setdefault(" ".join(ts[p:p + n]), set()).add(i)
    dup = {g for g, s in grams.items() if len(s) >= 2}
    expect = {}
    for i, ts in toks.items():
        hits = [
            p for p in range(len(ts) - n + 1)
            if " ".join(ts[p:p + n]) in dup
        ]
        covered = set()
        for p in hits:
            covered.update(range(p, p + n))
        expect[i] = (len(ts), len(hits), len(covered))

    df = spark.createDataFrame(
        [(i, " ".join(ts)) for i, ts in toks.items()],
        "doc_id long, text string",
    )
    got = {
        r.doc_id: (r.n_tokens, r.dup_ngrams, r.covered_tokens)
        for r in duplicated_span_report(
            df, "text", "doc_id", n=n, min_docs=2
        ).collect()
    }
    assert got == expect


WORDS_AB = st.lists(
    st.text(alphabet="ab", min_size=1, max_size=8), min_size=1, max_size=12
)


@settings(max_examples=300, deadline=None)
@given(
    st.lists(
        st.tuples(
            # includes NBSP — a non-ASCII char Spark's \s+ keeps as a
            # symbol (the round-5 review bug class) — and enough alphabet
            # for chained merges
            st.text(alphabet="ab\xa0c", min_size=1, max_size=10),
            st.integers(1, 9),
        ),
        min_size=1,
        max_size=15,
    )
)
def test_bpe_local_loop_and_encode_match_reference(entries):
    """PURE-LOCAL property (no Spark, 300 examples): the incremental
    driver merge loop (inverted index + lazy heap) and the rank-ordered
    per-word encoder must both equal the naive list-walking reference on
    arbitrary weighted dictionaries — the machinery where the freq-delta
    and whitespace-split bugs hid."""
    from databricks_etl_pipelines_spark.operators.bpe import (
        _encode_word_local,
        _local_merge_loop,
    )
    from tests.test_operators import _reference_bpe

    freqs: dict[str, int] = {}
    for w, f in entries:
        freqs[w] = freqs.get(w, 0) + f
    ref_merges, ref_enc = _reference_bpe(freqs, 8)
    got = _local_merge_loop(sorted(freqs.items()), 8)
    assert got == ref_merges
    ranks = {(l, r): k for k, (l, r, _) in enumerate(got)}
    for w in freqs:
        assert _encode_word_local(w, ranks) == len(ref_enc[w]), w


@settings(max_examples=5, deadline=None)
@given(WORDS_AB)
def test_bpe_trainer_matches_reference_on_repetitive_alphabet(spark, words):
    """Distributed BPE == list-walking reference on random {a,b}-alphabet
    corpora — the worst case for the double-space replace trick (runs of
    identical symbols force maximal overlapping-merge decisions, e.g.
    'aaaa' + merge(a,a) must give [aa, aa] left-to-right)."""
    from tests.test_operators import _reference_bpe
    from databricks_etl_pipelines_spark.operators.bpe import train_bpe

    df = spark.createDataFrame(
        [(i, w) for i, w in enumerate(words)], "doc_id long, text string"
    )
    freqs: dict[str, int] = {}
    for w in words:
        freqs[w] = freqs.get(w, 0) + 1
    ref, _ = _reference_bpe(freqs, 6)
    got = train_bpe(df, "text", num_merges=6, max_words=1000)
    assert got == ref


@settings(max_examples=6, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.integers(1, 4),            # key
            st.sampled_from(["A", "B", None]),  # attr (incl. NULL runs)
            st.integers(1, 6),            # day
        ),
        min_size=1,
        max_size=16,
    ),
    st.randoms(use_true_random=False),
)
def test_scd2_incremental_equals_batch_any_split(spark, tmp_path_factory, obs, rng):
    """Property: for ANY observation feed and ANY batch partition/order,
    folding batches through scd2_apply yields exactly the one-shot
    scd2_history — the order-insensitivity contract, randomized."""
    from datetime import datetime

    from databricks_etl_pipelines_spark.operators.scd import (
        scd2_apply,
        scd2_history,
    )
    from databricks_etl_pipelines_spark.sources.managed_table import (
        ManagedTable,
    )

    rows = [
        (k, a, datetime(2024, 1, d), i)
        for i, (k, a, d) in enumerate(obs)
    ]
    schema = "k int, attr string, ts timestamp, obs_id int"
    full = spark.createDataFrame(rows, schema)

    shuffled = list(rows)
    rng.shuffle(shuffled)
    n_batches = rng.randint(1, min(3, len(shuffled)))
    batches = [shuffled[i::n_batches] for i in range(n_batches)]

    base = tmp_path_factory.mktemp("scd2prop")
    log = ManagedTable(str(base / "log"))
    dim = ManagedTable(str(base / "dim"))
    for b in batches:
        if b:
            scd2_apply(
                spark, log, dim, spark.createDataFrame(b, schema),
                keys=["k"], attrs=["attr"], ts_col="ts",
                tiebreak=["obs_id"],
            )
    expected = scd2_history(
        full, ["k"], ["attr"], "ts", ["obs_id"], with_counts=False
    )
    got = dim.read(spark).select(*expected.columns)
    assert got.exceptAll(expected).isEmpty()
    assert expected.exceptAll(got).isEmpty()


@settings(max_examples=6, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.integers(1, 4),           # key
            st.integers(1, 6),           # day
            st.booleans(),               # delete?
            st.sampled_from(["a", "b"]),
        ),
        min_size=1,
        max_size=14,
    ),
    st.randoms(use_true_random=False),
)
def test_cdc_incremental_equals_latest_any_split(spark, tmp_path_factory, chg, rng):
    """Property: for ANY change log and ANY batch partition/order, the
    cdc_apply fold's live rows equal the latest-per-(ts, lsn) non-delete
    state computed directly — tombstone persistence included."""
    from datetime import datetime

    from databricks_etl_pipelines_spark.operators.scd import (
        cdc_apply,
        cdc_read_current,
    )
    from databricks_etl_pipelines_spark.sources.managed_table import (
        ManagedTable,
    )

    rows = [
        (k, datetime(2024, 1, d), i, "D" if dele else "U", v)
        for i, (k, d, dele, v) in enumerate(chg)
    ]
    schema = "k int, ts timestamp, lsn int, op string, v string"

    shuffled = list(rows)
    rng.shuffle(shuffled)
    n_batches = rng.randint(1, min(3, len(shuffled)))
    batches = [shuffled[i::n_batches] for i in range(n_batches)]

    dim = ManagedTable(str(tmp_path_factory.mktemp("cdcprop") / "dim"))
    for b in batches:
        if b:
            cdc_apply(
                spark, dim, spark.createDataFrame(b, schema),
                ["k"], "ts", "lsn", "op",
            )

    expected = {}
    for k, ts, lsn, op, v in rows:
        cur = expected.get(k)
        if cur is None or (ts, lsn) > (cur[0], cur[1]):
            expected[k] = (ts, lsn, op, v)
    live = {
        k: (ts, lsn, v)
        for k, (ts, lsn, op, v) in expected.items()
        if op != "D"
    }
    got = {
        r.k: (r.ts, r.lsn, r.v)
        for r in cdc_read_current(dim, spark).collect()
    }
    assert got == live


# -- histogram-winsorize algebra vs the DuckDB oracle on adversarial groups ----

# Values are multiples of 0.25 in [-50, 50]: exactly representable in
# binary floating point, so every sum (sw, sw2) is EXACT regardless of
# Spark's partition-dependent addition order — the cross-engine compare
# can demand bit-equality instead of tolerances, and any mismatch is an
# algebra bug, never float-association noise.
_QUARTERS = st.integers(min_value=-200, max_value=200).map(lambda k: k / 4.0)
_GROUP_VALUES = st.one_of(
    st.lists(_QUARTERS, min_size=1, max_size=20),          # general
    st.builds(lambda v, n: [v] * n, _QUARTERS,
              st.integers(min_value=1, max_value=12)),     # constant group
    st.lists(_QUARTERS, min_size=1, max_size=1),           # n = 1
    st.lists(st.integers(min_value=0, max_value=3)
             .map(lambda k: k / 4.0),
             min_size=2, max_size=15),                     # single bucket
)


@settings(max_examples=12, deadline=None)
@given(
    st.dictionaries(
        st.sampled_from(["a", "b", "c"]), _GROUP_VALUES,
        min_size=1, max_size=3,
    )
)
def test_histogram_winsorize_matches_oracle_on_adversarial_groups(
    spark, groups
):
    """VERDICT r5 #7: the histogram-winsorize algebra must agree with the
    DuckDB oracle row-for-row on degenerate-but-legal groups — n=1 and
    constant groups pin NULL-sigma parity (ANSI-safe nullif on BOTH
    engines, never a crash or a 0-division), negative values pin the
    floor-bucket edge snapping below zero, single-bucket groups pin the
    lo==hi-1 collapse, and the clipped-moment identity holds exactly
    because bounds snap to bucket edges."""
    import duckdb
    import pandas as pd

    from databricks_etl_pipelines_spark.plans.queries_aggregates import (
        _WINSORIZE_1SCAN_ORACLE,
        histogram_winsorize_zscore,
    )

    rows = [
        (i, g, v)
        for i, (g, v) in enumerate(
            (g, v) for g, vs in sorted(groups.items()) for v in vs
        )
    ]
    ev = spark.createDataFrame(
        rows, "event_id long, event_type string, value double"
    )
    got = {
        r.event_id: (r.value_winsorized, r.value_z)
        for r in histogram_winsorize_zscore(ev).collect()
    }

    con = duckdb.connect()
    con.register(
        "events",
        pd.DataFrame(rows, columns=["event_id", "event_type", "value"]),
    )
    want = {
        int(eid): (vw, vz)
        for eid, _etype, _v, vw, vz in con.execute(
            _WINSORIZE_1SCAN_ORACLE
        ).fetchall()
    }
    con.close()

    assert set(got) == set(want)
    for eid in got:
        gw, gz = got[eid]
        ww, wz = want[eid]
        assert gw == ww, (eid, gw, ww)
        # NULL-sigma parity is exact; numeric z is bit-equal (see above)
        assert (gz is None) == (wz is None), (eid, gz, wz)
        if gz is not None:
            assert gz == wz, (eid, gz, wz)

    # clipped-moment identity: the winsorized column IS clip(value, lo, hi)
    # with lo/hi on bucket edges — so per group, min/max of the output are
    # attained and no value escapes the band
    for g, vs in groups.items():
        ids = [i for i, (gg, _v) in enumerate(
            (g2, v2) for g2, vs2 in sorted(groups.items()) for v2 in vs2
        ) if gg == g]
        outs = [got[i][0] for i in ids]
        assert min(outs) >= min(vs) - 1 and max(outs) <= max(vs) + 1


@given(
    st.lists(
        st.text(alphabet="abc", min_size=0, max_size=6),
        min_size=1,
        max_size=8,
    ),
    st.integers(min_value=1, max_value=4),
)
@settings(max_examples=60, deadline=None)
def test_unigram_viterbi_matches_bruteforce_enumeration(words, max_piece):
    """For every word (≤ 6 chars, so all segmentations enumerate), the
    Viterbi split must achieve the MAXIMUM total score over every legal
    segmentation, and among score ties pick the one the documented rule
    picks (larger split points, compared right to left)."""
    from databricks_etl_pipelines_spark.operators.unigram import _viterbi

    # deterministic fake scores over the words' own substring inventory
    smap: dict[str, int] = {}
    for w in words:
        for i in range(len(w)):
            for j in range(i + 1, min(i + max_piece, len(w)) + 1):
                piece = w[i:j]
                smap[piece] = -(
                    (int(hashlib.md5(piece.encode()).hexdigest(), 16) % 997)
                    + 1
                )

    def all_segmentations(w):
        n = len(w)
        if n == 0:
            yield []
            return
        for bits in range(1 << max(0, n - 1)):
            cuts = [0] + [
                i + 1 for i in range(n - 1) if bits & (1 << i)
            ] + [n]
            parts = [w[a:b] for a, b in zip(cuts, cuts[1:])]
            if all(len(p) <= max_piece and p in smap for p in parts):
                yield parts

    for w in words:
        got_pieces, got_score = _viterbi(w, smap, max_piece)
        assert "".join(got_pieces) == w
        assert got_score == sum(smap[p] for p in got_pieces)
        best = None
        for parts in all_segmentations(w):
            score = sum(smap[p] for p in parts)
            # the DP's tie rule: at each position prefer the larger
            # split point == lexicographically LARGEST reversed cut
            # vector among max-score segmentations
            cuts = []
            pos = len(w)
            for p in reversed(parts):
                pos -= len(p)
                cuts.append(pos)
            key = (score, tuple(cuts))
            if best is None or key > best[0]:
                best = (key, parts)
        assert best is not None, f"unsegmentable word {w!r}"
        assert got_score == best[0][0], (w, got_pieces, best[1])
        assert got_pieces == best[1], (w, got_pieces, best[1])


def _kr_md5_bucket(s: str) -> int:
    """The cross-engine md5 rolling hash (functions/textfns.py::
    fingerprint_rolling over md5 hex), reimplemented independently."""
    acc = 0
    for ch in hashlib.md5(s.encode()).hexdigest():
        acc = (acc * 257 + ord(ch)) % 2147483647
    return acc


@settings(max_examples=8, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.integers(0, 3),        # group id
            st.integers(1, 40),       # tokens
        ),
        min_size=2,
        max_size=30,
    )
)
def test_temperature_epochs_matches_pure_python_replay(spark, rows):
    """Cross-implementation pin for the alpha=0.5 temperature schedule:
    a pure-Python replay of the WHOLE rule (sqrt weights, group-ordered
    normalizer fold, pinned op order, md5 hash fraction, cap) must equal
    the Spark operator exactly on arbitrary small corpora."""
    import math

    from databricks_etl_pipelines_spark.operators.curation import (
        temperature_epoch_plan,
    )

    data = [(i, f"g{g}", t) for i, (g, t) in enumerate(rows)]
    df = spark.createDataFrame(data, "doc_id long, lang string, n_tokens long")
    got = sorted(
        (r.doc_id, r.epoch)
        for r in temperature_epoch_plan(
            df, "lang", "n_tokens", "doc_id", seed=42, max_epochs=8
        ).collect()
    )
    # local replay with the exact op orders
    gtok: dict[str, int] = {}
    for _, g, t in data:
        gtok[g] = gtok.get(g, 0) + t
    total = sum(gtok.values())
    w = 0.0
    for g in sorted(gtok):
        w = w + math.sqrt(float(gtok[g]))
    plan = {}
    for g, gt in gtok.items():
        f = ((math.sqrt(float(gt)) / w) * float(total)) / float(gt)
        plan[g] = (math.floor(f), math.floor((f - math.floor(f)) * 1_000_000))
    expected = []
    for i, g, t in data:
        full, th = plan[g]
        bucket = _kr_md5_bucket(f"{i}:42") % 1_000_000
        n = min(full + (1 if bucket < th else 0), 8)
        expected.extend((i, e) for e in range(n))
    assert got == sorted(expected)


@settings(max_examples=8, deadline=None)
@given(st.lists(TOKS3, min_size=2, max_size=8))
def test_containment_pairs_match_bruteforce(spark, docs):
    """Asymmetric containment join vs a brute-force Python reference on
    tiny-alphabet corpora (dense shingle collisions stress the prefix
    filter's losslessness, the length-tie orientation rule, and the
    single-shingle short-doc path)."""
    from databricks_etl_pipelines_spark.operators.dedup import (
        containment_pairs,
    )

    t = 0.8

    def shingles(ts):
        if len(ts) >= 3:
            return {" ".join(ts[p:p + 3]) for p in range(len(ts) - 2)}
        return {" ".join(ts)}

    sets = {i: shingles(ts) for i, ts in enumerate(docs)}
    expect = {}
    import math

    for a, sa in sets.items():
        for b, sb in sets.items():
            if not (len(sa) < len(sb) or (len(sa) == len(sb) and a < b)):
                continue
            inter = len(sa & sb)
            if inter >= math.ceil(t * len(sa)):
                expect[(a, b)] = inter / len(sa)

    df = spark.createDataFrame(
        [(i, " ".join(ts)) for i, ts in enumerate(docs)],
        "doc_id long, text string",
    )
    got = {
        (r.contained_id, r.container_id): r.containment
        for r in containment_pairs(
            df, "text", "doc_id", threshold=t, shingle_k=3
        ).collect()
    }
    assert got == expect


@settings(max_examples=8, deadline=None)
@given(st.lists(TOKS3, min_size=2, max_size=8))
def test_jaccard_pairs_match_bruteforce(spark, docs):
    """Symmetric PPJoin vs a brute-force Python reference on
    tiny-alphabet corpora — pins losslessness of the r16 GROUPED
    count+position prefix bound (overlap ≤ c + min(|a|−pa, |b|−pb)
    over ALL shared prefix hits), which replaced the per-occurrence
    1 + min(...) filter: dense shingle collisions make many pairs share
    several prefix elements, exactly where the two bounds differ."""
    from databricks_etl_pipelines_spark.operators.dedup import (
        ngram_jaccard_pairs,
    )

    t = 0.5

    def shingles(ts):
        if len(ts) >= 3:
            return {" ".join(ts[p:p + 3]) for p in range(len(ts) - 2)}
        return {" ".join(ts)}

    sets = {i: shingles(ts) for i, ts in enumerate(docs)}
    expect = {}
    for a in sets:
        for b in sets:
            if a >= b:
                continue
            inter = len(sets[a] & sets[b])
            union = len(sets[a]) + len(sets[b]) - inter
            if inter / union >= t:
                expect[(a, b)] = inter / union

    df = spark.createDataFrame(
        [(i, " ".join(ts)) for i, ts in enumerate(docs)],
        "doc_id long, text string",
    )
    got = {
        (r.id_a, r.id_b): r.jaccard
        for r in ngram_jaccard_pairs(
            df, "text", "doc_id", threshold=t, shingle_k=3
        ).collect()
    }
    assert got == expect


_WQ_VALS = (1.0, 999.5, 1000.0, 1500.25, 2999.75, 5000.0, 99999.0)


@settings(max_examples=8, deadline=None)
@given(
    st.lists(
        st.tuples(st.sampled_from(_WQ_VALS), st.integers(1, 7)),
        min_size=1,
        max_size=12,
    )
)
def test_weighted_quantiles_any_multiset_matches_brute_force(spark, pairs):
    """agg_weighted_quantiles vs the definitional brute force on ANY
    weighted multiset (values straddling several histogram buckets,
    duplicate values allowed): for each p the lower weighted quantile
    is the expanded multiset's element at index ceil(p·W/100) − 1.
    Exercises arbitrary crossings — first/last bucket, repeated-value
    weight pooling, single-row groups — beyond the planted cases."""
    import math
    import shutil
    import tempfile

    from databricks_etl_pipelines_spark.catalog import QUERIES, load_all

    load_all()
    d = tempfile.mkdtemp(prefix="wq_prop_")
    try:
        rows = [
            (i, "A", v, float(w)) for i, (v, w) in enumerate(pairs)
        ]
        spark.createDataFrame(
            rows,
            "l_orderkey long, l_returnflag string,"
            " l_extendedprice double, l_quantity double",
        ).coalesce(1).write.parquet(f"{d}/lineitem.parquet")
        r = QUERIES["agg_weighted_quantiles"](spark, d).collect()
        assert len(r) == 1
        r = r[0]
        expanded = sorted(v for v, w in pairs for _ in range(w))
        W = len(expanded)
        assert r.total_weight == W
        for p, gotv in ((10, r.p10), (50, r.p50), (90, r.p90)):
            assert gotv == expanded[math.ceil(p * W / 100) - 1], (
                p, pairs,
            )
    finally:
        shutil.rmtree(d, ignore_errors=True)


_TM_VALS = (1.0, 999.5, 1000.0, 1500.25, 2999.75, 5000.0, 99999.0)


@settings(max_examples=8, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.sampled_from(_TM_VALS), st.integers(min_value=1, max_value=9)
        ),
        min_size=1,
        max_size=25,
    )
)
def test_weighted_trimmed_mean_any_multiset_matches_brute_force(
    spark, pairs
):
    """agg_weighted_trimmed_mean vs the definitional brute force
    (expand each (value, weight) to weight unit copies, sort, drop
    W div 10 units from each end, average the rest) on ANY weighted
    multiset: random tie/partial-weight patterns at the cuts, arbitrary
    bucket crossings, total weights from 1 (lo = 0, plain weighted
    mean) to 225."""
    import shutil
    import tempfile

    from databricks_etl_pipelines_spark.catalog import QUERIES, load_all

    load_all()
    d = tempfile.mkdtemp(prefix="wtm_prop_")
    try:
        rows = [
            (i, "A", v, float(w)) for i, (v, w) in enumerate(pairs)
        ]
        spark.createDataFrame(
            rows,
            "l_orderkey long, l_returnflag string,"
            " l_extendedprice double, l_quantity double",
        ).coalesce(1).write.parquet(f"{d}/lineitem.parquet")
        r = QUERIES["agg_weighted_trimmed_mean"](spark, d).collect()
        assert len(r) == 1
        r = r[0]
        expanded = sorted(
            int(v * 100 + 0.5) for v, w in pairs for _ in range(w)
        )
        W = len(expanded)
        lo = W // 10
        kept = expanded[lo: W - lo]
        assert r.total_weight == W and r.kept_weight == len(kept)
        assert r.weighted_trimmed_mean == float(sum(kept)) / 100.0 / len(
            kept
        ), pairs
    finally:
        shutil.rmtree(d, ignore_errors=True)


@settings(max_examples=8, deadline=None)
@given(
    st.lists(
        st.sampled_from(_TM_VALS),
        min_size=1,
        max_size=40,
    )
)
def test_trimmed_mean_any_multiset_matches_brute_force(spark, vals):
    """agg_trimmed_mean_exact vs the definitional brute force (sort,
    drop n div 10 from each end, average the rest) on ANY value
    multiset: random tie patterns at the cuts, arbitrary bucket
    crossings, group sizes from 1 (lo = 0, plain mean) to 40 (lo = 4
    spanning repeated values)."""
    import shutil
    import tempfile

    from databricks_etl_pipelines_spark.catalog import QUERIES, load_all

    load_all()
    d = tempfile.mkdtemp(prefix="tm_prop_")
    try:
        rows = [(i, "A", v, 1.0) for i, v in enumerate(vals)]
        spark.createDataFrame(
            rows,
            "l_orderkey long, l_returnflag string,"
            " l_extendedprice double, l_quantity double",
        ).coalesce(1).write.parquet(f"{d}/lineitem.parquet")
        r = QUERIES["agg_trimmed_mean_exact"](spark, d).collect()
        assert len(r) == 1
        r = r[0]
        cents = sorted(int(v * 100 + 0.5) for v in vals)
        n = len(cents)
        lo = n // 10
        kept = cents[lo: n - lo]
        assert r.n_lines == n and r.kept_lines == len(kept)
        assert r.trimmed_mean == float(sum(kept)) / 100.0 / len(kept), (
            vals,
        )
    finally:
        shutil.rmtree(d, ignore_errors=True)


@settings(max_examples=8, deadline=None)
@given(
    st.lists(
        st.sampled_from(_TM_VALS),
        min_size=1,
        max_size=30,
    )
)
def test_mad_robust_z_any_multiset_matches_brute_force(spark, vals):
    """agg_mad_robust_z vs the definitional brute force (lower median,
    lower median of absolute deviations, exact 10000·d > 44478·mad
    threshold) on ANY value multiset — random tie patterns around both
    chained medians, constant groups (MAD = 0), single rows."""
    import shutil
    import statistics
    import tempfile

    from databricks_etl_pipelines_spark.catalog import QUERIES, load_all

    load_all()
    d = tempfile.mkdtemp(prefix="mad_prop_")
    try:
        rows = [(i, "A", v, 1.0) for i, v in enumerate(vals)]
        spark.createDataFrame(
            rows,
            "l_orderkey long, l_returnflag string,"
            " l_extendedprice double, l_quantity double",
        ).coalesce(1).write.parquet(f"{d}/lineitem.parquet")
        r = QUERIES["agg_mad_robust_z"](spark, d).collect()
        assert len(r) == 1
        r = r[0]
        cents = sorted(int(v * 100 + 0.5) for v in vals)
        med = statistics.median_low(cents)
        mad = statistics.median_low(sorted(abs(c - med) for c in cents))
        outl = sum(
            1 for c in cents if 10000 * abs(c - med) > 44478 * mad
        )
        assert (r.median_cents, r.mad_cents, r.n_outliers) == (
            med, mad, outl,
        ), vals
    finally:
        shutil.rmtree(d, ignore_errors=True)


_NOV_WORDS = ("a", "b", "c", "dd", "ee")


@settings(max_examples=6, deadline=None)
@given(
    st.lists(
        st.lists(st.sampled_from(_NOV_WORDS), min_size=1, max_size=6),
        min_size=1,
        max_size=8,
    )
)
def test_ngram_novelty_any_corpus_matches_brute_force(spark, docs):
    """text_ngram_novelty vs a Python replay of the exact shingle
    semantics (whitespace tokens, 3-gram space-joined shingles with the
    whole-text fallback under 3 tokens, per-doc DISTINCT, first-seen =
    min doc_id) on ANY tiny corpus — random overlap patterns, repeated
    docs, sub-k docs."""
    import shutil
    import tempfile

    from databricks_etl_pipelines_spark.catalog import QUERIES, load_all

    load_all()
    texts = [" ".join(ws) for ws in docs]
    d = tempfile.mkdtemp(prefix="nov_prop_")
    try:
        spark.createDataFrame(
            list(enumerate(texts)), "doc_id long, text string"
        ).coalesce(1).write.parquet(f"{d}/documents.parquet")
        got = {
            r.doc_id: (r.n_shingles, r.novel_shingles, r.novelty_ratio)
            for r in QUERIES["text_ngram_novelty"](spark, d).collect()
        }

        def shingles(ws):
            if len(ws) >= 3:
                return {
                    " ".join(ws[i : i + 3]) for i in range(len(ws) - 2)
                }
            return {" ".join(ws)}

        first = {}
        for i, ws in enumerate(docs):
            for sh in shingles(ws):
                first.setdefault(sh, i)
        for i, ws in enumerate(docs):
            ss = shingles(ws)
            novel = sum(1 for sh in ss if first[sh] == i)
            assert got[i] == (
                len(ss), novel, float(novel) / len(ss),
            ), (i, texts)
    finally:
        shutil.rmtree(d, ignore_errors=True)


@settings(max_examples=6, deadline=None)
@given(
    st.lists(
        st.sampled_from((0.0, 1.0, 2.5, 10.0, -3.0, 100.0)),
        min_size=1,
        max_size=10,
    )
)
def test_holt_linear_any_series_matches_fold(spark, xs):
    """window_holt_linear vs the raw Python fold on ANY series —
    identical float op order (two-point init, the duplicated l' 
    subexpression inside the trend step), so equality is exact."""
    import datetime as dt
    import shutil
    import tempfile

    from databricks_etl_pipelines_spark.catalog import QUERIES, load_all

    load_all()
    d = tempfile.mkdtemp(prefix="holt_prop_")
    try:
        rows = [
            (i, dt.datetime(2024, 1, 1, 0, 0, i), 1, "e", v, "{}")
            for i, v in enumerate(xs)
        ]
        spark.createDataFrame(
            rows,
            "event_id long, ts timestamp, user_id long,"
            " event_type string, value double, props string",
        ).coalesce(1).write.parquet(f"{d}/events.parquet")
        r = QUERIES["window_holt_linear"](spark, d).collect()
        assert len(r) == 1
        r = r[0]
        if len(xs) == 1:
            lvl, tr = xs[0], 0.0
        else:
            lvl, tr = xs[1], xs[1] - xs[0]
            for x in xs[2:]:
                lnew = (x + lvl + tr) / 2.0
                tr = ((x + lvl + tr) / 2.0 - lvl + 3.0 * tr) / 4.0
                lvl = lnew
        def sr(x):  # stable_round: floor-half-up at 1e-6, both engines
            import math

            return math.floor(x * 1000000 + 0.5) / 1000000

        assert (r.level, r.trend, r.forecast_1) == (
            sr(lvl), sr(tr), sr(lvl + tr),
        ), xs
    finally:
        shutil.rmtree(d, ignore_errors=True)


@settings(max_examples=6, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.sampled_from((0.0, 1.0, 2.5, 10.0, -3.0, 100.0)),
            st.integers(min_value=0, max_value=23),
        ),
        min_size=1,
        max_size=12,
    )
)
def test_holt_winters_any_series_matches_fold(spark, obs):
    """window_holt_winters vs the raw Python fold on ANY (value, hour)
    series — identical float op order (uniform init, the duplicated l'
    subexpression inside the trend and seasonal steps, 24 hour slots),
    so equality is exact; random hour collisions exercise slot reuse."""
    import datetime as dt
    import math
    import shutil
    import tempfile

    from databricks_etl_pipelines_spark.catalog import QUERIES, load_all

    load_all()
    d = tempfile.mkdtemp(prefix="hw_prop_")
    try:
        rows = [
            # day index i keeps (ts, event_id) strictly increasing
            # while the hour is hypothesis-chosen
            (i, dt.datetime(2024, 1, 1 + i, h, 0, 0), 1, "e", v, "{}")
            for i, (v, h) in enumerate(obs)
        ]
        spark.createDataFrame(
            rows,
            "event_id long, ts timestamp, user_id long,"
            " event_type string, value double, props string",
        ).coalesce(1).write.parquet(f"{d}/events.parquet")
        r = QUERIES["window_holt_winters"](spark, d).collect()
        assert len(r) == 1
        r = r[0]
        lvl, b = obs[0][0], 0.0
        s = [0.0] * 24
        for v, h in obs[1:]:
            sh = s[h]
            lnew = (v - sh + lvl + b) / 2.0
            bnew = ((v - sh + lvl + b) / 2.0 - lvl + 3.0 * b) / 4.0
            snew = (v - (v - sh + lvl + b) / 2.0 + sh) / 2.0
            lvl, b, s[h] = lnew, bnew, snew

        def sr(x):  # stable_round: floor-half-up at 1e-6, both engines
            return math.floor(x * 1000000 + 0.5) / 1000000

        assert (r.level, r.trend, r.seasonal_min, r.seasonal_max) == (
            sr(lvl), sr(b), sr(min(s)), sr(max(s)),
        ), obs
    finally:
        shutil.rmtree(d, ignore_errors=True)


_DS_VALS = (0.5, 1.0, 2.25, 2.5, 7.75, 10.0, 42.0)


@settings(max_examples=8, deadline=None)
@given(
    st.lists(st.sampled_from(_DS_VALS), min_size=1, max_size=20),
    st.lists(st.sampled_from(_DS_VALS), min_size=1, max_size=20),
)
def test_ks_and_mwu_any_cohorts_match_brute_force(spark, a, b):
    """diag_ks_two_sample and diag_mannwhitney_u vs their definitional
    brute forces (all-values sup gap with smallest-location tie rule;
    pairwise 2U = 2·#{a>b} + #ties) on ANY pair of cohorts drawn from a
    tie-heavy value lattice — random tie patterns at every cumulative
    crossing, cohort sizes 1..20."""
    import datetime as dt
    import shutil
    import tempfile

    from databricks_etl_pipelines_spark.catalog import QUERIES, load_all

    load_all()
    d = tempfile.mkdtemp(prefix="ks_prop_")
    try:
        rows = [
            (
                i,
                dt.datetime(2024, 1, 10 if early else 20, 12, 0, 0),
                i,
                "t",
                float(v),
                "{}",
            )
            for i, (v, early) in enumerate(
                [(v, True) for v in a] + [(v, False) for v in b]
            )
        ]
        spark.createDataFrame(
            rows,
            "event_id long, ts timestamp, user_id long,"
            " event_type string, value double, props string",
        ).coalesce(1).write.parquet(f"{d}/events.parquet")
        ac = [int(v * 100 + 0.5) for v in a]
        bc = [int(v * 100 + 0.5) for v in b]
        na, nb = len(ac), len(bc)
        best, at = -1, None
        for v in sorted(set(ac) | set(bc)):
            dn = abs(
                sum(1 for x in ac if x <= v) * nb
                - sum(1 for x in bc if x <= v) * na
            )
            if dn > best:
                best, at = dn, v
        ks = QUERIES["diag_ks_two_sample"](spark, d).collect()
        assert len(ks) == 1
        assert (ks[0].n_early, ks[0].n_late) == (na, nb)
        assert ks[0].ks_num == best and ks[0].ks_at_cents == at, (a, b)
        u2 = 2 * sum(1 for x in ac for y in bc if x > y) + sum(
            1 for x in ac for y in bc if x == y
        )
        mw = QUERIES["diag_mannwhitney_u"](spark, d).collect()
        assert len(mw) == 1
        assert mw[0].u2_early == u2, (a, b)
        assert mw[0].auc_early == float(u2) / (2.0 * float(na) * float(nb))
    finally:
        shutil.rmtree(d, ignore_errors=True)
