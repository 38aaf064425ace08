"""Distributed BPE tokenizer training + corpus encoding.

Byte-Pair Encoding as introduced for NMT subword units (Sennrich, Haddow,
Birch, "Neural Machine Translation of Rare Words with Subword Units", ACL
2016): repeatedly merge the most frequent adjacent symbol pair, starting
from characters. This is the "train the tokenizer on the corpus" step of a
pretraining data pipeline — upstream of ``text_vocab_encode`` /
``curation_pack_sequences``.

Spark-first decomposition (the same split real tokenizer trainers use):

  * the CORPUS-sized work — word frequency counting — is one distributed
    hash aggregate; a deterministic top-``max_words`` cap (count desc, word
    asc) bounds everything downstream. At 100 TB the word-frequency table
    is ~vocabulary-sized (10⁷-10⁸ rows), still a DataFrame, never the
    corpus.
  * each merge step is a DICTIONARY-sized job: count adjacent symbol pairs
    weighted by word frequency (one hash aggregate over the dictionary),
    take the argmax (deterministic tie-break: count desc, then pair
    lexicographic), apply the merge. ``num_merges`` steps = ``num_merges``
    small Spark jobs; only the single winning pair ever reaches the driver
    per step — the same bounded-model-fit stance as the PQ codebook
    (operators/similarity.py).
  * ENCODING rejoins the merged dictionary to the corpus: apply merges
    once per DISTINCT word, then a dictionary join back to occurrences —
    dictionary-encoding, not per-occurrence re-derivation.

Merge application uses a cross-engine string trick instead of a per-row
UDF: a symbol sequence is serialized as every symbol wrapped in single
spaces (``' a  b  c '`` — two spaces BETWEEN symbols, one at each end), so
applying merge (l, r) is the plain (non-regex) left-to-right replace of
``' l  r '`` with ``' lr '``. Non-overlapping left-to-right replacement is
exactly BPE's application order (``a a a`` + merge(a,a) → ``aa a``), the
double-space framing keeps one separator on each side of every remaining
boundary, and both Spark (``F.replace``) and ANSI SQL (``replace``)
execute it identically — which is what makes the whole trainer replayable
in a DuckDB oracle with the merge loop unrolled.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def word_frequencies(
    df: DataFrame, text_col: str, max_words: int = 10_000
) -> DataFrame:
    """Distributed word counts, capped to the top ``max_words`` by
    (count desc, word asc). ``orderBy().limit()`` compiles to
    TakeOrderedAndProject — per-partition top-k merged on the driver — so
    the cap never funnels the full vocabulary (which at corpus scale can
    be 1e8+ distinct words) through a single-partition global window; the
    total order on (freq desc, word asc) keeps the selected set identical
    to a row_number cut."""
    freq = (
        df.select(
            F.explode(F.split(F.trim(F.col(text_col)), r"\s+")).alias("w")
        )
        .groupBy("w")
        .agg(F.count("*").alias("freq"))
    )
    return freq.orderBy(F.desc("freq"), F.asc("w")).limit(max_words)


def wrap_symbols(word: F.Column) -> F.Column:
    """Initial character-level symbol string: ``' a  b  c '``."""
    chars = F.regexp_extract_all(word, F.lit("."), 0)
    return F.concat(F.lit(" "), F.array_join(chars, "  "), F.lit(" "))


def _symbols(s: F.Column) -> F.Column:
    return F.split(F.trim(s), r"\s+")


def _pair_counts(enc: DataFrame) -> DataFrame:
    """Adjacent-pair counts over the dictionary, weighted by word freq."""
    sy = _symbols(F.col("s"))
    idx = F.when(F.size(sy) >= 2, F.sequence(F.lit(0), F.size(sy) - 2)).otherwise(
        F.array().cast("array<int>")
    )
    pairs = enc.select(
        "freq",
        F.explode(
            F.transform(
                idx,
                lambda j: F.struct(
                    F.get(sy, j).alias("l"), F.get(sy, j + 1).alias("r")
                ),
            )
        ).alias("p"),
    )
    return pairs.groupBy("p.l", "p.r").agg(
        F.sum("freq").alias("cnt")
    )


def apply_merge(s: F.Column, left: str, right: str) -> F.Column:
    """One BPE merge on a wrapped symbol string (see module docstring)."""
    return F.replace(
        s,
        F.lit(f" {left}  {right} "),
        F.lit(f" {left}{right} "),
    )


def _local_pair_counts(sy: list[str]) -> dict[tuple[str, str], int]:
    """Adjacent-pair counts of ONE word's symbol list — the driver-side
    twin of ``_pair_counts``'s per-row explode (position-based, so the
    overlapping ``a a a`` counts (a,a) twice, exactly as the grid does)."""
    c: dict[tuple[str, str], int] = {}
    for j in range(len(sy) - 1):
        p = (sy[j], sy[j + 1])
        c[p] = c.get(p, 0) + 1
    return c


def _local_merge_loop(
    entries: list[tuple[str, int]], num_merges: int
) -> list[tuple[str, str, int]]:
    """The BPE merge loop on the COLLECTED capped dictionary.

    ``entries`` is [(word, freq)] — at most ``max_words`` rows, so it fits
    in driver memory by construction (the same bounded-model-fit stance as
    the PQ codebook sample in operators/similarity.py). Semantics are
    byte-identical to the distributed loop this replaces: per-position
    adjacent-pair counts weighted by word freq, argmax tie-broken
    (count desc, left asc, right asc) — Python tuple compare on str is
    code-point order, which equals Spark's binary UTF8 sort for the
    well-formed UTF-8 this ever sees — and merge application is the same
    left-to-right non-overlapping replace of ``' l  r '`` → ``' lr '`` on
    the double-space-serialized symbol string (``str.replace`` and
    ``F.replace`` share that contract).

    Cost model: one full count to seed, then each merge touches only the
    words that CONTAIN the merged pair (``pair_words`` inverted index) and
    finds the argmax through a lazy-invalidation heap — so a 32k-merge
    production vocabulary is seconds of driver CPU instead of 32k
    sequential Spark jobs (the round-4 scale soft spot this closes)."""
    import heapq

    syms: list[list[str]] = []
    pair_counts: dict[tuple[str, str], int] = {}
    pair_words: dict[tuple[str, str], set[int]] = {}
    for i, (w, freq) in enumerate(entries):
        # char-class parity with wrap_symbols: Java regex '.' excludes
        # line terminators, so the Spark path silently drops them from
        # the symbol stream — mirror that here or merges diverge on
        # corpora containing them
        sy = [c for c in w if c not in "\n\r\x85\u2028\u2029"]
        syms.append(sy)
        for p, k in _local_pair_counts(sy).items():
            pair_counts[p] = pair_counts.get(p, 0) + k * freq
            pair_words.setdefault(p, set()).add(i)
    # min-heap over (-cnt, l, r) == Spark's orderBy(cnt desc, l asc, r asc);
    # stale entries are skipped when their count no longer matches.
    heap = [(-cnt, p[0], p[1]) for p, cnt in pair_counts.items()]
    heapq.heapify(heap)
    merges: list[tuple[str, str, int]] = []
    for _ in range(num_merges):
        best = None
        while heap:
            negcnt, l, r = heap[0]
            if pair_counts.get((l, r), 0) != -negcnt or negcnt == 0:
                heapq.heappop(heap)  # stale or emptied pair
                continue
            best = (l, r, -negcnt)
            break
        if best is None:
            break  # dictionary fully merged
        l, r, cnt = best
        merges.append((l, r, cnt))
        target, repl = f" {l}  {r} ", f" {l}{r} "
        touched: set[tuple[str, str]] = set()
        for i in sorted(pair_words.get((l, r), ())):
            freq = entries[i][1]
            old = _local_pair_counts(syms[i])
            s = " " + "  ".join(syms[i]) + " "
            # split on the EXACT double-space separator, not .split():
            # Python whitespace-split also breaks on NBSP/U+2000-range
            # chars that are legitimate symbols here (Spark's Java \s+
            # is ASCII-only), which would silently drop them and diverge
            # from the distributed loop
            sy2 = s.replace(target, repl)[1:-1].split("  ")
            syms[i] = sy2
            new = _local_pair_counts(sy2)
            for p in old.keys() | new.keys():
                d = (new.get(p, 0) - old.get(p, 0)) * freq
                if d:
                    pair_counts[p] = pair_counts.get(p, 0) + d
                    touched.add(p)
                if new.get(p, 0) > 0:
                    pair_words.setdefault(p, set()).add(i)
                else:
                    pair_words.get(p, set()).discard(i)
        for p in touched:
            heapq.heappush(heap, (-pair_counts[p], p[0], p[1]))
    return merges


def train_bpe(
    df: DataFrame,
    text_col: str,
    num_merges: int = 8,
    max_words: int = 10_000,
    word_freqs: DataFrame | None = None,
    merge_loop: str = "driver",
) -> list[tuple[str, str, int]]:
    """Learn ``num_merges`` merges; returns [(left, right, pair_count)] in
    merge order. The corpus-sized work (word counting) is always ONE
    distributed hash aggregate; the merge loop then runs over the capped
    dictionary in one of two modes producing identical merges (pinned by
    tests/test_operators.py::test_bpe_driver_loop_matches_spark_loop):

      * ``merge_loop="driver"`` (default) — collect the ≤``max_words``-row
        dictionary once and run the loop locally: O(1) Spark jobs total,
        so deep production vocabularies (32k merges) cost seconds, not
        32k sequential job round-trips.
      * ``merge_loop="spark"`` — one dictionary-sized distributed
        aggregate per merge, exactly one argmax row shipped to the driver
        per step. Kept for dictionaries too large to collect (a
        ``max_words`` cap far beyond driver memory).

    Pass ``word_freqs`` (a ``word_frequencies`` frame) to reuse an
    already-built dictionary instead of re-counting the corpus."""
    if merge_loop not in ("driver", "spark"):
        raise ValueError(f"merge_loop must be 'driver' or 'spark': {merge_loop}")
    wf = (
        word_freqs
        if word_freqs is not None
        else word_frequencies(df, text_col, max_words)
    )
    if merge_loop == "driver":
        # deterministic collect order (freq desc, word asc) for a
        # reproducible heap seed; the loop itself is order-insensitive
        # because counts are summed before any argmax.
        rows = wf.select("w", "freq").orderBy(
            F.desc("freq"), F.asc("w")
        ).collect()
        return _local_merge_loop([(r.w, int(r.freq)) for r in rows], num_merges)
    wf = wf.persist()
    cached: list[DataFrame] = []
    try:
        enc = wf.select("w", "freq", wrap_symbols(F.col("w")).alias("s"))
        merges: list[tuple[str, str, int]] = []
        for _ in range(num_merges):
            best = (
                _pair_counts(enc)
                .orderBy(F.desc("cnt"), F.asc("l"), F.asc("r"))
                .limit(1)
                .collect()
            )
            if not best:
                break  # dictionary fully merged
            l, r, cnt = best[0].l, best[0].r, best[0].cnt
            merges.append((l, r, int(cnt)))
            enc = enc.withColumn("s", apply_merge(F.col("s"), l, r))
            # Persist each step so step k's pair count doesn't re-apply
            # merges 1..k-1 through the whole lineage (keeps the loop
            # linear, not quadratic; dictionary-sized, so cheap).
            enc = enc.persist()
            cached.append(enc)
        return merges
    finally:
        # only the merge LIST leaves this function — release every cached
        # frame so repeated trainings don't accumulate storage. A
        # caller-provided word_freqs frame stays cached (the caller owns
        # its lifecycle — e.g. to reuse it for the encode pass).
        if word_freqs is None:
            wf.unpersist()
        for c in cached:
            c.unpersist()


def merge_table(
    spark: SparkSession, merges: list[tuple[str, str, int]]
) -> DataFrame:
    """The learned merges as a DataFrame (merge_rank, left_sym, right_sym,
    pair_count)."""
    rows = [
        (i + 1, l, r, cnt) for i, (l, r, cnt) in enumerate(merges)
    ]
    return spark.createDataFrame(
        rows,
        "merge_rank int, left_sym string, right_sym string, pair_count bigint",
    )


def _encode_word_local(word: str, ranks: dict[tuple[str, str], int]) -> int:
    """Post-merge symbol count of one word under rank-order application —
    the standard BPE apply: repeatedly merge ALL occurrences (left to
    right, non-overlapping) of the lowest-rank adjacent pair present.

    Equivalent to the expr path's sequential full-pass replace chain: a
    merged token only ever participates in HIGHER-rank rules (a rule's
    symbols must exist when it is learned, so any rule consuming rule k's
    output was learned after k), hence applying the global minimum rank
    first reproduces the in-order pass exactly — pinned by
    tests/test_operators.py::test_bpe_arrow_encode_matches_expr."""
    # same char-class parity as _local_merge_loop: Java regex '.' (the
    # expr path's wrap_symbols) drops line terminators that survive the
    # \s+ tokenizer — keep the paths byte-identical
    syms = [c for c in word if c not in "\n\r\x85\u2028\u2029"]
    while len(syms) > 1:
        best_rank, best = None, None
        for i in range(len(syms) - 1):
            rk = ranks.get((syms[i], syms[i + 1]))
            if rk is not None and (best_rank is None or rk < best_rank):
                best_rank, best = rk, (syms[i], syms[i + 1])
        if best is None:
            break
        l, r = best
        out, i = [], 0
        while i < len(syms):
            if i < len(syms) - 1 and syms[i] == l and syms[i + 1] == r:
                out.append(l + r)
                i += 2
            else:
                out.append(syms[i])
                i += 1
        syms = out
    # floor of 1: the expr path's split of an empty symbol string yields
    # one empty token (Spark split("") == [""]), so an empty/filtered-out
    # word counts 1 symbol there — match it, which also keeps per-doc
    # symbol sums positive (chars_per_token would otherwise hit 0/0 on
    # an all-empty document under ANSI mode)
    return max(1, len(syms))


def encoded_dictionary(
    df: DataFrame,
    text_col: str,
    merges: list[tuple[str, str, int]],
    max_words: int = 10_000,
    word_freqs: DataFrame | None = None,
    apply_mode: str = "auto",
) -> DataFrame:
    """(w, n_sym): symbol count per dictionary word after all merges.

    Two application paths producing identical counts:

      * ``"expr"`` — ONE projection of nested literal replaces, a single
        codegen stage, exactly replayable in a SQL oracle. Expression
        depth grows with the merge count, so this is for shallow merge
        lists only (a 32k-vocab chain would blow past codegen/JVM method
        limits).
      * ``"arrow"`` — Arrow ``mapInPandas`` over the dictionary applying
        merges rank-ordered per word (see ``_encode_word_local``); depth-
        independent, the 100 TB path for production vocabularies. The
        merge table ships once per executor in the closure (32k pairs is
        KBs).

    ``"auto"`` picks expr for ≤256 merges (oracle-friendly, compile cost
    negligible) and arrow beyond. Pass ``word_freqs`` to reuse the
    trainer's dictionary instead of re-counting the corpus."""
    if apply_mode not in ("auto", "expr", "arrow"):
        raise ValueError(f"apply_mode must be auto|expr|arrow: {apply_mode}")
    if apply_mode == "auto":
        apply_mode = "expr" if len(merges) <= 256 else "arrow"
    wf = (
        word_freqs
        if word_freqs is not None
        else word_frequencies(df, text_col, max_words)
    )
    if apply_mode == "expr":
        s = wrap_symbols(F.col("w"))
        for l, r, _ in merges:
            s = apply_merge(s, l, r)
        return wf.select(
            "w", F.size(_symbols(s)).cast("bigint").alias("n_sym")
        )
    ranks = {(l, r): k for k, (l, r, _) in enumerate(merges)}

    def enc(batches):
        import pandas as pd

        for pdf in batches:
            yield pd.DataFrame(
                {
                    "w": pdf["w"],
                    "n_sym": pd.Series(
                        [_encode_word_local(w, ranks) for w in pdf["w"]],
                        dtype="int64",
                    ),
                }
            )

    return wf.select("w").mapInPandas(enc, "w string, n_sym bigint")


def encode_stats(
    df: DataFrame,
    text_col: str,
    id_col: str,
    merges: list[tuple[str, str, int]],
    max_words: int = 10_000,
    word_freqs: DataFrame | None = None,
) -> DataFrame:
    """Per-document BPE accounting: words, chars, post-merge token count,
    chars-per-token compression. Out-of-dictionary words (beyond the
    ``max_words`` cap) fall back to character granularity — len(word)
    symbols — so the encoding is total. ``word_freqs`` reuses the
    trainer's dictionary (skips the second corpus-sized word count)."""
    from databricks_etl_pipelines_spark.functions.numeric import stable_round

    dictionary = encoded_dictionary(
        df, text_col, merges, max_words, word_freqs=word_freqs
    )
    words = df.select(
        F.col(id_col),
        F.explode(F.split(F.trim(F.col(text_col)), r"\s+")).alias("w"),
    )
    # OOD fallback floored at 1: an EMPTY word (from empty/whitespace
    # docs) outside the dictionary cap has length 0 — without the floor an
    # all-empty doc sums n_sym to 0 and chars_per_token hits 0/0 (ANSI
    # raise). Matches the in-dictionary floor (split("") == [""] => 1).
    n_sym = F.coalesce(
        F.col("n_sym"),
        F.greatest(F.lit(1).cast("bigint"), F.length("w").cast("bigint")),
    )
    return (
        words.join(dictionary, "w", "left")
        .groupBy(id_col)
        .agg(
            F.count("*").alias("n_words"),
            F.sum(F.length("w")).cast("bigint").alias("n_chars"),
            F.sum(n_sym).alias("n_bpe_tokens"),
            stable_round(
                F.sum(F.length("w")) / F.sum(n_sym), 6
            ).alias("chars_per_token"),
        )
    )
