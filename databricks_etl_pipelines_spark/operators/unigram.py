"""Unigram-LM subword segmentation (the SentencePiece/Kudo-2018 decode
side, frequency-scored): build a piece inventory from corpus substring
statistics, score pieces by their log relative frequency, and segment
every dictionary word by VITERBI — the maximum-likelihood split under a
unigram piece model.

Reference parity: the reference repo has no tokenizer at all (its text
handling is withColumn string ops, e.g. 02_Silver_Cleanse_PII.py's
regexp chains); this operator extends the training-data surface the
same way operators/bpe.py does, as SURVEY §2's north-star LLM family
demands.

Spark-first shape (and why it holds at 100 TB):

* Word counting is the only corpus-sized stage — one explode + hash
  aggregate, capped to the top ``max_words`` dictionary by
  TakeOrderedAndProject (never a partitionless window; see
  operators/bpe.py::word_frequencies for the argument).
* Piece statistics, vocabulary selection, scoring and Viterbi all run
  over the DICTIONARY (≤ max_words rows), not the corpus — the same
  dictionary-sized discipline as the BPE trainer. Candidate explosion
  is ≤ len·max_piece_len rows per distinct word.
* Segmentation itself is an Arrow ``mapInPandas`` over dictionary
  words with the scored vocabulary broadcast as a plain dict — the
  vocabulary is bounded (``vocab_multi`` + alphabet), so the driver
  collect is constant-size, like the BPE merge table and the IVF/PQ
  codebooks. Corpus text is never pulled through Python.

Cross-engine exactness (what makes a Viterbi argmax SQL-replayable):

* Piece scores are INTEGER lattice points: floor(ln(count/total)·4096)
  as BIGINT. DP values are integer sums — order-independent — and the
  argmax tie-breaks on the larger split point, a rule both engines
  implement identically. The only engine-sensitive op is ln (libm vs
  java.lang.Math can differ in the last ulp); at the 2^-12 lattice a
  flip needs ln to land within ~1e-12 of a lattice boundary —
  negligible over the bounded set of distinct piece counts, and noted
  so an engine upgrade that moves ln by an ulp reads as environment
  drift, not an operator bug (same note as perplexity_buckets and the
  sketch-bracket oracles).
* Every length-1 substring is ALWAYS in the vocabulary (uncapped), so
  every word is segmentable and the DP never strands; the multi-char
  cap selects top ``vocab_multi`` by (count desc, piece asc) — a total
  order, so the selected set is engine-identical.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SCALE_BITS = 12
_SCALE = float(1 << SCALE_BITS)


def piece_candidates(
    words: DataFrame, max_piece_len: int = 6
) -> DataFrame:
    """All substrings (1-based start ``i``, length ``l``) of the
    dictionary words, one row per occurrence, carrying the word freq —
    the shared source for piece counting AND the DP candidate grid.
    Dictionary-sized: ≤ len·max_piece_len rows per distinct word."""
    return (
        words.select(
            "w",
            "freq",
            F.explode(F.sequence(F.lit(1), F.length("w"))).alias("i"),
        )
        .select(
            "w",
            "freq",
            "i",
            F.explode(
                F.sequence(
                    F.lit(1),
                    F.least(
                        F.lit(int(max_piece_len)),
                        F.length("w") - F.col("i") + 1,
                    ),
                )
            ).alias("l"),
        )
        .select(
            "w", "freq", "i", "l",
            F.expr("substring(w, i, l)").alias("piece"),
        )
    )


def piece_scores(
    words: DataFrame,
    max_piece_len: int = 6,
    vocab_multi: int = 48,
) -> DataFrame:
    """Frequency-scored piece vocabulary: every single character
    (coverage guarantee) plus the top ``vocab_multi`` multi-char
    substrings by (occurrence-weighted count desc, piece asc), scored
    ``floor(ln(count/total)·4096)`` with total = the selected
    vocabulary's count mass. Returns (piece, cnt, s)."""
    counts = (
        piece_candidates(words, max_piece_len)
        .groupBy("piece")
        .agg(F.sum("freq").alias("cnt"))
    )
    singles = counts.filter(F.length("piece") == 1)
    multi = (
        counts.filter(F.length("piece") >= 2)
        .orderBy(F.desc("cnt"), F.asc("piece"))
        .limit(int(vocab_multi))
    )
    vocab = singles.unionByName(multi)
    total = vocab.agg(F.sum("cnt").alias("total"))
    return vocab.crossJoin(F.broadcast(total)).select(
        "piece",
        "cnt",
        F.floor(
            F.log(F.col("cnt") / F.col("total")) * F.lit(_SCALE)
        ).cast("long").alias("s"),
    )


def _viterbi(word: str, smap: dict[str, int], max_piece_len: int):
    """Max-score split of ``word`` under piece scores ``smap``; ties on
    DP value break to the LARGER split point (shorter last piece) —
    the same rule as the SQL list_reduce fold.

    Raises ``ValueError`` if ``word`` cannot be segmented from ``smap``
    (unreachable from the shipped trainers, whose vocabularies always
    contain every single character — but a direct caller with a pruned
    alphabet must not silently receive a fabricated one-piece split)."""
    n = len(word)
    dp: list[int | None] = [0] + [None] * n
    bp = [0] * (n + 1)
    for j in range(1, n + 1):
        best: tuple[int, int] | None = None
        for i in range(max(0, j - max_piece_len), j):
            if dp[i] is None:
                continue
            s = smap.get(word[i:j])
            if s is None:
                continue
            cand = (dp[i] + s, i)
            if best is None or cand > best:
                best = cand
        if best is not None:
            dp[j], bp[j] = best
    if n > 0 and dp[n] is None:
        raise ValueError(
            f"_viterbi: {word!r} is unsegmentable under the given "
            f"vocabulary (max_piece_len={max_piece_len}) — the piece "
            "inventory must cover every character of the word"
        )
    pieces: list[str] = []
    pos = n
    while pos > 0:
        pieces.append(word[bp[pos]:pos])
        pos = bp[pos]
    pieces.reverse()
    return pieces, (dp[n] if dp[n] is not None else 0)


def _forward(word: str, pmap: dict[str, float], P: int) -> list[float]:
    """Sum-product forward pass: a[j] = Σ_l a[j-l]·p(w[j-l:j]), the fold
    running DESCENDING l with a 0.0 initial accumulator and invalid
    candidates contributing +0.0 — the EXACT order the SQL replay uses
    (x + 0.0 == x in IEEE for the non-negative values here, so
    skip-vs-add-zero is equivalence, not approximation)."""
    n = len(word)
    a = [0.0] * (n + 1)
    a[0] = 1.0
    for j in range(1, n + 1):
        acc = 0.0
        for l in range(P, 0, -1):
            i = j - l
            if i < 0:
                continue
            p = pmap.get(word[i:j])
            acc = acc + (a[i] * p if p is not None else 0.0)
        a[j] = acc
    return a


def _backward(word: str, pmap: dict[str, float], P: int) -> list[float]:
    """Sum-product backward pass, same descending-l fold discipline."""
    n = len(word)
    b = [0.0] * (n + 1)
    b[n] = 1.0
    for i in range(n - 1, -1, -1):
        acc = 0.0
        for l in range(P, 0, -1):
            j = i + l
            if j > n:
                continue
            p = pmap.get(word[i:j])
            acc = acc + (p * b[j] if p is not None else 0.0)
        b[i] = acc
    return b


def em_probabilities(
    words: DataFrame,
    max_piece_len: int = 6,
    vocab_multi: int = 48,
    iters: int = 2,
    count_scale_bits: int = 24,
    max_word_len: int = 16,
    prune_per_iter: int = 0,
) -> dict[str, float]:
    """Kudo-2018 EM training of the unigram piece model, made
    cross-engine replayable — the full training loop, not just decode:

    * Init: p0(piece) = cnt/total over the frequency-selected vocabulary
      (all single chars + top multi-char, exactly piece_scores' cut).
    * E-step (per EM iteration): per-word forward/backward sum-product
      over the segmentation lattice under p_{t-1}; each occurrence
      (word, i, l) contributes expected count freq·(a[i]·p·b[i+l])/Z.
      Runs DISTRIBUTED as an Arrow ``mapInPandas`` over the dictionary
      (per-word lattices are independent), with the current p table
      broadcast — the BPE/k-means bounded-collect pattern.
    * The crux (why an EM trajectory can be engine-exact): per-word
      float work uses PINNED fold orders (descending piece length,
      left-associated, +0.0 for invalid candidates) so each occurrence
      posterior is one deterministic IEEE expression; the CROSS-WORD
      aggregation — the only visit-order-dependent sum — is quantized
      to the 2^-count_scale_bits lattice and summed as BIGINTs
      (integer addition commutes), the k-means centroid trick. Add-one
      smoothing on the integer lattice keeps every piece alive.
      Int64 headroom (the k-means-style bound, stated explicitly): a
      word of length n contributes ≤ n·max_piece_len occurrence
      posteriors each ≤ 1, so a piece's quantized count sum is at most
      corpus_tokens · max_word_len · 2^count_scale_bits; with the
      defaults (16 · 2^24 ≈ 2^28) that overflows int64 only past ~2^35
      ≈ 3·10^10 occurrences OF ONE PIECE in the training dictionary —
      and the dictionary aggregates unique words, so its total freq
      mass, not the raw corpus, is the n in the bound. At a 100 TB
      corpus train the tokenizer on a sampled/capped dictionary (as
      real SentencePiece does) or lower count_scale_bits to 16
      (headroom ~2^43); the lattice only needs enough resolution to
      order pieces, not to carry probability precision.
    * M-step: p_t(piece) = qc/QT — one exact-integer division.

    * Pruning (``prune_per_iter`` > 0, Kudo's vocabulary shrink): after
      each M-step, the ``prune_per_iter`` MULTI-char pieces with the
      smallest (p, piece) are dropped (single chars are protected —
      they are the coverage guarantee) and the survivors renormalized
      by a PIECE-ORDERED fold (a plain float sum would be visit-order
      dependent; the ordered fold is one deterministic IEEE chain both
      engines replay). The next E-step's smoothing runs over the
      SURVIVING vocabulary only, so pruned pieces stay dead.

    Words longer than ``max_word_len`` are excluded from the dictionary
    (both engines apply the same filter), bounding lattice depth.
    Returns the final probability dict (bounded: vocabulary-sized)."""
    spark = words.sparkSession
    S = float(1 << count_scale_bits)
    mpl = int(max_piece_len)
    # persist the (bounded, ≤ max_words-row) dictionary: the piece
    # inventory, every E-step pass and the final read all consume it —
    # without the persist each consumption re-runs the corpus-sized
    # word-count aggregate upstream, making a dictionary-bound loop
    # silently corpus-bound (measured 2x at 10x corpus before the fix)
    wl = words.filter(F.length("w") <= int(max_word_len)).persist()
    counts = (
        piece_candidates(wl, mpl)
        .groupBy("piece")
        .agg(F.sum("freq").alias("cnt"))
    )
    singles = counts.filter(F.length("piece") == 1)
    multi = (
        counts.filter(F.length("piece") >= 2)
        .orderBy(F.desc("cnt"), F.asc("piece"))
        .limit(int(vocab_multi))
    )
    vocab_rows = singles.unionByName(multi).collect()
    total = sum(int(r["cnt"]) for r in vocab_rows)
    pmap = {r["piece"]: float(int(r["cnt"])) / float(total)
            for r in vocab_rows}

    for _ in range(int(iters)):
        bc = spark.sparkContext.broadcast(pmap)

        def estep(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            table = bc.value
            for pdf in batches:
                pieces: list[str] = []
                qcontribs: list[int] = []
                for word, freq in zip(pdf["w"], pdf["freq"]):
                    w = str(word)
                    n = len(w)
                    if n == 0:
                        continue
                    a = _forward(w, table, mpl)
                    b = _backward(w, table, mpl)
                    z = a[n]
                    for i in range(n):
                        for l in range(1, min(mpl, n - i) + 1):
                            piece = w[i:i + l]
                            p = table.get(piece)
                            if p is None:
                                continue
                            e = ((a[i] * p) * b[i + l]) / z
                            q = int((e * float(int(freq))) * S + 0.5)
                            # int() truncates; floor == truncate for the
                            # non-negative values here
                            pieces.append(piece)
                            qcontribs.append(q)
                yield pd.DataFrame({"piece": pieces, "qc": qcontribs})

        contrib = wl.select("w", "freq").mapInPandas(
            estep, "piece string, qc long"
        )
        sums = {
            r["piece"]: int(r["s"])
            for r in contrib.groupBy("piece")
            .agg(F.sum("qc").alias("s"))
            .collect()
        }
        qc = {piece: 1 + sums.get(piece, 0) for piece in pmap}
        qt = sum(qc.values())
        pmap = {piece: float(c) / float(qt) for piece, c in qc.items()}
        if prune_per_iter > 0:
            multi = sorted(
                (p, piece) for piece, p in pmap.items() if len(piece) >= 2
            )
            drop = {piece for _, piece in multi[: int(prune_per_iter)]}
            kept = {
                piece: p
                for piece, p in pmap.items()
                if len(piece) == 1 or piece not in drop
            }
            # piece-ordered renormalization fold (engine-replayable)
            s = 0.0
            for piece in sorted(kept):
                s = s + kept[piece]
            pmap = {piece: p / s for piece, p in kept.items()}
    wl.unpersist()
    return pmap


def em_segment_dictionary(
    words: DataFrame,
    max_piece_len: int = 6,
    vocab_multi: int = 48,
    iters: int = 2,
    max_word_len: int = 16,
    prune_per_iter: int = 0,
) -> DataFrame:
    """EM-train the unigram piece model (:func:`em_probabilities`), then
    Viterbi-segment the dictionary under the trained model — the full
    SentencePiece train+decode pipeline, all of it SQL-replayable.
    Scores are the usual ln-lattice integers floor(ln(p)·4096)."""
    import math

    pmap = em_probabilities(
        words, max_piece_len, vocab_multi, iters,
        max_word_len=max_word_len, prune_per_iter=prune_per_iter,
    )
    smap = {
        piece: math.floor(math.log(p) * float(1 << SCALE_BITS))
        for piece, p in pmap.items()
    }
    wl = words.filter(F.length("w") <= int(max_word_len))
    return _segment_with_scores(wl, smap, int(max_piece_len))


def segment_dictionary(
    words: DataFrame,
    max_piece_len: int = 6,
    vocab_multi: int = 48,
) -> DataFrame:
    """Viterbi-segment every dictionary word under the frequency-scored
    unigram piece model. Returns (word, freq, n_pieces, pieces, score)
    — pieces space-joined, score the integer-lattice DP total.

    The scored vocabulary is driver-collected (bounded: alphabet +
    ``vocab_multi`` rows) and broadcast into an Arrow ``mapInPandas``
    over the dictionary — the exact pattern of the BPE encoder's
    rank-apply path."""
    scored = piece_scores(words, max_piece_len, vocab_multi)
    smap = {r["piece"]: int(r["s"]) for r in scored.collect()}
    return _segment_with_scores(words, smap, int(max_piece_len))


def _segment_with_scores(
    words: DataFrame, smap: dict[str, int], max_piece_len: int
) -> DataFrame:
    """Viterbi-segment dictionary words under a bounded broadcast score
    dict via Arrow ``mapInPandas`` (shared by the frequency-scored and
    the EM-trained paths)."""
    bc = words.sparkSession.sparkContext.broadcast(smap)
    mpl = int(max_piece_len)

    def seg(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        table = bc.value
        for pdf in batches:
            out = {
                "word": [], "freq": [], "n_pieces": [],
                "pieces": [], "score": [],
            }
            for word, freq in zip(pdf["w"], pdf["freq"]):
                pieces, score = _viterbi(str(word), table, mpl)
                out["word"].append(word)
                out["freq"].append(int(freq))
                out["n_pieces"].append(len(pieces))
                out["pieces"].append(" ".join(pieces))
                out["score"].append(int(score))
            yield pd.DataFrame(out)

    return words.select("w", "freq").mapInPandas(
        seg,
        "word string, freq long, n_pieces int, pieces string, score long",
    )
