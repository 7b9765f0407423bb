"""Distributed BPE tokenizer training and segmentation.

Training the tokenizer is the one corpus-scale job an LLM data pipeline
runs BEFORE any token accounting exists: byte-pair-encoding merge rules
learned from pair frequencies (Sennrich et al., 2016).  The naive
formulation rescans the corpus once per merge — 10^12 documents times
thousands of merges is a non-starter.  The classic scale fix, used
here, is that BPE with whitespace pre-tokenization only ever needs the
WORD HISTOGRAM: the corpus is touched exactly once (explode tokens ->
groupBy(word).count(), one map-side-combined shuffle), and the entire
merge loop runs over the vocabulary-sized histogram (10^6-10^8 rows for
web text, vs 10^12 docs).  Every per-round job is histogram-sized.

The (left, right) pair-count frame is built ONCE (a `transform` over
each word's symbol array, explode, groupBy(left, right) with map-side
combine; overlapping pairs counted per position, the Sennrich
convention) and then maintained INCREMENTALLY: a merge only changes
the pair multiset of words containing the merged pair adjacently, so
each round shuffles a delta (-old pairs, +merged pairs of the affected
words) instead of re-exploding the whole histogram — the fix that
makes 32k-64k production merge rounds tractable, since a full
histogram-sized exchange per round was the dominant cost.

Remaining wall at production vocab (32k-64k merges), disclosed: each
round is one narrow scan of the cached histogram (codegen substring
probe — no exchange) plus a delta-sized shuffle and a small join, so
per-round wall-clock is scheduling-bound (~0.35 s flat on local[32],
measured at num_merges=100; recorded in bench.py as bpe_train_100).
The next rung, if ever needed, is a maintained pair->word inverted
index to replace the per-round scan, or the guarded driver-side loop
over the collected histogram that single-node tokenizer trainers use.
Batching "non-interacting" merges per round was considered and
REJECTED for exactness: a merge (a,b) creates new pairs with counts up
to count(a,b), which can overtake a lower-counted symbol-disjoint
candidate in the (count DESC, left, right) order — batch application
would diverge from the sequential golden.

Per merge round, entirely in DataFrame ops:
  1. argmax pair over the maintained count frame with the deterministic
     tie-break (count DESC, left ASC, right ASC) — `orderBy(...).limit(1)`
     is a TakeOrdered (per-partition top-1, driver merges P candidates),
     NOT a global sort; the one-row collect per round is the same bounded
     driver coordination the IVF trainer documents
     (operators/similarity.py) — a scalar per round, never data;
  2. left-greedy merge application via an `aggregate` fold over each
     symbol array (merged symbols are the concatenated string, so a
     plain last-element match implements the greedy scan exactly),
     applied as a NARROW map only where the pair occurs;
  3. the delta recount (explode only the affected words, old and merged
     forms) and a full-outer join update of the pair frame; lineage of
     both frames is cut with a localCheckpoint every few rounds so
     round R never re-analyzes R nested folds.

Symbols are Unicode code points (`regexp_extract_all(word, '(?s).')`),
matching code-point semantics in Java regex, RE2, and Python — the
independent pure-Python golden (tools/gen_golden_bpe.py) relies on
this agreement.

Segmentation (`bpe_segment`) reuses the same insight: apply the merge
folds to the DISTINCT-WORD table, then broadcast-join word -> n_pieces
back onto the corpus token stream — the corpus-scale pass is one
explode + one join + one groupBy; the sequential merge folds only ever
run at vocabulary scale.
"""

from __future__ import annotations

import heapq
import os

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .text import tokens

# cut the fold-expression lineage every N merge rounds: keeps driver-side
# analysis cost linear in the number of merges instead of quadratic
_CHECKPOINT_EVERY = 4

# Driver-path guard: when the distinct-word histogram fits comfortably on
# the driver (vocab-sized, NEVER corpus-sized — 10^6 rows is ~20-40 MB of
# words), the merge loop runs as a local incremental trainer, which is how
# every production tokenizer trainer works: the corpus-scale work (the
# histogram) stays distributed, the inherently sequential merge loop runs
# where a 0.3 s/round Spark scheduling floor doesn't multiply by the merge
# count.  Above the guard the exact distributed incremental loop below
# takes over unchanged.  Both paths implement the identical spec (pair
# counts weighted by word frequency, (count DESC, left, right) argmax,
# min count 2, left-greedy application) and are parity-tested against
# each other and the independent golden.
_DRIVER_VOCAB_MAX = int(os.environ.get("SPARK_GRAFT_BPE_DRIVER_VOCAB", "1000000"))
_DRIVER_VOCAB_CHAR_MAX = 64 * 1024 * 1024  # pathological mega-words -> fall back
# bpe_segment's driver path costs O(vocab x rules); cap the product so a
# 64k-rule production run over a large vocab falls back to the fold chain
_DRIVER_SEGMENT_OPS_MAX = 50_000_000


def _train_driver(
    hist: "list[tuple[str, int]]", num_merges: int
) -> "list[tuple[str, str, int]]":
    """Local incremental BPE trainer over the collected (word, wcount)
    histogram — exact same semantics as the distributed loop: overlapping
    adjacent pair counts weighted by wcount, argmax under (count DESC,
    left ASC, right ASC) via a lazy-deletion heap (Python tuple order on
    strings == code-point order == Spark's UTF-8 byte order), min pair
    count 2, left-greedy merge application.  Pair counts are maintained
    incrementally through a pair->word inverted index (the "next rung"
    the distributed loop's docstring names), so per-round cost is
    delta-sized, not histogram-sized."""
    syms: list[list[str]] = []
    wcs: list[int] = []
    pair_count: dict[tuple[str, str], int] = {}
    pair_words: dict[tuple[str, str], set[int]] = {}
    for w, c in hist:
        i = len(syms)
        s = list(w)
        syms.append(s)
        wcs.append(int(c))
        for p in zip(s, s[1:]):
            pair_count[p] = pair_count.get(p, 0) + c
            ws = pair_words.get(p)
            if ws is None:
                pair_words[p] = ws = set()
            ws.add(i)
    heap = [(-c, p[0], p[1]) for p, c in pair_count.items() if c >= 2]
    heapq.heapify(heap)
    merges: list[tuple[str, str, int]] = []
    for _ in range(int(num_merges)):
        best = None
        while heap:
            negc, left, right = heap[0]
            cur = pair_count.get((left, right), 0)
            if cur >= 2 and cur == -negc:
                best = (left, right, cur)
                break
            heapq.heappop(heap)  # stale entry (count changed or dropped)
        if best is None:
            break
        heapq.heappop(heap)  # consume the winning entry
        left, right, cnt = best
        merges.append((left, right, cnt))
        merged = left + right
        affected = pair_words.get((left, right), set())
        changed: set[tuple[str, str]] = set()
        for i in list(affected):
            s = syms[i]
            c = wcs[i]
            # subtract the word's old pairs, apply the merge, add the new
            # pairs: a stale index member (word no longer contains the
            # pair) nets to zero — the same superset-filter tolerance the
            # distributed delta recount documents
            for p in zip(s, s[1:]):
                pair_count[p] = pair_count.get(p, 0) - c
                changed.add(p)
            out: list[str] = []
            for t in s:
                if out and out[-1] == left and t == right:
                    out[-1] = merged
                else:
                    out.append(t)
            syms[i] = out
            for p in zip(out, out[1:]):
                pair_count[p] = pair_count.get(p, 0) + c
                changed.add(p)
                ws = pair_words.get(p)
                if ws is None:
                    pair_words[p] = ws = set()
                ws.add(i)
        for p in changed:
            c2 = pair_count.get(p, 0)
            if c2 <= 0:
                pair_count.pop(p, None)
            elif c2 >= 2:
                heapq.heappush(heap, (-c2, p[0], p[1]))
    return merges


def _segment_word_driver(word: str, merges: "list") -> int:
    """Number of BPE pieces of one word: every rule applied once, in rank
    order, each as a single left-greedy pass — the exact per-word
    semantics of the distributed fold chain."""
    s = list(word)
    for rule in merges:
        left, right = rule[0], rule[1]
        if left + right not in word:
            # cheap superset substring probe on the ORIGINAL word: a merge
            # can only assemble symbols that are substrings of the word,
            # so left||right absent from the word means the fold is a
            # no-op (same probe the distributed loop uses)
            continue
        out: list[str] = []
        for t in s:
            if out and out[-1] == left and t == right:
                out[-1] = left + right
            else:
                out.append(t)
        s = out
    return len(s)


def _symbols(word: Column) -> Column:
    """Code-point symbol array of a word ('(?s).' matches one code point
    in Java regex, RE2, and Python alike)."""
    return F.regexp_extract_all(word, F.lit("(?s)."), 0)


def word_histogram(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(word, wcount) — the ONE corpus-scale job in BPE training.
    Empty-text docs contribute nothing (split of '' yields [''],
    filtered)."""
    return (
        docs.select(F.explode(tokens(F.lower(F.col(text_col)))).alias("word"))
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count(F.lit(1)).cast("long").alias("wcount"))
    )


def _adjacent_pairs(syms: Column) -> Column:
    """array<struct<left,right>> of adjacent symbol pairs (overlapping,
    one per position — the Sennrich counting convention).  Built from
    the passed Column (no hardcoded column name)."""
    return F.transform(
        F.slice(syms, F.lit(1), F.greatest(F.size(syms) - 1, F.lit(0))),
        lambda s, i: F.struct(
            s.alias("left"), F.get(syms, i + 1).alias("right")
        ),
    )


def _apply_merge(syms: Column, left, right) -> Column:
    """Left-greedy single-rule merge: fold the symbol array, replacing
    the accumulator's last element with left||right whenever (last,
    current) matches the rule.  Because a merged symbol IS the
    concatenated string, matching the last element exactly reproduces
    the greedy left-to-right scan ('aaa' under (a,a) -> ['aa','a']).

    `left`/`right` accept a Column as well as a literal string: the
    training loop passes COLUMNS (from a broadcast one-row rule frame)
    so the expression tree — and its compiled whole-stage codegen — is
    byte-identical across merge rounds; embedding per-round literals
    forced a fresh codegen compile every round, which dominated the
    loop at small scale."""
    lcol = F.lit(left) if isinstance(left, str) else left
    rcol = F.lit(right) if isinstance(right, str) else right
    return F.aggregate(
        syms,
        F.array().cast("array<string>"),
        lambda acc, s: F.when(
            (F.size(acc) > 0)
            & (F.element_at(acc, -1) == lcol)
            & (s == rcol),
            F.concat(
                F.slice(acc, F.lit(1), F.size(acc) - 1),
                F.array(F.concat(F.element_at(acc, -1), s)),
            ),
        ).otherwise(F.concat(acc, F.array(s))),
    )


def bpe_train(
    docs: DataFrame,
    num_merges: int,
    text_col: str = "text",
) -> "tuple[DataFrame, list[tuple[str, str, int]]]":
    """Learn ``num_merges`` BPE merge rules from the corpus.

    Returns ``(merges_df, merges)`` where merges_df has columns
    (rank:long, left:string, right:string, pair_count:long) and merges
    is the same as a driver-side list (callers feed it to
    `bpe_segment`).  Training stops early if no pair occurs twice.

    Driver work per round is ONE row (the argmax pair) — disclosed,
    bounded coordination identical in kind to the IVF trainer's
    centroid collect; all counting runs executor-side at histogram
    scale.
    """
    spark = docs.sparkSession
    hist = word_histogram(docs, text_col).localCheckpoint(eager=False)
    if _DRIVER_VOCAB_MAX > 0:
        # guarded driver path: ONE corpus-scale job builds the histogram
        # (materialized through the checkpoint so a fallback reuses it);
        # the collect is vocab-bounded by limit(N+1) — never corpus-sized
        probe = hist.limit(_DRIVER_VOCAB_MAX + 1).collect()
        if len(probe) <= _DRIVER_VOCAB_MAX and (
            sum(len(r[0]) for r in probe) <= _DRIVER_VOCAB_CHAR_MAX
        ):
            merges = _train_driver(
                [(r[0], int(r[1])) for r in probe], int(num_merges)
            )
            rows = [
                (int(i), left, right, cnt)
                for i, (left, right, cnt) in enumerate(merges)
            ]
            schema = "rank long, left string, right string, pair_count long"
            return spark.createDataFrame(rows, schema), merges
    words = (
        hist.select(_symbols(F.col("word")).alias("syms"), "wcount")
        .localCheckpoint(eager=False)
    )
    # the (left, right) count frame is built ONCE from the full histogram
    # and then maintained INCREMENTALLY: a merge only changes the pair
    # multiset of words that contain the merged pair adjacently, so each
    # round recounts that delta instead of re-exploding the whole
    # histogram (the r5 design shuffled every pair of every word every
    # round — correct, but a full histogram-sized exchange per merge;
    # at 32k-64k production merges the recount dominates wall-clock)
    pairs = (
        words.select(F.explode(_adjacent_pairs(F.col("syms"))).alias("p"), "wcount")
        .groupBy("p.left", "p.right")
        .agg(F.sum("wcount").alias("pair_count"))
        .localCheckpoint(eager=False)
    )
    merges: list[tuple[str, str, int]] = []
    for rank in range(int(num_merges)):
        top = (
            pairs.filter(F.col("pair_count") >= 2)
            .orderBy(F.col("pair_count").desc(), F.col("left"), F.col("right"))
            .limit(1)
            .collect()
        )
        if not top:
            break
        left, right, cnt = top[0]["left"], top[0]["right"], int(top[0]["pair_count"])
        merges.append((left, right, cnt))
        # SUPERSET pre-filter, deliberately cheap (one substring probe on
        # the re-concatenated word instead of building the pair-struct
        # array): false positives are harmless everywhere they flow — the
        # fold is a no-op on a word without the adjacent pair, so its
        # -old/+new delta rows cancel exactly and the `when` keeps syms
        # unchanged.  Exactness never depends on the filter, only the
        # amount of skipped work does.  (The rule is embedded as plan
        # literals; shipping it as a broadcast one-row frame to reuse
        # codegen across rounds was measured SLOWER — the per-round
        # broadcast exchanges cost more than the recompilation.)
        hit = F.concat_ws("", F.col("syms")).contains(F.lit(left + right))
        affected = words.filter(hit)
        # exact delta in ONE scan of the affected words: each word emits
        # its old pairs at -wcount and its merged form's pairs at +wcount;
        # unaffected words contribute zero by construction, so the
        # maintained frame equals a from-scratch recount every round
        old_pairs = _adjacent_pairs(F.col("syms"))
        new_pairs = _adjacent_pairs(_apply_merge(F.col("syms"), left, right))
        signed = F.concat(
            F.transform(
                old_pairs,
                lambda p: F.struct(
                    p["left"].alias("left"),
                    p["right"].alias("right"),
                    (-F.col("wcount")).alias("w"),
                ),
            ),
            F.transform(
                new_pairs,
                lambda p: F.struct(
                    p["left"].alias("left"),
                    p["right"].alias("right"),
                    F.col("wcount").alias("w"),
                ),
            ),
        )
        delta = (
            affected.select(F.explode(signed).alias("x"))
            .groupBy("x.left", "x.right")
            .agg(F.sum("x.w").alias("d"))
        )
        pairs = (
            pairs.join(delta, ["left", "right"], "full_outer")
            .select(
                "left",
                "right",
                (
                    F.coalesce(F.col("pair_count"), F.lit(0))
                    + F.coalesce(F.col("d"), F.lit(0))
                ).alias("pair_count"),
            )
            .filter(F.col("pair_count") > 0)
            # the pair frame is vocabulary-pair-sized (small); truncating
            # its lineage every round keeps the per-round plan shallow —
            # without this, 4 rounds of chained full-outer joins over the
            # fold expressions ballooned analysis + codegen cost to ~4x
            # the actual execution
            .localCheckpoint(eager=False)
        )
        # words update is a NARROW map (fold applied only where the pair
        # occurs) — no shuffle; the only per-round exchange is delta-sized
        words = words.select(
            F.when(hit, _apply_merge(F.col("syms"), left, right))
            .otherwise(F.col("syms"))
            .alias("syms"),
            "wcount",
        )
        if (rank + 1) % _CHECKPOINT_EVERY == 0:
            words = words.localCheckpoint(eager=False)
    rows = [
        (int(i), left, right, cnt) for i, (left, right, cnt) in enumerate(merges)
    ]
    schema = "rank long, left string, right string, pair_count long"
    return spark.createDataFrame(rows, schema), merges


def bpe_segment(
    docs: DataFrame,
    merges: "list[tuple[str, str, int]] | list[tuple[str, str]]",
    text_col: str = "text",
) -> DataFrame:
    """Per-doc BPE token count under a learned merge table:
    (doc_id, n_words, n_bpe_tokens).

    Scale shape: the merge folds (sequential by construction) run over
    the DISTINCT-WORD table only; the corpus pass is explode -> word->
    n_pieces join -> one groupBy.  The join side is vocabulary-sized
    (10^6-10^8 rows for web text) so the broadcast decision is left to
    AQE rather than forced — same rationale as the LM context table
    (functions/lm.py): at real vocab sizes a forced driver broadcast is
    the OOM, not the win.  Docs whose text is empty count zero words
    and zero tokens (left join + coalesce)."""
    spark = docs.sparkSession
    toks = docs.select(
        "doc_id", F.explode(tokens(F.lower(F.col(text_col)))).alias("word")
    ).filter(F.col("word") != "")
    vocab = toks.select("word").distinct()
    pieces = None
    nrules = max(1, len(merges))
    vocab_cap = min(_DRIVER_VOCAB_MAX, _DRIVER_SEGMENT_OPS_MAX // nrules)
    if vocab_cap > 0:
        # guarded driver path (same bound discipline as bpe_train): the
        # distinct-word table is vocab-sized; segmenting it locally
        # replaces `len(merges)` chained fold plans with one local pass
        # and a broadcast-sized (word, n_pieces) relation.  The cap on
        # vocab x rules sends production-sized runs to the fold chain.
        probe = vocab.limit(vocab_cap + 1).collect()
        if len(probe) <= vocab_cap and (
            sum(len(r[0]) for r in probe) <= _DRIVER_VOCAB_CHAR_MAX
        ):
            rows = [
                (r[0], _segment_word_driver(r[0], merges)) for r in probe
            ]
            pieces = spark.createDataFrame(
                rows, "word string, n_pieces long"
            )
    if pieces is None:
        seg = vocab.select("word", _symbols(F.col("word")).alias("syms"))
        for i, rule in enumerate(merges):
            seg = seg.select(
                "word",
                _apply_merge(F.col("syms"), rule[0], rule[1]).alias("syms"),
            )
            if (i + 1) % _CHECKPOINT_EVERY == 0:
                seg = seg.localCheckpoint(eager=False)
        pieces = seg.select(
            "word", F.size("syms").cast("long").alias("n_pieces")
        )
    per_doc = (
        toks.join(pieces, "word")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_words"),
            F.sum("n_pieces").cast("long").alias("n_bpe_tokens"),
        )
    )
    return (
        docs.select("doc_id")
        .join(per_doc, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce(F.col("n_words"), F.lit(0)).cast("long").alias("n_words"),
            F.coalesce(F.col("n_bpe_tokens"), F.lit(0))
            .cast("long")
            .alias("n_bpe_tokens"),
        )
    )
