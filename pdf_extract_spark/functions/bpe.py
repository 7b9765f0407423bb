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

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .text import tokens

# cut the fold-expression lineage every N merge rounds: keeps driver-side
# analysis cost linear in the number of merges instead of quadratic
_CHECKPOINT_EVERY = 4


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
    words = (
        word_histogram(docs, text_col)
        .select(_symbols(F.col("word")).alias("syms"), "wcount")
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
    toks = docs.select(
        "doc_id", F.explode(tokens(F.lower(F.col(text_col)))).alias("word")
    ).filter(F.col("word") != "")
    vocab = toks.select("word").distinct()
    seg = vocab.select("word", _symbols(F.col("word")).alias("syms"))
    for i, rule in enumerate(merges):
        seg = seg.select(
            "word", _apply_merge(F.col("syms"), rule[0], rule[1]).alias("syms")
        )
        if (i + 1) % _CHECKPOINT_EVERY == 0:
            seg = seg.localCheckpoint(eager=False)
    pieces = seg.select("word", F.size("syms").cast("long").alias("n_pieces"))
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
