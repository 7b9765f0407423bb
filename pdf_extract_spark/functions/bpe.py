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

Per merge round, entirely in DataFrame ops:
  1. adjacent-pair counts weighted by word frequency — a `transform`
     over each word's symbol array, explode, groupBy(left, right) with
     map-side combine (overlapping pairs counted per position, the
     Sennrich convention);
  2. argmax pair with the deterministic tie-break
     (count DESC, left ASC, right ASC) — `orderBy(...).limit(1)` is a
     TakeOrdered (per-partition top-1, driver merges P candidates), NOT
     a global sort; the one-row collect per round is the same bounded
     driver coordination the IVF trainer documents
     (operators/similarity.py) — a scalar per round, never data;
  3. left-greedy merge application via an `aggregate` fold over each
     symbol array (merged symbols are the concatenated string, so a
     plain last-element match implements the greedy scan exactly);
     lineage is cut with a localCheckpoint every few rounds so round R
     never re-analyzes R nested folds.

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


def _apply_merge(syms: Column, left: str, right: str) -> Column:
    """Left-greedy single-rule merge: fold the symbol array, replacing
    the accumulator's last element with left||right whenever (last,
    current) matches the rule.  Because a merged symbol IS the
    concatenated string, matching the last element exactly reproduces
    the greedy left-to-right scan ('aaa' under (a,a) -> ['aa','a'])."""
    return F.aggregate(
        syms,
        F.array().cast("array<string>"),
        lambda acc, s: F.when(
            (F.size(acc) > 0)
            & (F.element_at(acc, -1) == F.lit(left))
            & (s == F.lit(right)),
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
    merges: list[tuple[str, str, int]] = []
    for rank in range(int(num_merges)):
        top = (
            words.select(F.explode(_adjacent_pairs(F.col("syms"))).alias("p"), "wcount")
            .groupBy("p.left", "p.right")
            .agg(F.sum("wcount").alias("pair_count"))
            .filter(F.col("pair_count") >= 2)
            .orderBy(F.col("pair_count").desc(), F.col("left"), F.col("right"))
            .limit(1)
            .collect()
        )
        if not top:
            break
        left, right, cnt = top[0]["left"], top[0]["right"], int(top[0]["pair_count"])
        merges.append((left, right, cnt))
        words = words.select(
            _apply_merge(F.col("syms"), left, right).alias("syms"), "wcount"
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
