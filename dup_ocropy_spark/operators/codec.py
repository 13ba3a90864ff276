"""Distributed BPE codec training over a document corpus (L12 at scale).

Shape: the corpus collapses to a DISTINCT-WORD frequency table in one
shuffle (the standard BPE trick — 100 TB of text is ~10^8 distinct
words, a small DataFrame), then each merge round is

    explode adjacent symbol pairs (weighted by word count)
      -> groupBy(pair).sum  -> top-1 to the driver (2 strings)
      -> one mapInPandas merge pass over the word table

so driver state is only the merge list and per-round traffic is the
word table, never the corpus. localCheckpoint truncates the iterative
lineage (the topsort/connected-components rule). Merges are IDENTICAL
to the single-process kernel (``kernels/bpe.py``, test-pinned) because
both share the count-desc/lexicographic tie-break.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, functions as F

from dup_ocropy_spark.kernels import bpe


def corpus_word_counts(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(word, count) over the corpus — one explode + one shuffle."""
    words = F.explode(F.filter(F.split(F.col(text_col), r"\s+"),
                               lambda x: x != "")).alias("word")
    return docs.select(words).groupBy("word").agg(F.count("*").alias("count"))


def train_bpe(docs: DataFrame, n_merges: int = 64,
              text_col: str = "text") -> list[tuple[str, str]]:
    """-> the merge list (the codec artifact, driver-sized: 2 strings per
    merge). See module docstring for the per-round plan shape."""
    state = corpus_word_counts(docs, text_col)

    def symbolize(batches):
        for pdf in batches:
            yield pd.DataFrame({
                "syms": [list(bpe._symbolize(w)) for w in pdf["word"]],
                "count": pdf["count"],
            })

    state = state.mapInPandas(
        symbolize, schema="syms array<string>, count long").persist()
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        pair_idx = F.explode(
            F.when(F.size("syms") >= 2,
                   F.sequence(F.lit(0), F.size("syms") - 2))
            .otherwise(F.array().cast("array<int>"))).alias("i")
        pairs = (state.select("syms", "count", pair_idx)
                 .select(F.col("syms")[F.col("i")].alias("a"),
                         F.col("syms")[F.col("i") + 1].alias("b"),
                         "count")
                 .groupBy("a", "b").agg(F.sum("count").alias("n"))
                 # count desc, then lexicographic pair — the kernel's rule
                 .orderBy(F.desc("n"), "a", "b").limit(1).collect())
        if not pairs or pairs[0].n < 2:
            break
        a, b = pairs[0].a, pairs[0].b
        merges.append((a, b))

        def merge_stage(batches, a=a, b=b):
            for pdf in batches:
                yield pd.DataFrame({
                    "syms": [list(bpe.merge_pair(tuple(s), a, b))
                             for s in pdf["syms"]],
                    "count": pdf["count"],
                })

        new_state = state.mapInPandas(
            merge_stage, schema="syms array<string>, count long") \
            .localCheckpoint()
        state.unpersist()
        state = new_state.persist()
    state.unpersist()
    return merges


def bpe_token_counts(docs: DataFrame, merges: list[tuple[str, str]],
                     text_col: str = "text") -> DataFrame:
    """Append ``n_tokens_bpe_learned``: the document's token count under
    the TRAINED codec (vs token_counts' regex approximation) — the count
    a packing/budgeting stage should use once a codec exists. The merge
    list rides the task closure (2 strings per merge); encoding is the
    kernel's encode_word per distinct word of the doc, memoized per
    batch (Zipf: a few thousand distinct words cover most text)."""
    def stage(batches):
        for pdf in batches:
            cache: dict[str, int] = {}

            def count(text):
                if not isinstance(text, str) or not text:
                    return 0
                n = 0
                for w in text.split():
                    k = cache.get(w)
                    if k is None:
                        k = cache[w] = len(bpe.encode_word(w, merges))
                    n += k
                return n

            pdf = pdf.copy()
            pdf["n_tokens_bpe_learned"] = [count(t) for t in pdf[text_col]]
            yield pdf

    schema = ", ".join(f"{f.name} {f.dataType.simpleString()}"
                       for f in docs.schema.fields) \
        + ", n_tokens_bpe_learned long"
    return docs.mapInPandas(stage, schema=schema)
