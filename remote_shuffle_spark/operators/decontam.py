"""Benchmark decontamination (EXT — SURVEY §2.3): flag training documents
that share word n-grams with an evaluation/benchmark set.

The standard LLM-pipeline hygiene step (GPT-3 appendix C / PaLM-style
13-gram overlap): any training document containing an n-gram that also
appears in a held-out benchmark is contaminated and must be dropped or
audited before training.

Shape at 100 TB: the benchmark side is tiny relative to the corpus
(millions of n-grams vs billions of documents), so its distinct n-gram set
broadcasts; the train side is one narrow (id, gram) explode followed by a
broadcast LEFT SEMI join — no shuffle of the corpus, no all-pairs work.
The per-document hit aggregation is map-side combinable on the 8-byte id.
In production the join key would be ``xxhash64(gram)`` (8 bytes instead of
the gram string); the string form is kept here so an external SQL engine
can replay the join verbatim.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from remote_shuffle_spark.functions.hashing import tokens, word_shingles_from_tokens


def _doc_grams(df: DataFrame, id_col: str, text_col: str, n: int) -> DataFrame:
    """Distinct (id, gram) pairs per document.

    Tokenization is materialized in its own projection first (the HOF
    lambda re-evaluation trap — see word_shingles_from_tokens).  Documents
    shorter than ``n`` tokens contribute their whole-text shingle, so even
    one-token benchmark entries are matchable.
    """
    tk = df.select(F.col(id_col), tokens(text_col).alias("_tk"))
    return tk.select(
        F.col(id_col),
        F.explode(F.array_distinct(word_shingles_from_tokens(F.col("_tk"), n))).alias("gram"),
    )


def contamination_hits(
    train: DataFrame,
    bench: DataFrame,
    *,
    id_col: str,
    text_col: str,
    n: int = 5,
) -> DataFrame:
    """Per-train-document contamination: (id_col, n_hits) for documents
    sharing at least one word ``n``-gram with ``bench``.

    ``n_hits`` counts the DISTINCT contaminated n-grams in the document —
    the audit signal (1 hit = likely coincidence at small n; many hits =
    verbatim inclusion).  Documents with zero hits are absent (semi-join
    semantics); callers wanting the clean set anti-join on the result.
    """
    bench_grams = _doc_grams(bench, id_col, text_col, n).select("gram").distinct()
    train_grams = _doc_grams(train, id_col, text_col, n)
    hits = train_grams.join(F.broadcast(bench_grams), "gram", "left_semi")
    return hits.groupBy(id_col).agg(F.count(F.lit(1)).alias("n_hits"))
