"""User-defined function surface: Pandas UDF / grouped applyInPandas /
Python UDTF seams (SURVEY §2.3 — the reference's only "UDAF" seam is its
Aggregator[K,V,C] triple; this module is the engine's equivalent, Arrow-
vectorized end of that spectrum).

Rules of engagement at scale (enforced by example here):
- scalar math → built-in expressions (never Python);
- vectorized per-batch transforms → @pandas_udf (Arrow, zero-copy-ish);
- per-group reshapes Spark can't express → applyInPandas (one shuffle on
  the group key; each group must fit an executor's memory — document the
  skew guard);
- row→rows generators → Python UDTF (Spark 4) when explode()-style
  built-ins can't express the generation.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def grouped_zscore(
    df: DataFrame, group_col: str, value_col: str, *, ddof: int = 0
) -> DataFrame:
    """Per-group z-score via applyInPandas (grouped-map pandas UDF).

    The canonical applyInPandas shape: shuffle on the group key, whole
    group as one pandas frame per task.  Groups must fit in memory — for
    heavy-tailed group sizes prefer the pure-SQL window formulation
    (mean/stddev via Window) which this function intentionally mirrors so
    the two can be swap-tested.
    """
    out_schema = f"{group_col} string, {value_col} double, zscore double"

    def per_group(pdf: pd.DataFrame) -> pd.DataFrame:
        v = pdf[value_col].astype("float64")
        sd = v.std(ddof=ddof)
        z = (v - v.mean()) / sd if sd > 0 else v * 0.0
        return pd.DataFrame(
            {group_col: pdf[group_col], value_col: v, "zscore": z}
        )

    return df.select(group_col, value_col).groupBy(group_col).applyInPandas(
        per_group, out_schema
    )


def window_zscore(df: DataFrame, group_col: str, value_col: str) -> DataFrame:
    """Same semantics as :func:`grouped_zscore`, pure SQL window functions
    (population stddev) — the preferred form: codegen'd, no Python, no
    whole-group-in-memory requirement."""
    from pyspark.sql import Window as W

    w = W.partitionBy(group_col)
    mean = F.mean(value_col).over(w)
    sd = F.stddev_pop(value_col).over(w)
    z = F.when(sd > 0, (F.col(value_col) - mean) / sd).otherwise(F.lit(0.0))
    return df.select(group_col, value_col, z.alias("zscore"))


def batch_scaled(df: DataFrame, value_col: str, factor: float) -> DataFrame:
    """Minimal Arrow-batched scalar pandas UDF (iterator form — amortizes
    per-batch setup, the shape recommended for model-inference UDFs)."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("double")
    def scale(batches: Iterator[pd.Series]) -> Iterator[pd.Series]:
        for s in batches:
            yield s.astype("float64") * factor

    return df.withColumn(f"{value_col}_scaled", scale(F.col(value_col)))


def ngram_udtf_class():
    """Python UDTF (Spark 4): one row in → n-gram rows out.

    Returned lazily as a class so importing this module never requires the
    UDTF runtime.  Register with ``udtf(ngram_udtf_class(), returnType=...)``
    — see tests/test_operators_udf.py.  Built-in explode() covers most
    fan-outs; the UDTF seam is for generators with per-row logic.
    """

    class NGrams:
        def eval(self, doc_id: int, text: str, n: int):  # noqa: D401
            toks = (text or "").lower().split()
            for i in range(max(0, len(toks) - n + 1)):
                yield doc_id, " ".join(toks[i : i + n]), i

    return NGrams


def leading_words_udtf_class(n_cols: int = 3):
    """POLYMORPHIC Python UDTF (Spark 4 ``analyze``): output schema is
    computed at PLAN time from the constant width argument — the
    flagship UDTF capability beyond fixed-schema generators
    (:func:`ngram_udtf_class`).  ``analyze`` receives the call's
    arguments (constants carry ``.value``) and returns the
    ``AnalyzeResult`` schema: here ``w1..wN string`` for width N, so the
    SAME function registers once and different call sites get different
    shapes.  ``eval`` pads short texts with NULLs — total function, no
    row loss."""
    from pyspark.sql.functions import AnalyzeResult
    from pyspark.sql.types import StringType, StructField, StructType

    class LeadingWords:
        @staticmethod
        def analyze(text, width):
            n = int(width.value)
            return AnalyzeResult(
                schema=StructType(
                    [StructField(f"w{i+1}", StringType()) for i in range(n)]
                )
            )

        def eval(self, text, width):
            n = int(width)
            words = str(text).split() if text is not None else []
            yield tuple(words[i] if i < len(words) else None for i in range(n))

    return LeadingWords


def median_udaf():
    """GROUPED_AGG pandas UDF (the pandas-UDAF surface: a whole-group
    Series in, one scalar out, usable inside ``groupBy().agg`` next to
    built-ins).  Median is the deterministic choice for a float-returning
    UDAF: it is a function of the value SET (sort-based), immune to the
    accumulation-order nondeterminism that makes sum/mean-style float
    UDAFs hash-unstable across engines; the even-count midpoint (a+b)/2
    is exact for int inputs below 2^52."""
    import numpy as np
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("double")
    def _median(v: pd.Series) -> float:
        return float(np.median(v))

    return _median
