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


def contamination_matches(
    train: DataFrame,
    bench: DataFrame,
    *,
    id_col: str,
    text_col: str,
    n: int = 5,
    head: int = 5,
) -> DataFrame:
    """Contamination LOCALIZATION: per contaminated train document, the
    distinct-hit count plus the first ``head`` matched n-grams in
    lexicographic order — the audit view behind
    :func:`contamination_hits`'s counts (a reviewer deciding drop vs
    keep needs to SEE the overlap, not just its size).

    Same broadcast-semi shape as the counter, but the matched grams ride
    the join (plain inner semi-on-gram) into a per-document
    sort_array + slice: per-doc state is bounded by the document's own
    distinct contaminated grams (≤ its token count), never by the corpus
    — the corpus still never shuffles; only (id, gram) hit pairs do.
    """
    bench_grams = _doc_grams(bench, id_col, text_col, n).select("gram").distinct()
    hits = _doc_grams(train, id_col, text_col, n).join(
        F.broadcast(bench_grams), "gram", "left_semi"
    )
    return hits.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_hits"),
        F.array_join(
            F.slice(F.sort_array(F.collect_set("gram")), 1, head), ","
        ).alias("grams_head"),
    )


def semantic_contamination_hits(
    train: DataFrame,
    evalset: DataFrame,
    centroids: DataFrame,
    *,
    id_col: str,
    vec_col: str,
    threshold: float = 0.45,
    round_to: int | None = 6,
    assign_method: str = "auto",
    max_eval_rows: int = 1_000_000,
) -> DataFrame:
    """EMBEDDING-space decontamination (r13 verdict item 5): per train
    document, the number of eval-set embeddings in the SAME centroid cell
    at cosine ≥ ``threshold`` — catches paraphrased benchmark inclusion
    that n-gram overlap (:func:`contamination_hits`) misses entirely.
    Zero-hit documents are absent (semi semantics, matching the n-gram
    variant); callers wanting the clean set anti-join on the result.

    Shape at 100 TB — deliberately NOT the semantic-dedup cogroup: the
    eval side is tiny by contract (a benchmark, not a corpus), so its
    per-cell unit-normalized matrices broadcast once as a plain Python
    dict, and the TRAIN side streams through ``mapInPandas`` in Arrow
    batches — each batch does one (batch × eval-cell) numpy matmul.  No
    shuffle of the corpus, no per-cell group materialization, and no
    train-side cell cap (dedup needs one because it materializes c×c;
    here memory is bounded by batch × |eval-cell| regardless of how the
    corpus skews).  ``max_eval_rows`` guards the broadcast contract and
    fails loud instead of OOMing the driver.

    Both sides must be assigned against the SAME ``centroids`` table
    (pass ``similarity.seed_centroids`` / kmeans output over the full
    corpus); cell assignment uses the shared IVF argmax
    (``similarity.assign_ivf_cells``, ``round_to``-rounded cosine,
    larger cid on ties), so an external engine can replay the blocking
    exactly.  Like SemDeDup's blocking, a cross-cell near-neighbor is
    out of scope by construction — the cells ARE the operator's
    semantics, not a lossy shortcut being hidden.
    """
    from remote_shuffle_spark.functions.vectors import to_double_array
    from remote_shuffle_spark.operators.similarity import assign_ivf_cells

    import numpy as np
    import pandas as pd

    spark = train.sparkSession
    ev = assign_ivf_cells(
        evalset, id_col, vec_col, centroids, method=assign_method, round_to=round_to
    ).select(F.col("cell"), to_double_array(vec_col).alias("vec"))
    ev_rows = ev.collect()
    if len(ev_rows) > max_eval_rows:
        raise ValueError(
            f"eval set has {len(ev_rows)} rows > max_eval_rows={max_eval_rows}: "
            "the broadcast-eval contract assumes a benchmark-sized eval set; "
            "raise the cap explicitly if the driver can hold it"
        )
    by_cell: dict[int, np.ndarray] = {}
    for cell in {r.cell for r in ev_rows}:
        M = np.array([r.vec for r in ev_rows if r.cell == cell], dtype=np.float64)
        norms = np.linalg.norm(M, axis=1)
        by_cell[cell] = M / np.where(norms > 0.0, norms, 1.0)[:, None]
    bc = spark.sparkContext.broadcast(by_cell)

    assigned = assign_ivf_cells(
        train, id_col, vec_col, centroids, method=assign_method, round_to=round_to
    ).select(F.col(id_col), F.col("cell"), to_double_array(vec_col).alias("vec"))
    id_type = assigned.schema[id_col].dataType.simpleString()
    thr, rnd = float(threshold), round_to

    def _hit_batches(batches):
        mats = bc.value
        for pdf in batches:
            ids, hits = [], []
            for cell, sub in pdf.groupby("cell"):
                M = mats.get(cell)
                if M is None:
                    continue
                V = np.array(sub["vec"].tolist(), dtype=np.float64)
                norms = np.linalg.norm(V, axis=1)
                V = V / np.where(norms > 0.0, norms, 1.0)[:, None]
                sims = V @ M.T
                if rnd is not None:
                    sims = np.round(sims, rnd)
                h = (sims >= thr).sum(axis=1)
                mask = h > 0
                if mask.any():
                    ids.append(sub[id_col].to_numpy()[mask])
                    hits.append(h[mask])
            if ids:
                yield pd.DataFrame(
                    {
                        id_col: np.concatenate(ids),
                        "n_hits": np.concatenate(hits).astype("int64"),
                    }
                )

    return assigned.mapInPandas(_hit_batches, schema=f"{id_col} {id_type}, n_hits long")
