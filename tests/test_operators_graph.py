"""Connected components + transitive dedup groups + kmeans IVF."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from remote_shuffle_spark.operators.graph import connected_components, near_duplicate_groups


def test_connected_components_chain_and_islands(spark):
    # chain 1-2-3-4, pair 10-11, triangle 20-21-22
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11), (20, 21), (21, 22), (20, 22)],
        ["id_a", "id_b"],
    )
    comp = {r.vertex: r.component for r in connected_components(edges).collect()}
    assert comp == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10, 20: 20, 21: 20, 22: 20}


def test_connected_components_long_path_converges(spark):
    n = 30  # diameter 29 → needs label doubling... min-propagation needs ~n iters
    edges = spark.createDataFrame([(i, i + 1) for i in range(n)], ["id_a", "id_b"])
    comp = {r.vertex: r.component for r in connected_components(edges, max_iter=n + 1).collect()}
    assert set(comp.values()) == {0}
    assert len(comp) == n + 1


def test_connected_components_nonconvergence_raises(spark):
    # diameter 10 cannot converge in 1 round → must raise, never return
    # silently-split components (ADVICE round-1)
    edges = spark.createDataFrame([(i, i + 1) for i in range(10)], ["id_a", "id_b"])
    with pytest.raises(RuntimeError, match="did not converge"):
        connected_components(edges, max_iter=1)
    # warn mode returns (possibly wrong) labels with a RuntimeWarning
    with pytest.warns(RuntimeWarning, match="did not converge"):
        rows = connected_components(edges, max_iter=1, on_nonconverged="warn").collect()
    assert len(rows) == 11


def test_near_duplicate_groups_transitive(spark, sf_smoke):
    from remote_shuffle_spark.sources.tables import load_table

    docs = load_table(spark, sf_smoke, "documents").select("doc_id", "text").filter(
        F.col("doc_id") < 30
    )
    base = {r.doc_id: r.text for r in docs.collect()}
    # A(0) ≈ copy(40000) ≈ copy-of-copy(40001): transitivity must group all 3
    chain = spark.createDataFrame(
        [(40000, base[0]), (40001, base[0] + " extra"), (41000, base[1])],
        ["doc_id", "text"],
    )
    groups = near_duplicate_groups(
        docs.union(chain), "doc_id", "text", threshold=0.5, num_bands=8
    ).collect()
    by_group: dict[int, set] = {}
    for r in groups:
        by_group.setdefault(r.group_id, set()).add(r.doc_id)
    g0 = [g for g in by_group.values() if 0 in g]
    assert g0 and {0, 40000, 40001} <= g0[0]
    keepers = {r.doc_id for r in groups if r.is_keeper}
    assert 0 in keepers and 40000 not in keepers and 40001 not in keepers


def test_kmeans_centroids_contract(spark, sf_smoke):
    from remote_shuffle_spark.operators.clustering import kmeans_centroids
    from remote_shuffle_spark.operators.similarity import ivf_topk
    from remote_shuffle_spark.sources.tables import load_table

    emb = load_table(spark, sf_smoke, "embeddings")
    cents = kmeans_centroids(emb, "embedding", k=8)
    rows = cents.collect()
    assert len(rows) == 8
    assert all(len(r.cvec) == 64 for r in rows)
    assert sorted(r.cid for r in rows) == list(range(8))


def test_ivf_with_kmeans_centroids(spark, sf_smoke):
    from remote_shuffle_spark.operators.clustering import kmeans_centroids
    from remote_shuffle_spark.operators.similarity import brute_force_topk, ivf_topk
    from remote_shuffle_spark.sources.tables import load_table
    from pyspark.sql import functions as F

    emb = load_table(spark, sf_smoke, "embeddings")
    q = emb.filter(F.col("vec_id") == 0)
    cents = kmeans_centroids(emb, "embedding", k=8)
    approx = {
        r.vec_id
        for r in ivf_topk(
            emb, "vec_id", "embedding", q, k=10, nprobe=3, centroids=cents
        ).collect()
    }
    exact = {
        r.vec_id for r in brute_force_topk(emb, "vec_id", "embedding", q, k=10).collect()
    }
    assert 0 in approx
    # trained cells should give decent recall even at nprobe=3/8
    assert len(exact & approx) / 10 >= 0.3


def test_label_centroids_match_numpy(spark, sf_smoke):
    import numpy as np
    from remote_shuffle_spark.operators.clustering import label_centroids
    from remote_shuffle_spark.sources.tables import load_table

    emb = load_table(spark, sf_smoke, "embeddings")
    got = label_centroids(emb, "label", "embedding").collect()
    rows = emb.select("label", "embedding").collect()
    by_label = {}
    for r in rows:
        by_label.setdefault(r.label, []).append(np.array(r.embedding, dtype="float64"))
    for r in got:
        expect = np.mean(np.stack(by_label[r.label]), axis=0)
        assert abs(r.value - expect[r.pos]) < 1e-9

    # array form agrees with long form
    arr = {
        r.label: r.centroid
        for r in label_centroids(emb, "label", "embedding", long_form=False).collect()
    }
    for r in got:
        assert abs(arr[r.label][r.pos] - r.value) < 1e-12


def test_connected_components_durable_checkpoint_mode(spark, tmp_path):
    """checkpoint_dir routes the edge materialization through
    checkpoint_to (durable storage): (a) results match the local mode,
    (b) after the cut the UPSTREAM edges can vanish mid-loop with no
    recompute — the reference's executor-loss-no-recompute guarantee
    (DAGScheduler.scala:2038-2040) applied to the iterative operator,
    and (c) losing a materialized block fails LOUDLY via the manifest,
    never a silently shrunk component set."""
    import glob
    import os

    import pytest as _pytest
    from py4j.protocol import Py4JJavaError
    from pyspark.sql import functions as F

    from remote_shuffle_spark.operators.graph import connected_components

    src_dir = str(tmp_path / "edges_src")
    # two chains + an island pair: components {0..4}, {10..13}, {20,21}
    edges = [(i, i + 1) for i in range(4)] + [(i, i + 1) for i in range(10, 13)] + [(20, 21)]
    spark.createDataFrame(edges, "id_a long, id_b long").write.parquet(src_dir)
    edf = spark.read.parquet(src_dir)

    local = {
        (r.vertex, r.component)
        for r in connected_components(edf).collect()
    }
    ckpt = str(tmp_path / "cc_edges")
    durable_df = connected_components(edf, checkpoint_dir=ckpt)
    # poison upstream BEFORE collecting: a recompute past the cut would
    # see the mutated edge list (one giant component) or fail
    spark.createDataFrame([(0, 999)], "id_a long, id_b long").write.mode(
        "overwrite"
    ).parquet(src_dir)
    durable = {(r.vertex, r.component) for r in durable_df.collect()}
    assert durable == local
    assert durable and (999 not in {v for v, _ in durable})

    # losing a materialized block fails loudly (manifest integrity)
    part = sorted(glob.glob(os.path.join(ckpt, "part-*")))[0]
    os.remove(part)
    from remote_shuffle_spark.plans.shuffle_policy import (
        CheckpointIntegrityError,
        read_checkpoint,
    )

    with _pytest.raises((CheckpointIntegrityError, Py4JJavaError)):
        read_checkpoint(spark, ckpt).count()


def test_pagerank_properties(spark):
    """PageRank sanity on a known graph: (a) mass ≈ 1 (integer floor
    losses only), (b) the hub of a star out-ranks its leaves, (c) ranks
    are symmetric for symmetric nodes, (d) deterministic across
    repartitionings (integer fixed-point has no accumulation order)."""
    from pyspark.sql import functions as F

    from remote_shuffle_spark.operators.graph import pagerank

    # star: 0 - {1,2,3,4}; plus a detached pair 10-11
    edges = [(0, i) for i in range(1, 5)] + [(10, 11)]
    df = spark.createDataFrame(edges, "src long, dst long")
    out = {r.vertex: (r.rank_scaled, r.rank) for r in pagerank(df).collect()}
    total = sum(v for v, _ in out.values())
    assert 0.999 * 10**12 <= total <= 10**12  # floor losses < 0.1%
    assert out[0][0] > out[1][0]  # hub beats leaf
    assert out[1][0] == out[2][0] == out[3][0] == out[4][0]  # symmetry
    assert out[10][0] == out[11][0]
    again = {
        r.vertex: r.rank_scaled
        for r in pagerank(df.repartition(7, "dst")).collect()
    }
    assert again == {k: v for k, (v, _) in out.items()}


def test_bfs_levels_known_graph(spark):
    """BFS on a path + branch: exact hop distances, unreachable omitted,
    nonconvergence raises."""
    import pytest as _pytest
    from remote_shuffle_spark.operators.graph import bfs_levels

    # path 0-1-2-3, branch 1-10, island 50-51
    edges = [(0, 1), (1, 2), (2, 3), (1, 10), (50, 51)]
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {r.vertex: r.level for r in bfs_levels(df, 0).collect()}
    assert got == {0: 0, 1: 1, 2: 2, 10: 2, 3: 3}
    with _pytest.raises(RuntimeError, match="converge"):
        bfs_levels(df, 0, max_iter=2)


def test_pagerank_directed_dangling_mass(spark):
    """Directed chain 0→1→2: node 2 dangles.  Hand-check the first
    iteration's integer trajectory, then pin mass conservation and
    partition invariance (the dangling scalar must not depend on
    physical layout)."""
    from remote_shuffle_spark.operators.graph import pagerank_directed

    edges = [(0, 1), (1, 2)]
    df = spark.createDataFrame(edges, "src long, dst long")
    scale = 10**12
    one = {
        r.vertex: r.rank_scaled
        for r in pagerank_directed(df, iterations=1).collect()
    }
    # r0 = scale//3 each; D0 = r0(2); base = 15*scale//300
    r0 = scale // 3
    base = (15 * scale) // (100 * 3)
    share = r0 // 3  # dangling mass split over N=3
    assert one[0] == base + (85 * share) // 100  # no in-edges
    assert one[1] == base + (85 * (r0 + share)) // 100  # from 0 + dangling
    assert one[2] == base + (85 * (r0 + share)) // 100  # from 1 + dangling
    out = {
        r.vertex: r.rank_scaled
        for r in pagerank_directed(df, iterations=5).collect()
    }
    total = sum(out.values())
    assert 0.999 * scale <= total <= scale  # dangling mass NOT leaked
    again = {
        r.vertex: r.rank_scaled
        for r in pagerank_directed(df.repartition(5, "dst"), iterations=5).collect()
    }
    assert again == out
    # sanity vs the undirected variant: directed chain is asymmetric
    assert out[2] > out[1] > out[0]


def test_triangle_count_k4_with_noise_edges(spark):
    """K4 has exactly 4 triangles; duplicates, reversed orientations and
    self-loops must not change the count."""
    from remote_shuffle_spark.operators.graph import triangle_count

    edges = [(a, b) for a in range(1, 5) for b in range(1, 5) if a < b]
    noisy = edges + [(2, 1), (3, 3), (4, 3)] + edges[:2]
    df = spark.createDataFrame(noisy, "src long, dst long")
    (row,) = triangle_count(df).collect()
    assert (row.n_vertices, row.n_edges, row.n_triangles) == (4, 6, 4)


def test_triangle_count_path_graph_has_none(spark):
    from remote_shuffle_spark.operators.graph import triangle_count

    df = spark.createDataFrame([(1, 2), (2, 3), (3, 4)], "src long, dst long")
    (row,) = triangle_count(df).collect()
    assert (row.n_vertices, row.n_edges, row.n_triangles) == (4, 3, 0)


def test_label_propagation_two_cliques_converge(spark):
    """Two triangles joined by one bridge edge: after 3 synchronous
    min-tie iterations each triangle collapses onto its minimum vertex
    id (the bridge is outvoted by the in-clique majority)."""
    from remote_shuffle_spark.operators.graph import label_propagation

    tri1 = [(1, 2), (2, 3), (1, 3)]
    tri2 = [(10, 11), (11, 12), (10, 12)]
    bridge = [(3, 10)]
    df = spark.createDataFrame(tri1 + tri2 + bridge, "src long, dst long")
    got = {r.v: r.label for r in label_propagation(df, iterations=3).collect()}
    assert got[1] == got[2] == got[3] == 1
    assert got[10] == got[11] == got[12]
    assert got[10] != got[1]


def test_label_propagation_is_synchronous_and_min_tied(spark):
    """A path a-b-c: b's neighbors are {a, c} (tie) -> min label wins;
    synchronous update means round-1 labels derive only from round-0."""
    from remote_shuffle_spark.operators.graph import label_propagation

    df = spark.createDataFrame([(5, 7), (7, 9)], "src long, dst long")
    got = {r.v: r.label for r in label_propagation(df, iterations=1).collect()}
    # round 1 from initial labels: 5 sees {7}; 7 sees {5,9} tie -> 5; 9 sees {7}
    assert got == {5: 7, 7: 5, 9: 7}


def test_kcore_peel_cascade_and_fixpoint(spark):
    """Ring of 5 (2-core) with a 3-vertex tail: k=2 peels the tail one
    link per round (synchronous peeling removes only the current
    degree-1 endpoint), then reaches the ring fixpoint and removes 0."""
    from remote_shuffle_spark.operators.graph import kcore_peel

    ring = [(i, (i + 1) % 5) for i in range(5)]
    tail = [(4, 10), (10, 11), (11, 12)]
    edges = spark.createDataFrame(ring + tail, "src long, dst long")
    rows = {r.round: r for r in kcore_peel(edges, 2, rounds=4).collect()}
    # round 1: vertex 12 (degree 1) removed; 11 becomes degree 1 next
    assert rows[1].removed_vertices == 1 and rows[1].remaining_edges == 7
    assert rows[2].removed_vertices == 1 and rows[2].remaining_edges == 6
    assert rows[3].removed_vertices == 1 and rows[3].remaining_edges == 5
    # fixpoint: the ring is the 2-core
    assert rows[4].removed_vertices == 0
    assert rows[4].remaining_vertices == 5 and rows[4].remaining_edges == 5


def test_kcore_peel_simultaneous_removal(spark):
    """A star (center + 4 leaves) at k=2: every leaf has degree 1, so
    round 1 removes all four AT ONCE and the center is isolated out of
    the report (the documented vertices-with-residual-edges
    accounting)."""
    from remote_shuffle_spark.operators.graph import kcore_peel

    edges = spark.createDataFrame(
        [(0, i) for i in range(1, 5)], "src long, dst long"
    )
    rows = {r.round: r for r in kcore_peel(edges, 2, rounds=2).collect()}
    assert rows[1].removed_vertices == 4
    assert rows[1].remaining_vertices == 0 and rows[1].remaining_edges == 0
    assert rows[2].removed_vertices == 0


def test_common_neighbor_scores_square_and_path(spark):
    from remote_shuffle_spark.operators.graph import common_neighbor_scores

    # square 1-2-3-4-1: diagonals (1,3) and (2,4) share two neighbors and
    # are non-adjacent; every adjacent pair must be excluded.
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (1, 4)], ["src", "dst"]
    )
    out = {(r.u, r.v): (r.common, r.jacc_den) for r in
           common_neighbor_scores(edges, top_k=10).collect()}
    assert out == {(1, 3): (2, 2), (2, 4): (2, 2)}

    # path 1-2-3: single wedge -> one predicted link with Jaccard 1/1
    path = spark.createDataFrame([(1, 2), (2, 3)], ["src", "dst"])
    out = {(r.u, r.v): (r.common, r.jacc_den) for r in
           common_neighbor_scores(path, top_k=10).collect()}
    assert out == {(1, 3): (1, 1)}


def test_common_neighbor_scores_both_orientations(spark):
    """r11 ADVICE: feeding BOTH orientations of every edge must give the
    same scores as canonical edges — the operator normalizes internally
    (least/greatest + distinct), so degrees don't double-count and
    reversed adjacency can't leak into the non-adjacent output."""
    from remote_shuffle_spark.operators.graph import common_neighbor_scores

    canon = [(1, 2), (2, 3), (3, 4), (1, 4)]
    both = canon + [(b, a) for a, b in canon]
    edges = spark.createDataFrame(both, ["src", "dst"])
    out = {(r.u, r.v): (r.common, r.jacc_den) for r in
           common_neighbor_scores(edges, top_k=10).collect()}
    assert out == {(1, 3): (2, 2), (2, 4): (2, 2)}

    # reversed-only adjacency: edge stored as (3,1) must still exclude
    # the pair (1,3) from predictions (triangle 1-2-3 plus edge 3-1).
    tri = spark.createDataFrame([(1, 2), (2, 3), (3, 1)], ["src", "dst"])
    out = {(r.u, r.v) for r in common_neighbor_scores(tri, top_k=10).collect()}
    assert out == set()

    # NULL endpoints are inert, not self-loops: least/greatest would turn
    # (NULL,2) into (2,2) and inflate deg(2) — the operator must drop them.
    withnull = spark.createDataFrame(
        [(1, 2), (2, 3), (None, 2)], "src long, dst long"
    )
    out = {(r.u, r.v): (r.common, r.jacc_den) for r in
           common_neighbor_scores(withnull, top_k=10).collect()}
    assert out == {(1, 3): (1, 1)}

    # Self-loop edges (u,u) are dropped (r12 ADVICE): (2,2) would enter
    # adj twice, inflating deg(2) by 2 and making 2 its own wedge
    # neighbor — with the filter, the path 1-2-3 scores exactly as if
    # the loop were absent.
    withloop = spark.createDataFrame(
        [(1, 2), (2, 3), (2, 2)], "src long, dst long"
    )
    out = {(r.u, r.v): (r.common, r.jacc_den) for r in
           common_neighbor_scores(withloop, top_k=10).collect()}
    assert out == {(1, 3): (1, 1)}
