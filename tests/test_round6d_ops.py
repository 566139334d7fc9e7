"""Semantic pins for the round-6d operators:

- triangle counting: a crafted K4 clique (identical embeddings — the
  guaranteed-edge construction) must yield n_tri == 3 for each clique
  member and total participation divisible by 3; an open wedge
  (hub similar to two mutually-orthogonal spokes) must NOT close; the
  whole fixture is also differentially checked against the DuckDB
  oracle (the stock sf0.01 fixture has ZERO triangles, so without
  this the closure join is only trivially exercised);
- containment: a short document pasted verbatim into a longer one
  must give containment 1.0 from the short side, no reverse pair,
  and NO llm_dedup_ngram Jaccard pair — the exact sub-document
  duplication case Jaccard structurally misses.
"""

from __future__ import annotations

import os

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from lsd_spark.registry import ORACLES, QUERIES, load_all

load_all()


@pytest.fixture(scope="module")
def triangle_dir(tmp_path_factory):
    """11 vectors, dim 8, controlled cosines (exact float64 dots):
    vecs 0-3 identical (K4, pairwise cos 1); vec 4 is a hub at 45
    degrees between dims 2/3; vecs 5/6 are the orthogonal spokes
    (cos(hub, spoke) = 1/sqrt(2) >= 0.45, cos(spoke, spoke) = 0 —
    an open wedge); vecs 7-10 are mutually-orthogonal basis fillers
    with no edges at all."""
    vecs = np.zeros((11, 8), dtype=np.float32)
    vecs[0:4, 0] = 9.0
    vecs[4, 2] = 3.0
    vecs[4, 3] = 3.0
    vecs[5, 2] = 9.0
    vecs[6, 3] = 9.0
    for i, d in enumerate(range(4, 8)):
        vecs[7 + i, d] = 9.0
    tbl = pa.table(
        {
            "vec_id": pa.array(range(11), pa.int64()),
            "embedding": pa.array(
                [list(map(float, v)) for v in vecs], pa.list_(pa.float32())
            ),
            "label": pa.array([0] * 11, pa.int32()),
        }
    )
    d = tmp_path_factory.mktemp("triangles")
    pq.write_table(tbl, str(d / "embeddings.parquet"))
    return str(d)


def test_triangle_k4_and_open_wedge(spark, triangle_dir):
    out = QUERIES["graph_triangle_count"](spark, triangle_dir).toPandas()
    by_node = {int(r.node): (int(r.degree), int(r.n_tri)) for r in out.itertuples(index=False)}
    # K4: every member has degree >= 3 (its three clique partners)
    # and EXACTLY C(3,2) = 3 triangles — identical embeddings pair
    # through the collapse path, so these edges are bucketing-proof
    for n in range(4):
        assert by_node[n][1] == 3, by_node
        assert by_node[n][0] == 3, by_node
    # total participation is 3 per triangle
    assert sum(t for _, t in by_node.values()) % 3 == 0
    # the open wedge never closes: the spokes are orthogonal, so
    # whatever bucketing did to the hub edges, no spoke-spoke
    # triangle can exist
    for n in (5, 6):
        if n in by_node:
            assert by_node[n][1] == 0, by_node
    # orthogonal fillers form no edges: degree table excludes them
    assert all(n not in by_node for n in range(7, 11)), by_node


def test_triangle_matches_duckdb_on_crafted_fixture(spark, triangle_dir):
    got = QUERIES["graph_triangle_count"](spark, triangle_dir).toPandas()
    con = duckdb.connect()
    con.sql(
        "CREATE VIEW embeddings AS SELECT * FROM "
        f"'{triangle_dir}/embeddings.parquet'"
    )
    want = con.sql(ORACLES["graph_triangle_count"]).df()
    con.close()
    g = sorted(map(tuple, got.astype(int).itertuples(index=False)))
    w = sorted(map(tuple, want.astype(int).itertuples(index=False)))
    assert g == w


@pytest.fixture(scope="module")
def containment_dir(tmp_path_factory):
    """doc 1 = 30 unique tokens; doc 2 = doc 1's text + 60 more
    unique tokens (the paste-into-longer-page case); doc 3 unrelated."""
    short = " ".join(f"w{i}" for i in range(30))
    long = short + " " + " ".join(f"x{i}" for i in range(60))
    other = " ".join(f"z{i}" for i in range(40))
    d = tmp_path_factory.mktemp("containment")
    pd.DataFrame(
        {"doc_id": [1, 2, 3], "text": [short, long, other]}
    ).to_parquet(os.path.join(d, "documents.parquet"))
    return str(d)


def test_containment_short_inside_long(spark, containment_dir):
    out = QUERIES["llm_dedup_containment"](spark, containment_dir).toPandas()
    got = {(int(r.doc_a), int(r.doc_b)): float(r.containment)
           for r in out.itertuples(index=False)}
    # every 3-shingle of the short doc appears verbatim in the long
    # one (the junction shingles belong only to the long doc)
    assert got == {(1, 2): 1.0}
    # the reverse direction is far below threshold: 28 shared of the
    # long doc's 88 shingles
    assert (2, 1) not in got


def test_containment_is_invisible_to_jaccard(spark, containment_dir):
    """The motivating property: the same pair has Jaccard 28/88 ~=
    0.32 < 0.5, so the symmetric n-gram dedup does NOT emit it."""
    out = QUERIES["llm_dedup_ngram"](spark, containment_dir).toPandas()
    pairs = {(int(r.doc_a), int(r.doc_b)) for r in out.itertuples(index=False)}
    assert (1, 2) not in pairs and (2, 1) not in pairs


def test_quantile_sketch_within_one_bin_of_exact(spark):
    """The sketch's stated error bound is the bin width (1.0):
    every estimate must be the floor of a value at-or-below the
    exact quantile's bin neighborhood, independently recomputed
    with numpy's inverted_cdf (the same rank definition)."""
    from tests.conftest import SF_DIR

    out = QUERIES["agg_quantile_sketch"](spark, SF_DIR).toPandas()
    ev = pd.read_parquet(os.path.join(SF_DIR, "events.parquet"))
    ev = ev[ev.value.notna()]
    for r in out.itertuples(index=False):
        vals = np.sort(ev[ev.event_type == r.event_type].value.values)
        assert r.n == len(vals)
        for pct, got in ((50, r.p50_est), (95, r.p95_est), (99, r.p99_est)):
            exact = vals[int(np.ceil(pct / 100 * len(vals))) - 1]
            assert abs(got - np.floor(exact)) <= 1, (r.event_type, pct, got, exact)
