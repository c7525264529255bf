"""Invariants of the sfN shard-replication generator (tools/
gen_scaled_fixture.py) — the methodology behind the round-6 scale step.

The whole point of shard replication is that sfN is N EXACT copies of
the base distribution in disjoint key spaces: then linear runtime
scaling is the null hypothesis and any observed nonlinearity belongs to
the engine. These tests pin that construction on a tiny 2-shard build
so a future edit can't silently break the methodology."""

from __future__ import annotations

import numpy as np
import pyarrow.compute as pc
import pyarrow.parquet as pq
import pytest

from tools.gen_scaled_fixture import generate

BASE = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def sf2x(tmp_path_factory):
    out = str(tmp_path_factory.mktemp("sf2x"))
    generate(BASE, out, shards=2)
    return out


def _col(d, table, col):
    return pq.read_table(f"{d}/{table}.parquet", columns=[col])[col]


def test_row_counts_scale_and_dims_stay_fixed(sf2x):
    for t in ("customer", "orders", "lineitem", "events", "documents",
              "embeddings", "part", "supplier"):
        base_n = pq.ParquetFile(f"{BASE}/{t}.parquet").metadata.num_rows
        out_n = pq.ParquetFile(f"{sf2x}/{t}.parquet").metadata.num_rows
        assert out_n == 2 * base_n, t
    for t in ("region", "nation"):  # constant across SFs, like TPC-H
        assert (
            pq.ParquetFile(f"{sf2x}/{t}.parquet").metadata.num_rows
            == pq.ParquetFile(f"{BASE}/{t}.parquet").metadata.num_rows
        )


def test_keys_disjoint_and_fk_integrity_holds(sf2x):
    # shard key spaces are disjoint: scaled key count = 2x base
    for t, k in (("customer", "c_custkey"), ("orders", "o_orderkey"),
                 ("documents", "doc_id"), ("embeddings", "vec_id")):
        base = pc.count_distinct(_col(BASE, t, k)).as_py()
        out = pc.count_distinct(_col(sf2x, t, k)).as_py()
        assert out == 2 * base, t
    # every fact FK resolves to its dimension (offset by the same unit)
    custkeys = set(_col(sf2x, "customer", "c_custkey").to_pylist())
    assert set(_col(sf2x, "orders", "o_custkey").to_pylist()) <= custkeys
    orderkeys = set(_col(sf2x, "orders", "o_orderkey").to_pylist())
    assert set(_col(sf2x, "lineitem", "l_orderkey").to_pylist()) <= orderkeys
    suppkeys = set(_col(sf2x, "supplier", "s_suppkey").to_pylist())
    assert set(_col(sf2x, "lineitem", "l_suppkey").to_pylist()) <= suppkeys
    # events.user_id rides the CUSTOMER key domain (user_id ⊂ c_custkey
    # in the base fixture) — shard-r events must reference shard-r
    # customers, not shard-0's
    assert set(_col(sf2x, "events", "user_id").to_pylist()) <= custkeys


def test_non_key_distributions_are_verbatim_copies(sf2x):
    # value distributions per shard are the base's, exactly
    base_vals = sorted(_col(BASE, "lineitem", "l_extendedprice").to_pylist())
    out_vals = sorted(_col(sf2x, "lineitem", "l_extendedprice").to_pylist())
    assert out_vals == sorted(base_vals * 2)


def test_document_shards_have_disjoint_tokens_same_shape(sf2x):
    docs = pq.read_table(f"{sf2x}/documents.parquet").to_pandas()
    n = len(docs) // 2
    s0, s1 = docs.iloc[:n], docs.iloc[n:]
    # within-shard structure identical: token-count sequence matches
    assert [len(t.split()) for t in s0["text"]] == [
        len(t.split()) for t in s1["text"]
    ]
    # n_chars stays consistent with the mutated text
    assert (s1["n_chars"] == s1["text"].str.len()).all()
    # cross-shard token spaces disjoint -> no cross-shard exact or
    # shingle dups; per-shard dup density is the base corpus's
    tok0 = set(s0["text"].iloc[0].split())
    tok1 = set(s1["text"].iloc[0].split())
    assert not (tok0 & tok1)


def test_embedding_transform_is_orthogonal(sf2x):
    emb = pq.read_table(f"{sf2x}/embeddings.parquet").to_pandas()
    n = len(emb) // 2
    v0 = np.array(emb["embedding"].iloc[:n].tolist(), dtype=np.float64)
    v1 = np.array(emb["embedding"].iloc[n:].tolist(), dtype=np.float64)
    # norms and all within-shard pairwise dot products preserved exactly
    assert np.allclose(np.linalg.norm(v0, axis=1), np.linalg.norm(v1, axis=1))
    g0 = v0[:50] @ v0[:50].T
    g1 = v1[:50] @ v1[:50].T
    assert np.allclose(g0, g1)
    # but shards are decorrelated: a vector is NOT its own copy
    assert not np.allclose(v0[:50], v1[:50])
