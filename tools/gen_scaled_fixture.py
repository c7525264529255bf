"""Scale a driver fixture directory by an integer factor (sf0.1 -> sf1).

The driver's synthetic tables (TESTDATA.md) exist only up to sf0.1;
VERDICT r4/r5 "Next #1" requires a real 10x scale step so 100-TB claims
don't rest on plan shapes alone. This script materializes sfN as **N
disjoint key-shards of the base fixture**: every shard is a verbatim
copy of the base tables with all integer keys offset into a disjoint
range. That choice is deliberate:

- every per-shard distribution (value histograms, group sizes, join
  fan-outs, dup/near-dup density, band-bucket sizes) is EXACTLY the
  base fixture's, so runtime should scale ~linearly in the shard count
  and any nonlinearity the bench observes is the engine's, not the
  generator's;
- FK integrity holds by construction (fact keys are offset by the same
  unit as their dimension);
- correctness at sfN is still oracle-checkable: DuckDB reads the same
  parquet, so Spark-vs-oracle comparison is distribution-agnostic.

Two tables get a per-shard transform so the *semantic* density stays
constant instead of degenerating into cross-shard duplicates:

- ``documents``: shard r > 0 suffixes every whitespace token with a
  shard letter. Within-shard shingle/minhash/simhash structure is
  byte-identical to the base corpus; cross-shard token spaces are
  disjoint, so near-dup density per shard stays the base density
  (verbatim replication would instead give every doc 10 exact copies
  and blow up candidate-pair counts quadratically). ``n_chars`` is
  recomputed to keep the invariant n_chars == length(text).
- ``embeddings``: shard r > 0 applies an orthogonal transform
  (coordinate roll by r + a seeded sign flip). Orthogonality preserves
  every within-shard pairwise dot product and all norms exactly;
  cross-shard cosines decorrelate, so ANN/near-dup structure per shard
  is the base structure.

``region`` and ``nation`` are written verbatim once — TPC-H holds them
constant across scale factors, and every query joins them as broadcast
dims.

Deterministic: same inputs -> byte-stable outputs (fixed seeds, no
wall-clock). Output parquet preserves the base arrow schemas (including
int32 key columns and timestamp[us]).

Usage:
    python tools/gen_scaled_fixture.py [--base /root/testdata/sf0.1] \
        [--out testdata_sf1] [--shards 10]
"""

from __future__ import annotations

import argparse
import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

# key column -> its dimension's key-space size in the base fixture is
# computed from the data (max+1), so shards are dense and disjoint.
KEY_COLUMNS = {
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}

# each key column offsets by the unit of ITS key domain, shared between
# the dimension and every fact column referencing it
KEY_DOMAIN = {
    "c_custkey": ("customer", "c_custkey"),
    "s_suppkey": ("supplier", "s_suppkey"),
    "p_partkey": ("part", "p_partkey"),
    "o_orderkey": ("orders", "o_orderkey"),
    "o_custkey": ("customer", "c_custkey"),
    "l_orderkey": ("orders", "o_orderkey"),
    "l_partkey": ("part", "p_partkey"),
    "l_suppkey": ("supplier", "s_suppkey"),
    "event_id": ("events", "event_id"),
    # user_id is an FK into customer (base fixture: user_id in
    # [0, 1500) ⊂ c_custkey in [0, 15000)); offsetting by events' own
    # max+1 would point shard-r events at shard-(r/10)'s customers
    "user_id": ("customer", "c_custkey"),
    "doc_id": ("documents", "doc_id"),
    "vec_id": ("embeddings", "vec_id"),
}

VERBATIM = ["region", "nation"]


def _units(base: str) -> dict[str, int]:
    units: dict[str, int] = {}
    for col, (table, src_col) in KEY_DOMAIN.items():
        key = (table, src_col)
        if key not in units:
            t = pq.read_table(
                os.path.join(base, f"{table}.parquet"), columns=[src_col]
            )
            units[key] = int(pc.max(t[src_col]).as_py()) + 1
    return {col: units[dom] for col, dom in KEY_DOMAIN.items()}


def _offset_keys(table: pa.Table, name: str, r: int, units: dict[str, int]) -> pa.Table:
    for col in KEY_COLUMNS[name]:
        i = table.schema.get_field_index(col)
        typ = table.schema.field(i).type
        shifted = pc.add(table[col], pa.scalar(r * units[col], type=typ))
        table = table.set_column(i, table.schema.field(i), shifted.cast(typ))
    return table


def _shard_suffix(r: int, shards: int) -> str:
    """Per-shard token suffix. <= 26 shards keeps the original single
    letters (shard 1 -> 'b' ... — byte-identical output for the
    standing sf1 generation); beyond that, UNIFORM two-letter codes for
    every r > 0, so no suffix can be a proper extension of another and
    the SUFFIXED shards' token spaces stay pairwise disjoint at any
    shard count. Shard 0 is emitted verbatim, so a base-fixture token
    that happens to END in a valid suffix (e.g. '...ab') can still
    collide with a suffixed token from another shard — verbatim-vs-
    suffixed disjointness depends on the base vocabulary, only
    suffixed-vs-suffixed disjointness is guaranteed. (Measured on the standing
    31-token base vocabulary: zero single-letter extensions, so <= 26
    shards is collision-free; exactly one two-letter extension,
    'agg' = 'a' + 'gg', which would first fire at shards > 163 --
    far beyond any fixture we generate.) Prefer
    generating sfN DIRECTLY from the base fixture (one level): nesting
    (sf0.1 -> sf1 -> sf10) composes the suffix maps, and
    suffix-then-verbatim collides with verbatim-then-suffix — at the
    nested sf10 every shingle appears in exactly TWO shards (df 25 ->
    50, measured round 11), inflating candidate-pair volume ~4x beyond
    linear. That inflation is a generator artifact, not engine
    superlinearity (see docs/sf10_index_probe_r11.json)."""
    if shards <= 26:
        return chr(ord("a") + r)
    return chr(ord("a") + r // 26) + chr(ord("a") + r % 26)


def _mutate_documents(table: pa.Table, r: int, shards: int) -> pa.Table:
    if r == 0:
        return table
    suffix = _shard_suffix(r, shards)
    texts = table["text"].to_pylist()
    new_texts = [" ".join(tok + suffix for tok in t.split()) for t in texts]
    i_text = table.schema.get_field_index("text")
    table = table.set_column(
        i_text, table.schema.field(i_text), pa.array(new_texts, type=pa.string())
    )
    i_n = table.schema.get_field_index("n_chars")
    n_chars = pa.array([len(t) for t in new_texts], type=table.schema.field(i_n).type)
    return table.set_column(i_n, table.schema.field(i_n), n_chars)


def _mutate_embeddings(table: pa.Table, r: int) -> pa.Table:
    if r == 0:
        return table
    vecs = np.array(table["embedding"].to_pylist(), dtype=np.float32)
    # orthogonal per-shard transform: roll + seeded sign flip. Preserves
    # all within-shard dot products and norms; decorrelates cross-shard.
    signs = np.random.default_rng(1000 + r).choice(
        np.array([-1.0, 1.0], dtype=np.float32), size=vecs.shape[1]
    )
    vecs = np.roll(vecs, r, axis=1) * signs
    i = table.schema.get_field_index("embedding")
    col = pa.array(list(vecs), type=table.schema.field(i).type)
    return table.set_column(i, table.schema.field(i), col)


def generate(base: str, out: str, shards: int) -> None:
    os.makedirs(out, exist_ok=True)
    units = _units(base)
    for name in VERBATIM:
        src = pq.read_table(os.path.join(base, f"{name}.parquet"))
        pq.write_table(src, os.path.join(out, f"{name}.parquet"))
        print(f"{name}: {src.num_rows} rows (verbatim)")
    for name in KEY_COLUMNS:
        src = pq.read_table(os.path.join(base, f"{name}.parquet"))
        dst = os.path.join(out, f"{name}.parquet")
        # one row group per shard, streamed — peak memory stays ~1 shard
        with pq.ParquetWriter(dst, src.schema) as writer:
            for r in range(shards):
                shard = _offset_keys(src, name, r, units)
                if name == "documents":
                    shard = _mutate_documents(shard, r, shards)
                elif name == "embeddings":
                    shard = _mutate_embeddings(shard, r)
                writer.write_table(shard)
        print(f"{name}: {src.num_rows} x {shards} = {src.num_rows * shards} rows")


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--base", default="/root/testdata/sf0.1")
    ap.add_argument("--out", default="testdata_sf1")
    ap.add_argument("--shards", type=int, default=10)
    args = ap.parse_args()
    generate(args.base, args.out, args.shards)
