"""Build an R×-replicated copy of a testdata SF for scaling runs.

VERDICT r4 #8 (empirical 100× evidence): the cheapest proof that the
"no scale-killer" plan audit translates to data is a measured
wall-time slope across a data-size decade. This tool replicates
/root/testdata/sf0.1 R times into a local directory (NOT committed;
.scale/ is gitignored) with per-replica transformations that keep the
workload's STRUCTURE realistic instead of degenerate:

- every bigint entity key shifts by r·|entity| per replica r (DENSE
  offsets: the source keys are 0..N-1, so the replicated key space is
  0..R·N-1 with no holes), so joins stay valid within a replica, keys
  never collide across replicas, and density-dependent derivations —
  the in-query partsupp assigns suppliers by ``% COUNT(supplier)`` —
  keep their selectivity (a 10^7 shift was measured to collapse q9's
  partsupp join to the replica-0 slice);
- document text passes through a per-replica consonant permutation
  (translate()), so WITHIN-replica near-dup structure is preserved
  exactly (both sides of a pair transform identically) while
  CROSS-replica shingles diverge — otherwise every duplicate cluster
  would grow R× and candidate-pair volume R²×, which no real corpus
  growth does;
- embeddings get per-replica seeded Gaussian noise (σ=0.05) and new
  ids — same geometry statistics, no identical-vector twins across
  replicas (identical twins would make kNN degenerate: every vector's
  nearest neighbor is its own copy at cosine 1.0);
- region/nation are fixed-cardinality dims (5/25 rows) and are copied
  once, like TPC-H's constant dimension tables.

Usage: python tools/make_scale.py [R] [src_sf_dir] [out_dir]
       (defaults: 10 /root/testdata/sf0.1 /root/repo/.scale/sf1)
"""

from __future__ import annotations

import os
import string
import sys

import duckdb
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

# key column -> (entity table, entity key) whose cardinality is the
# per-replica offset; FK columns shift by their REFERENCED entity's
# cardinality so every foreign key stays valid
ENTITY_OF = {
    "c_custkey": ("customer", "c_custkey"),
    "s_suppkey": ("supplier", "s_suppkey"),
    "p_partkey": ("part", "p_partkey"),
    "o_orderkey": ("orders", "o_orderkey"),
    "o_custkey": ("customer", "c_custkey"),
    "l_orderkey": ("orders", "o_orderkey"),
    "l_partkey": ("part", "p_partkey"),
    "l_suppkey": ("supplier", "s_suppkey"),
    "event_id": ("events", "event_id"),
    "user_id": ("events", "user_id"),
    "doc_id": ("documents", "doc_id"),
}

SHIFT_TABLES = [
    "customer", "supplier", "part", "orders", "lineitem", "events",
    "documents",
]

CONSONANTS = "bcdfghjklmnpqrstvwxz"
VOWELS = "aeiou"


def consonant_map(r: int) -> tuple[str, str]:
    """Deterministic per-replica letter permutation (replica 0 =
    identity): consonant rotation keyed on r, COMPOSED with a vowel
    rotation keyed on r // 20 and a sub-rotation of the first 10
    consonant TARGETS keyed on r // 100 — 20·5·10 = 1000 distinct
    permutations, so up to 1000 replicas have pairwise-distinct
    transforms (with only the consonant rotation, replicas 20 apart
    shared a permutation and became cross-replica near-duplicates —
    measured to inflate the 100× MinHash pair count ~40×; the
    sub-rotation extends the same fix to the 1000× replica).
    Permutations keep text length, whitespace, and word shape — only
    shingle identities change."""
    crot = r % len(CONSONANTS)
    vrot = (r // len(CONSONANTS)) % len(VOWELS)
    srot = (r // (len(CONSONANTS) * len(VOWELS))) % 10
    c_dst = CONSONANTS[crot:] + CONSONANTS[:crot]
    # second independent key: rotate the first 10 TARGET slots (still
    # a permutation of the alphabet; distinct srot ⇒ distinct map)
    c_dst = c_dst[srot:10] + c_dst[:srot] + c_dst[10:]
    v_dst = VOWELS[vrot:] + VOWELS[:vrot]
    src = CONSONANTS + VOWELS
    dst = c_dst + v_dst
    return src + src.upper(), dst + dst.upper()


def main() -> None:
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    src = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    out = sys.argv[3] if len(sys.argv) > 3 else "/root/repo/.scale/sf1"
    os.makedirs(out, exist_ok=True)
    con = duckdb.connect()

    for t in ["region", "nation"]:
        con.sql(
            f"COPY (SELECT * FROM '{src}/{t}.parquet') TO "
            f"'{out}/{t}.parquet' (FORMAT PARQUET)"
        )
        print(f"{t}: copied once (fixed dim)")

    # per-entity dense offsets: user_id's cardinality is its distinct
    # count (events carries ~67 rows per user), everything else is the
    # entity table's row count (keys are 0..N-1 in the shipped data)
    card: dict[tuple[str, str], int] = {}
    for ent, key in set(ENTITY_OF.values()):
        card[(ent, key)] = con.sql(
            f"SELECT COUNT(DISTINCT {key}) FROM '{src}/{ent}.parquet'"
        ).fetchone()[0]

    # replicas are written in ≤50-branch UNION chunks: a single
    # 1000-branch UNION ALL blows DuckDB's max_expression_depth, so
    # past one chunk the target becomes a DIRECTORY of part files —
    # Spark (and DuckDB's glob) read it exactly like a single file
    CHUNK = 50
    for t in SHIFT_TABLES:
        schema = [
            (c[0], c[1])
            for c in con.sql(
                f"DESCRIBE SELECT * FROM '{src}/{t}.parquet'"
            ).fetchall()
        ]

        def replica_select(r: int) -> str:
            cols = []
            for name, _dtype in schema:
                if name in ENTITY_OF:
                    off = r * card[ENTITY_OF[name]]
                    cols.append(f"({name} + {off}) AS {name}")
                elif t == "documents" and name == "text" and r > 0:
                    s, d = consonant_map(r)
                    cols.append(f"translate(text, '{s}', '{d}') AS text")
                else:
                    cols.append(name)
            return f"SELECT {', '.join(cols)} FROM '{src}/{t}.parquet'"

        if reps <= CHUNK:
            union = " UNION ALL ".join(replica_select(r) for r in range(reps))
            con.sql(
                f"COPY ({union}) TO '{out}/{t}.parquet' (FORMAT PARQUET)"
            )
            target = f"'{out}/{t}.parquet'"
        else:
            d = f"{out}/{t}.parquet"
            if os.path.isdir(d):
                for f in os.listdir(d):
                    os.remove(os.path.join(d, f))
            os.makedirs(d, exist_ok=True)
            for i, lo in enumerate(range(0, reps, CHUNK)):
                union = " UNION ALL ".join(
                    replica_select(r) for r in range(lo, min(reps, lo + CHUNK))
                )
                con.sql(
                    f"COPY ({union}) TO '{d}/part-{i:04d}.parquet' "
                    f"(FORMAT PARQUET)"
                )
            target = f"'{d}/part-*.parquet'"
        n = con.sql(f"SELECT COUNT(*) FROM {target}").fetchone()[0]
        print(f"{t}: {n} rows ({reps}x)", flush=True)

    # embeddings: numpy perturbation per replica
    tbl = pq.read_table(f"{src}/embeddings.parquet")
    ids = tbl.column("vec_id").to_numpy()
    labels = tbl.column("label").to_numpy()
    emb = np.stack(
        [np.asarray(v, dtype=np.float32) for v in tbl.column("embedding").to_pylist()]
    )
    out_ids, out_emb, out_lab = [], [], []
    for r in range(reps):
        rng = np.random.default_rng(20260814 + r)
        noise = (
            np.zeros_like(emb)
            if r == 0
            else rng.normal(0.0, 0.05, emb.shape).astype(np.float32)
        )
        out_ids.append(ids + r * len(ids))
        out_emb.append(emb + noise)
        out_lab.append(labels)
    all_emb = np.concatenate(out_emb)
    arr = pa.FixedSizeListArray.from_arrays(
        pa.array(all_emb.reshape(-1), type=pa.float32()), emb.shape[1]
    ).cast(pa.list_(pa.float32()))
    pq.write_table(
        pa.table(
            {
                "vec_id": pa.array(np.concatenate(out_ids), type=pa.int64()),
                "embedding": arr,
                "label": pa.array(
                    np.concatenate(out_lab), type=pa.int32()
                ),
            }
        ),
        f"{out}/embeddings.parquet",
    )
    print(f"embeddings: {len(all_emb)} rows ({reps}x)")
    print(f"done -> {out}")


if __name__ == "__main__":
    main()
