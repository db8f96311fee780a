"""Scale-up generator for optimization-round measurement ONLY.

Builds an sfN dataset by replicating /root/testdata/sf0.1 K times with
disjoint key universes per copy (FK integrity preserved within a copy)
and tail-mutated document copies so the near-dup family structure —
and therefore the candidate volume the near-dup operators must survive
— grows superlinearly like the driver's own sf1.0 telemetry
(BENCH_r06.json: ngram pairs 6k @ sf0.1 -> 1.02M @ sf1.0, a ~170x
growth at 10x docs).  Appending words keeps within-family Jaccard high
(shingle sets are nested), which is the same mechanism as the bench's
own ' extra tail' twins.

NOT driver data: the driver generates its own sf1.0.  This exists so
before/after measurements at the driver's escalated scale are possible
on this host.  Deterministic (no RNG at all).

Usage: python tools/make_sf.py [--out /root/sfbig/sf1.0] [--copies 10]
"""

from __future__ import annotations

import argparse
import os

import duckdb

SRC = "/root/testdata/sf0.1"

# words appended to document copy k (k>0): copy k gets TAILS[:k] joined.
# Mix of in-vocab and novel words: the cross-family repeated tail
# shingles exceed the MAX_DOC_FREQ guard exactly like ' extra tail'.
TAILS = ["spark", "table", "merge", "alpha", "beta", "gamma", "delta",
         "omega", "sigma"]

# per-table key shifts: column -> rows-per-copy stride
SHIFTS = {
    "customer": {"c_custkey": 15000},
    "orders": {"o_orderkey": 150000, "o_custkey": 15000},
    "lineitem": {"l_orderkey": 150000, "l_partkey": 20000, "l_suppkey": 1000},
    "part": {"p_partkey": 20000},
    "supplier": {"s_suppkey": 1000},
    "events": {"event_id": 100000, "user_id": 1500},
}
COPY_AS_IS = ["nation", "region"]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="/root/sfbig/sf1.0")
    ap.add_argument("--copies", type=int, default=10)
    args = ap.parse_args()
    os.makedirs(args.out, exist_ok=True)
    con = duckdb.connect()
    K = args.copies

    def write(name: str, sql: str) -> None:
        dest = os.path.join(args.out, f"{name}.parquet")
        con.execute(
            f"COPY ({sql}) TO '{dest}' (FORMAT parquet, CODEC zstd)"
        )
        n = con.execute(f"select count(*) from '{dest}'").fetchone()[0]
        print(f"  {name}: {n} rows")

    for name in COPY_AS_IS:
        write(name, f"SELECT * FROM '{SRC}/{name}.parquet'")

    for name, shifts in SHIFTS.items():
        cols = [r[0] for r in con.execute(
            f"describe select * from '{SRC}/{name}.parquet'").fetchall()]
        parts = []
        for k in range(K):
            sel = ", ".join(
                f"{c} + {k * stride} AS {c}" if (stride := shifts.get(c)) and k
                else c for c in cols
            )
            parts.append(f"SELECT {sel} FROM '{SRC}/{name}.parquet'")
        write(name, " UNION ALL ".join(parts))

    # documents: copy k appends TAILS[:k]; n_chars recomputed
    parts = []
    for k in range(K):
        tail = ("" if k == 0 else " " + " ".join(TAILS[:k])).replace("'", "")
        parts.append(
            f"SELECT doc_id + {k * 5000} AS doc_id, text || '{tail}' AS text,"
            f" lang, source, len(text || '{tail}') AS n_chars"
            f" FROM '{SRC}/documents.parquet'"
        )
    write("documents", " UNION ALL ".join(parts))

    # embeddings: copy k scaled elementwise by 1 + k*((i%5)-2)/20000 —
    # near-identical clusters (cosine ~0.999999), mirroring the heavy
    # candidate load of the driver's sf1.0 (3.6M embed candidates)
    parts = []
    for k in range(K):
        parts.append(
            f"SELECT vec_id + {k * 2000} AS vec_id,"
            f" CAST(list_transform(embedding, (x, i) ->"
            f"   x * (1 + {k} * (((i - 1) % 5) - 2) / 20000.0))"
            f"  AS FLOAT[]) AS embedding, label"
            f" FROM '{SRC}/embeddings.parquet'"
        )
    write("embeddings", " UNION ALL ".join(parts))
    print("done:", args.out)


if __name__ == "__main__":
    main()
