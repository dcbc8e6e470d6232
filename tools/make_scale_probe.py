"""Synthesize the sf1 scale-probe corpus: 10 replicas of every sf0.1
table with FK-consistently shifted keys, written to
``.cache/scale_probe/sf1/``.

The driver materializes sf0.001/0.01/0.1 only (TESTDATA.md); probing
how each operator scales needs one more decade. Replication preserves
the driver's value distributions exactly (same text lengths, same FK
fan-outs, same skew) while scaling every key space linearly; replica
texts get a tiny per-replica suffix so the probe measures scaling of
the real near-dup workload, not a degenerate corpus where every
document has 10 exact copies. Fixed dims (region, nation) stay as-is,
like real dimension tables at scale.

DuckDB does the rewrite (single pass per table, no Spark session).
"""

from __future__ import annotations

import sys
from pathlib import Path

import duckdb

SRC = "/root/testdata/sf0.1"
DST = Path(__file__).resolve().parent.parent / ".cache" / "scale_probe" / "sf1"
REPLICAS = 10

# per-table key shifts: column -> rows-per-replica of the table that
# owns the key (FKs shift by the PARENT table's period)
N = {
    "customer": 15_000,
    "supplier": 1_000,
    "part": 20_000,
    "orders": 150_000,
    "events": 100_000,
    "documents": 5_000,
    "embeddings": 2_000,
}

SHIFTS: dict[str, dict[str, int]] = {
    "customer": {"c_custkey": N["customer"]},
    "supplier": {"s_suppkey": N["supplier"]},
    "part": {"p_partkey": N["part"]},
    "orders": {"o_orderkey": N["orders"], "o_custkey": N["customer"]},
    "lineitem": {
        "l_orderkey": N["orders"],
        "l_partkey": N["part"],
        "l_suppkey": N["supplier"],
    },
    "events": {"event_id": N["events"], "user_id": 10_000_000},
    "documents": {"doc_id": N["documents"]},
    "embeddings": {"vec_id": N["embeddings"]},
}


def build(force: bool = False) -> Path:
    DST.mkdir(parents=True, exist_ok=True)
    con = duckdb.connect()
    for table in (
        "region nation customer supplier part orders lineitem events "
        "documents embeddings"
    ).split():
        out = DST / f"{table}.parquet"
        if out.exists() and not force:
            continue
        src = f"read_parquet('{SRC}/{table}.parquet')"
        if table not in SHIFTS:  # fixed dims
            con.execute(f"COPY (SELECT * FROM {src}) TO '{out}'")
            continue
        cols = [
            r[0]
            for r in con.execute(f"DESCRIBE SELECT * FROM {src}").fetchall()
        ]
        sel = []
        for c in cols:
            if c in SHIFTS[table]:
                sel.append(f"({c} + k.k * {SHIFTS[table][c]}) AS {c}")
            elif table == "documents" and c == "text":
                sel.append(
                    "(text || CASE WHEN k.k = 0 THEN '' "
                    "ELSE ' r' || k.k END) AS text"
                )
            elif table == "documents" and c == "n_chars":
                # keep the stored length consistent with the suffix
                sel.append(
                    "(n_chars + CASE WHEN k.k = 0 THEN 0 "
                    "ELSE length(' r' || k.k) END)::BIGINT AS n_chars"
                )
            else:
                sel.append(c)
        q = (
            f"COPY (SELECT {', '.join(sel)} FROM {src}, "
            f"(SELECT unnest(range({REPLICAS})) AS k) k "
            f"ORDER BY k.k) TO '{out}'"
        )
        con.execute(q)
        n = con.execute(f"SELECT count(*) FROM '{out}'").fetchone()[0]
        print(f"{table}: {n} rows", file=sys.stderr)
    return DST


if __name__ == "__main__":
    print(build(force="--force" in sys.argv))
