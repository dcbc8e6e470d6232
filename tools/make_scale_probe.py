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
DST_DISTINCT = DST.parent / "sf1_distinct"
DST_EVENTS = DST.parent / "sf1_events"
REPLICAS = 10

# Distinct-doc mode: the default replica corpus keeps each document a
# true near-duplicate of its 9 replicas (tiny suffix), so pair-set
# outputs grow ~quadratically BY CONSTRUCTION — right for stressing
# worst-case duplication, wrong for measuring how the dedup family
# scales on organically distinct data. Distinct mode instead rewrites
# each replica's text through a per-replica letter rotation (length-
# preserving, deterministic): cross-replica shingle overlap collapses
# below the Jaccard threshold while the corpus's own within-replica
# near-dups are preserved verbatim under every rotation — the pair set
# grows ~linearly (10x), like real data. Embeddings rotate positions
# per replica for the same reason (cosine(v, rot_k(v)) is far from 1).
_ROT_ALPHABET = "aeiounrstlc"  # 11 letters -> 10 distinct rotations


def _rotation(k: int) -> str:
    return _ROT_ALPHABET[k:] + _ROT_ALPHABET[:k]

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


def _distinct_text_expr(base: str) -> str:
    """Per-replica letter-rotation rewrite of ``base`` (a text-typed
    SQL expression): one CASE branch per replica, identity at k=0."""
    branches = " ".join(
        f"WHEN {k} THEN translate({base}, '{_ROT_ALPHABET}', '{_rotation(k)}')"
        for k in range(1, REPLICAS)
    )
    return f"CASE k.k WHEN 0 THEN {base} {branches} END"


def build(
    force: bool = False, distinct: bool = False, events_only: bool = False
) -> Path:
    """``events_only``: the events-AXIS corpus — ONLY the events table
    replicates (10x users via the shifted user_id, same per-user event
    count and the same time range), every other table stays at sf0.1.
    The behavioral-analytics family (funnel/cohort/cube/sessions)
    scales on users x time, not docs, so this isolates its axis."""
    dst = DST_EVENTS if events_only else (DST_DISTINCT if distinct else DST)
    dst.mkdir(parents=True, exist_ok=True)
    con = duckdb.connect()
    for table in (
        "region nation customer supplier part orders lineitem events "
        "documents embeddings"
    ).split():
        out = dst / f"{table}.parquet"
        if out.exists() and not force:
            continue
        src = f"read_parquet('{SRC}/{table}.parquet')"
        if table not in SHIFTS or (events_only and table != "events"):
            # fixed dims — and in events-axis mode, everything else
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
                suffixed = (
                    "(text || CASE WHEN k.k = 0 THEN '' "
                    "ELSE ' r' || k.k END)"
                )
                if distinct:
                    sel.append(f"{_distinct_text_expr(suffixed)} AS text")
                else:
                    sel.append(f"{suffixed} AS text")
            elif table == "documents" and c == "n_chars":
                # keep the stored length consistent with the suffix
                # (the distinct-mode rotation is length-preserving)
                sel.append(
                    "(n_chars + CASE WHEN k.k = 0 THEN 0 "
                    "ELSE length(' r' || k.k) END)::BIGINT AS n_chars"
                )
            elif table == "embeddings" and c == "embedding" and distinct:
                # rotate vector positions per replica: cosine between a
                # vector and its rotation is far from 1, so replicas
                # stop being embedding near-dups (k=0 slice is empty →
                # identity)
                sel.append(
                    "list_concat(embedding[k.k + 1:], "
                    "embedding[1:k.k]) AS embedding"
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
    return dst


if __name__ == "__main__":
    print(
        build(
            force="--force" in sys.argv,
            distinct="--distinct" in sys.argv,
            events_only="--events" in sys.argv,
        )
    )
