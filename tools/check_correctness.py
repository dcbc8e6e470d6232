"""Local replica of the driver's t2 gate: run every queries() entry on
Spark and its oracle_sql() on DuckDB at sf0.01, compare row count, column
names, and order-insensitive values.

Usage: python tools/check_correctness.py [name ...] [--sf DIR]
"""

from __future__ import annotations

import math
import sys
import time
from pathlib import Path

import duckdb

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import __spark_entry__ as entrymod
from rag_database_spark.session import get_spark
from rag_database_spark.sources.tables import TABLES


class ListCellError(TypeError):
    """A result cell is a list/tuple — the driver's canonicalizer cannot
    hash it, so the local gate must fail it too (not stringify it)."""


def normalize(rows, colnames):
    out = []
    for row in rows:
        vals = []
        for i, v in enumerate(row):
            if isinstance(v, float):
                if math.isnan(v):
                    vals.append("NaN")
                else:
                    # full precision, matching the driver's value hash
                    # (6dp rounding here masked cross-engine ulp drift)
                    vals.append(repr(v))
            elif isinstance(v, (list, tuple)):
                raise ListCellError(
                    f"column {colnames[i]!r} holds a list cell {v!r}: "
                    "stringify array outputs at the entry boundary "
                    "(array_join / to_json on BOTH engines)"
                )
            else:
                vals.append(str(v))
        out.append(tuple(vals))
    return sorted(out)


def main() -> int:
    # positional names select entries; comma lists split (a,b,c)
    args = [
        n
        for a in sys.argv[1:]
        if not a.startswith("--")
        for n in a.split(",")
        if n
    ]
    sf_dir = "/root/testdata/sf0.01"
    for i, a in enumerate(sys.argv[1:]):
        if a == "--sf":
            sf_dir = sys.argv[1:][i + 1]
            args = [x for x in args if x != sf_dir]

    spark = get_spark("check_correctness")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    names = args or list(qs)
    failures = []
    for name in names:
        t0 = time.time()
        sdf = qs[name](spark, sf_dir)
        s_cols = sdf.columns
        s_rows = [tuple(r) for r in sdf.collect()]
        t_spark = time.time() - t0
        if name not in oracles:
            print(f"{name}: rows-only check, {len(s_rows)} rows "
                  f"(no oracle) [{t_spark:.1f}s]")
            if len(s_rows) == 0:
                failures.append(name)
            continue
        t0 = time.time()
        res = con.execute(oracles[name])
        d_cols = [c[0] for c in res.description]
        d_rows = res.fetchall()
        t_duck = time.time() - t0

        ok = True
        if sorted(s_cols) != sorted(d_cols):
            print(f"{name}: SCHEMA MISMATCH spark={s_cols} duck={d_cols}")
            ok = False
        if len(s_rows) != len(d_rows):
            print(f"{name}: ROWCOUNT MISMATCH spark={len(s_rows)} duck={len(d_rows)}")
            ok = False
        if ok:
            # align column order by name
            d_idx = [d_cols.index(c) for c in s_cols]
            d_rows_al = [tuple(r[i] for i in d_idx) for r in d_rows]
            try:
                sn = normalize(s_rows, s_cols)
                dn = normalize(d_rows_al, s_cols)
            except ListCellError as e:
                print(f"{name}: LIST CELL — {e}")
                failures.append(name)
                continue
            if sn != dn:
                diff = [(a, b) for a, b in zip(sn, dn) if a != b][:5]
                print(f"{name}: VALUE MISMATCH ({sum(1 for a, b in zip(sn, dn) if a != b)} rows differ); first diffs:")
                for a, b in diff:
                    print(f"   spark={a}\n   duck ={b}")
                ok = False
        status = "OK" if ok else "FAIL"
        print(f"{name}: {status} rows={len(s_rows)} spark={t_spark:.1f}s duck={t_duck:.1f}s")
        if not ok:
            failures.append(name)

    print(f"\n{len(names) - len(failures)}/{len(names)} passed")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
