"""Local stand-in for the driver's correctness gate: run every
``queries()`` entry and its ``oracle_sql()`` twin on the same sf dir,
compare row count, column names, and an order-insensitive value hash.

Usage: PYTHONPATH=/root/repo python tools/check_queries.py [sf_dir] [name...]
"""

from __future__ import annotations

import hashlib
import sys
import time

import duckdb
import pandas as pd


def to_pandas(res) -> pd.DataFrame:
    if isinstance(res, pd.DataFrame):
        return res
    if hasattr(res, "to_pandas"):
        return res.to_pandas()
    raise TypeError(type(res))


def value_hash(df: pd.DataFrame) -> str:
    df = df[sorted(df.columns)].copy()
    # normalize row order: sort by all columns stringified
    rows = sorted(df.astype(str).itertuples(index=False, name=None))
    h = hashlib.sha256()
    for r in rows:
        h.update(("\x1f".join(r) + "\n").encode())
    return h.hexdigest()[:16]


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=8, include_dashboard=False,
                 ignore_reinit_error=True, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    import __ray_entry__ as e

    con = duckdb.connect()
    for t in ("region nation customer supplier part orders lineitem events "
              "documents embeddings").split():
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    qs, oracles = e.queries(), e.oracle_sql()
    failures = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            mine = to_pandas(fn(sf_dir))
        except Exception as ex:
            print(f"FAIL {name}: query raised {type(ex).__name__}: {ex}")
            failures += 1
            continue
        dt = time.time() - t0
        if name not in oracles:
            print(f"okNR {name}: rows={len(mine)} cols={sorted(mine.columns)} ({dt:.1f}s, no oracle)")
            continue
        try:
            gold = con.sql(oracles[name]).df()
        except Exception as ex:
            print(f"FAIL {name}: oracle raised {ex}")
            failures += 1
            continue
        problems = []
        if len(mine) != len(gold):
            problems.append(f"rows {len(mine)} != {len(gold)}")
        if sorted(mine.columns) != sorted(gold.columns):
            problems.append(f"cols {sorted(mine.columns)} != {sorted(gold.columns)}")
        elif value_hash(mine) != value_hash(gold):
            problems.append("value-hash mismatch")
        if problems:
            failures += 1
            print(f"FAIL {name}: {'; '.join(problems)} ({dt:.1f}s)")
            if len(mine) and len(gold) and sorted(mine.columns) == sorted(gold.columns):
                m = mine[sorted(mine.columns)].astype(str)
                g = gold[sorted(gold.columns)].astype(str)
                ms = set(map(tuple, m.itertuples(index=False, name=None)))
                gs = set(map(tuple, g.itertuples(index=False, name=None)))
                print("   only-mine:", list(ms - gs)[:3])
                print("   only-gold:", list(gs - ms)[:3])
        else:
            print(f"ok   {name}: rows={len(mine)} ({dt:.1f}s)")
    ray.shutdown()
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
