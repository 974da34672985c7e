#!/usr/bin/env python3
"""Determinism audit: compare two Verify output dirs (produced under
different parallelism, e.g. SPARK_GRAFT_CPUS=4 vs 16) query by query.
A query passes iff its sorted rows are bit-identical (md5 over repr).

Usage: determinism.py <outdirA> <outdirB>
"""
import duckdb
import hashlib
import os
import sys


def main():
    a, b = sys.argv[1], sys.argv[2]

    def dirs(root):
        return {n for n in os.listdir(root) if os.path.isdir(os.path.join(root, n))}

    # union of both sides: a query written by only ONE run is itself a
    # determinism failure (e.g. a raise_error gate firing on one layout)
    names = sorted(dirs(a) | dirs(b))
    bad = []
    for n in names:
        if not (os.path.isdir(os.path.join(a, n)) and os.path.isdir(os.path.join(b, n))):
            bad.append(n)
            print(f"MISS  {n}")
            continue

        def h(d):
            rows = duckdb.connect().execute(
                f"SELECT * FROM '{d}/{n}/*.parquet' ORDER BY ALL").fetchall()
            return hashlib.md5(repr(rows).encode()).hexdigest()

        if h(a) == h(b):
            print(f"ok    {n}")
        else:
            bad.append(n)
            print(f"DIFF  {n}")
    print(f"== {len(names) - len(bad)} identical, {len(bad)} DIFF ==")
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()
