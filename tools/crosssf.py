#!/usr/bin/env python3
"""Cross-SF oracle gate: run graft.Verify + the DuckDB compare (check.py)
at EVERY scale factor, over the WHOLE registry.

SF-dependent drift (the s2/s4 class of bug: a query correct at sf0.01
whose constants/thresholds silently stop holding at another SF) is caught
structurally by re-gating every query at sf0.001, sf0.01 and sf0.1 —
not by the builder remembering which queries are SF-sensitive.

Usage: python3 tools/crosssf.py [sf_dir ...]
       (default: /root/testdata/sf0.001 sf0.01 sf0.1)

Runs sequentially (sbt holds a project-level lock; two concurrent
instances would fight over target/). Exit 0 iff every SF's full gate is
green. Tooling only — the shipped Scala library never depends on this.
"""
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
DEFAULT_SFS = ["/root/testdata/sf0.001", "/root/testdata/sf0.01",
               "/root/testdata/sf0.1"]


def main():
    sfs = sys.argv[1:] or DEFAULT_SFS
    results = {}
    for sf in sfs:
        tag = os.path.basename(sf.rstrip("/"))
        out = f"/tmp/crosssf-{tag}"
        subprocess.run(["rm", "-rf", out], check=True)
        env = dict(os.environ)
        env.setdefault("SPARK_GRAFT_CPUS", "8")
        print(f"== {tag}: graft.Verify -> {out}", flush=True)
        r = subprocess.run(
            ["sbt", "-batch", f"runMain graft.Verify {sf} {out}"],
            cwd=REPO, env=env, stdout=subprocess.DEVNULL,
            stderr=subprocess.DEVNULL)
        if r.returncode != 0:
            print(f"== {tag}: VERIFY FAILED rc={r.returncode}", flush=True)
            results[tag] = False
            continue
        print(f"== {tag}: check.py", flush=True)
        r2 = subprocess.run(
            [sys.executable, os.path.join(REPO, "tools", "check.py"), out, sf])
        results[tag] = r2.returncode == 0
    print("== cross-SF summary ==")
    for tag, ok in results.items():
        print(f"  {tag}: {'GREEN' if ok else 'FAIL'}")
    sys.exit(0 if all(results.values()) and results else 1)


if __name__ == "__main__":
    main()
