"""Standing sf1 bench gate: the two-point scaling curve for the
headline bench keys.

Runs ``bench.py`` twice as subprocesses (exactly the harness the
driver runs) — once at sf0.1, once at the make_sf1.py 10x dataset —
and writes ``BENCH_SF1.json`` at the repo root:

    {"sf0.1": {...bench json...}, "sf1": {...bench json...},
     "ratios": {key: t_sf1/t_sf01, ...}, "total_ratio": R,
     "data_ratio": 10.0}

The enforceable bar (COVERAGE.md SCALING): every key <= ~12x wall at
10x data (data-linear); keys > 2x get a plan-evidence note in
COVERAGE.md or a fix. A single-SF bench says nothing about the 100 TB
story; this curve is the committed evidence.

Usage:
    python scripts/make_sf1.py /tmp/sf1      # once per machine
    python scripts/bench_sf1.py [--sf1-dir /tmp/sf1] [--out BENCH_SF1.json]
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_bench(sf_dir: str) -> dict:
    env = dict(os.environ, SPARK_GRAFT_SF_DIR=sf_dir)
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py")],
        env=env, capture_output=True, text=True, timeout=3600,
    )
    if proc.returncode != 0:
        sys.stderr.write(proc.stderr[-4000:])
        raise SystemExit(f"bench.py failed at {sf_dir} (rc={proc.returncode})")
    line = [l for l in proc.stdout.strip().splitlines() if l.startswith("{")][-1]
    return json.loads(line)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf1-dir", default="/tmp/sf1")
    ap.add_argument("--small-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--out", default=os.path.join(REPO, "BENCH_SF1.json"))
    args = ap.parse_args()

    if not os.path.exists(os.path.join(args.sf1_dir, "lineitem.parquet")):
        raise SystemExit(
            f"{args.sf1_dir} missing — run: python scripts/make_sf1.py {args.sf1_dir}"
        )

    small = run_bench(args.small_dir)
    print(f"# sf0.1 total: {small['value']:.2f}s", file=sys.stderr)
    big = run_bench(args.sf1_dir)
    print(f"# sf1 total: {big['value']:.2f}s", file=sys.stderr)

    ratios = {
        k: round(big["queries"][k] / small["queries"][k], 2)
        for k in small["queries"]
        if k in big["queries"]
    }
    out = {
        "sf0.1": small,
        "sf1": big,
        "ratios": ratios,
        "total_ratio": round(big["value"] / small["value"], 2),
        "data_ratio": 10.0,
    }
    with open(args.out, "w") as fh:
        json.dump(out, fh, indent=1)
        fh.write("\n")
    print(json.dumps({
        "metric": "sf1_over_sf01_wall_ratio",
        "value": out["total_ratio"],
        "unit": "x",
        "queries": ratios,
        "sf": 1.0,
    }))


if __name__ == "__main__":
    main()
