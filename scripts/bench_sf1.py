"""Standing sf1 bench gate: the two-point scaling curve for the
headline bench keys.

r14 (VERDICT item 4) methodology: BOTH legs run in ONE session,
ALTERNATING sf0.1/sf1 three times each, and every key takes its
best-of-3 — so cache state and host drift hit both scale points
symmetrically (the r13 refresh ran a hot-cached sf0.1 leg and
inflated every ratio; wall ratios are only comparable when the legs
are measured the same way). The machine's 1-min load is recorded with
the result; run idle (load < 1).

Besides wall ratios the gate now emits PER-ROW COST —
``wall_sec * cores / input_rows`` in µs·core/row against each key's
primary input table — the metric that actually detects a plan
regression: a key whose wall grows 4x at 10x data is FINE (cost/row
fell 2.5x), a key whose cost/row GREW has a plan that lost pushdown
or gained a shuffle, whatever the wall says. Keys with bounded inputs
(d03 scans doc_id < 100 at any SF) legitimately show falling per-row
cost at constant wall.

Writes ``BENCH_SF1.json``:

    {"sf0.1": {...best-of-3 bench json + runs...}, "sf1": {...},
     "ratios": {key: t_sf1/t_sf01}, "total_ratio": R,
     "data_ratio": 10.0, "per_row_cost": {key: {"rows_sf01": n,
     "rows_sf1": n, "us_core_per_row_sf01": c, "us_core_per_row_sf1":
     c, "cost_ratio": r}}, "load_1min": L, "runs_per_leg": 3}

The enforceable bar (COVERAGE.md SCALING): every key <= ~12x wall at
10x data (data-linear); keys > 2x get a plan-evidence note in
COVERAGE.md or a fix, and cost_ratio > 1.2 is the investigate signal.

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

# primary input table per bench key (per-row-cost denominator);
# default lineitem
_KEY_TABLE = {
    "q13_customer_distribution": "orders",
    "w01_window_suite": "events",
    "d01_exact_dedup": "documents",
    "d02_minhash_lsh_neardup": "documents",
    "d03_simhash": "documents",
    "d09_exact_substring_spans": "documents",
    "t01_text_quality": "documents",
    "v01_cosine_topk": "embeddings",
}


def table_rows(sf_dir: str, table: str) -> int:
    import pyarrow.parquet as pq

    return pq.ParquetFile(
        os.path.join(sf_dir, f"{table}.parquet")
    ).metadata.num_rows


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


def best_of(runs: list[dict]) -> dict:
    best = {
        k: min(r["queries"][k] for r in runs) for k in runs[0]["queries"]
    }
    return {
        "metric": runs[0]["metric"],
        "value": round(sum(best.values()), 4),
        "unit": "sec",
        "queries": best,
        "sf": runs[0]["sf"],
        "run_totals": [r["value"] for r in runs],
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf1-dir", default="/tmp/sf1")
    ap.add_argument("--small-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--out", default=os.path.join(REPO, "BENCH_SF1.json"))
    ap.add_argument("--runs", type=int, default=3)
    args = ap.parse_args()

    if not os.path.exists(os.path.join(args.sf1_dir, "lineitem.parquet")):
        raise SystemExit(
            f"{args.sf1_dir} missing — run: python scripts/make_sf1.py {args.sf1_dir}"
        )
    load_1min = os.getloadavg()[0]
    # absolute µs·core/row is only meaningful with the real core count;
    # SPARK_GRAFT_CPUS wins when set (it sizes local[N]), else the
    # machine's — and the value used is recorded in the output JSON
    cores = int(
        os.environ.get("SPARK_GRAFT_CPUS") or (os.cpu_count() or 32)
    )

    small_runs: list[dict] = []
    big_runs: list[dict] = []
    for i in range(args.runs):
        # alternate legs so drift and cache state hit both symmetrically
        small_runs.append(run_bench(args.small_dir))
        print(f"# sf0.1 run {i + 1}: {small_runs[-1]['value']:.2f}s",
              file=sys.stderr)
        big_runs.append(run_bench(args.sf1_dir))
        print(f"# sf1   run {i + 1}: {big_runs[-1]['value']:.2f}s",
              file=sys.stderr)
    small = best_of(small_runs)
    big = best_of(big_runs)

    ratios = {
        k: round(big["queries"][k] / small["queries"][k], 2)
        for k in small["queries"]
        if k in big["queries"]
    }
    rows_cache: dict[tuple[str, str], int] = {}

    def rows(sf_dir: str, key: str) -> int:
        t = _KEY_TABLE.get(key, "lineitem")
        if (sf_dir, t) not in rows_cache:
            rows_cache[(sf_dir, t)] = table_rows(sf_dir, t)
        return rows_cache[(sf_dir, t)]

    per_row = {}
    for k in ratios:
        r01, r1 = rows(args.small_dir, k), rows(args.sf1_dir, k)
        c01 = small["queries"][k] * cores / r01 * 1e6
        c1 = big["queries"][k] * cores / r1 * 1e6
        per_row[k] = {
            "table": _KEY_TABLE.get(k, "lineitem"),
            "rows_sf01": r01,
            "rows_sf1": r1,
            "us_core_per_row_sf01": round(c01, 3),
            "us_core_per_row_sf1": round(c1, 3),
            "cost_ratio": round(c1 / c01, 2),
        }
    out = {
        "sf0.1": small,
        "sf1": big,
        "ratios": ratios,
        "total_ratio": round(big["value"] / small["value"], 2),
        "data_ratio": 10.0,
        "per_row_cost": per_row,
        "load_1min": round(load_1min, 2),
        "runs_per_leg": args.runs,
        "cores_used": cores,
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
