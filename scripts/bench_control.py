"""Bench with an A/B drift control: HEAD vs a reference commit.

Host speed drifts between (and within) rounds — round 6's recorded
"regression" was entirely host drift, settled by checking the previous
round's final commit into a temp worktree and running ITS bench
back-to-back on the same machine (VERDICT r6, "Performance vs
baseline"). This script institutionalizes that experiment:

    python scripts/bench_control.py --ref <prev-round-final-commit> \
        [--out BENCH_CONTROL_r07.json]

It runs `python bench.py` twice — once in a temp worktree of --ref,
once at HEAD (in that order, so HEAD is the one a cold file cache
penalizes LESS, biasing AGAINST us) — and writes one JSON document:

    {"control": {"commit": ..., <bench json>},
     "head":    {"commit": ..., <bench json>},
     "same_key_ratio": head_total / control_total over SHARED keys}

`same_key_ratio` < 1.0 means the current code is faster than the
reference commit's code on this host, whatever the host is doing
today. bench.py itself is untouched (still exactly one JSON line).
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run_bench(cwd: str) -> dict:
    out = subprocess.run(
        [sys.executable, "bench.py"],
        cwd=cwd,
        stdout=subprocess.PIPE,
        stderr=subprocess.DEVNULL,
        check=True,
        timeout=900,
    ).stdout.decode()
    # bench.py prints exactly one JSON line on stdout
    return json.loads(out.strip().splitlines()[-1])


def _rev_parse(ref: str) -> str:
    return subprocess.run(
        ["git", "rev-parse", ref], cwd=REPO, stdout=subprocess.PIPE, check=True
    ).stdout.decode().strip()


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--ref", required=True,
                    help="control commit (previous round's final commit)")
    ap.add_argument("--out", default=None,
                    help="output JSON path (default: stdout only)")
    ap.add_argument("--head-bench", action="store_true",
                    help="run HEAD's bench.py inside the control worktree "
                         "(same sink on both commits — the honest-rebaseline "
                         "mode: r9's checksum sink replaced the count() sink "
                         "that let Catalyst prune unreferenced aggregates, so "
                         "pre-r9 series are only comparable re-measured "
                         "under the new sink)")
    args = ap.parse_args()

    control_sha = _rev_parse(args.ref)
    head_sha = _rev_parse("HEAD")

    wt = tempfile.mkdtemp(prefix="bench_control_")
    subprocess.run(
        ["git", "worktree", "add", "--detach", wt, control_sha],
        cwd=REPO, check=True, stdout=subprocess.DEVNULL,
    )
    try:
        if args.head_bench:
            import shutil

            shutil.copy(os.path.join(REPO, "bench.py"), os.path.join(wt, "bench.py"))
        control = _run_bench(wt)
        head = _run_bench(REPO)
    finally:
        subprocess.run(
            ["git", "worktree", "remove", "--force", wt],
            cwd=REPO, check=False, stdout=subprocess.DEVNULL,
        )

    shared = sorted(set(control["queries"]) & set(head["queries"]))
    c_total = sum(control["queries"][k] for k in shared)
    h_total = sum(head["queries"][k] for k in shared)
    doc = {
        "control": {"commit": control_sha, **control},
        "head": {"commit": head_sha, **head},
        "shared_keys": shared,
        "control_shared_total": round(c_total, 4),
        "head_shared_total": round(h_total, 4),
        "same_key_ratio": round(h_total / c_total, 4) if c_total else None,
    }
    text = json.dumps(doc, indent=2)
    if args.out:
        with open(args.out, "w") as fh:
            fh.write(text + "\n")
    print(text)


if __name__ == "__main__":
    main()
