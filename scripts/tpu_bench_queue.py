"""Round-3 TPU bench queue: run every pending measurement the moment the
axon tunnel is alive, guarding each step with a trivial-jit poll (worker
crashes can wedge the tunnel — see docs/PERFORMANCE.md).

Every bench runs as a SUBPROCESS under ``timeout`` so a hung backend
can't wedge this driver; stdout JSON lines are appended to
``BENCHLOG_r3.jsonl`` tagged with the step name.

Usage: python scripts/tpu_bench_queue.py [--log PATH] [--steps a,b,...]
"""

from __future__ import annotations

import argparse
import datetime
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

POLL_CMD = [
    sys.executable, "-c",
    "import jax; jax.jit(lambda x: x + 1)(1.0).block_until_ready(); "
    "print(jax.default_backend())",
]

BL = os.path.join(REPO, "scripts", "bench_large.py")

# Round-3 campaign: close the 100k-triangle gap. Every step prices one
# lever of the sparse sweeps on the BASELINE config (512^2/2spp/3b,
# 100k tris). The round-2 STEPS are preserved in git history
# (tpu_bench_queue.py @ 1f0f5eb).
R3_STEPS = [
    ("cornell_classic",  # headline A/B: classic-MT VPU sweeps
     [sys.executable, os.path.join(REPO, "bench.py"), "--mt-impl=classic"],
     900),
    ("cornell_plucker",  # headline A/B: MXU Plucker side tests (default)
     [sys.executable, os.path.join(REPO, "bench.py")], 900),
    ("r3_base_c128_g2",  # production default rerun (classic, 5.65M in r2)
     [sys.executable, BL, "--configs", "sparse:on", "--group", "2"], 1200),
    ("r3_plucker_c128_g2",  # NEW: MXU Plucker sparse sweeps
     [sys.executable, BL, "--configs", "sparse:on", "--group", "2",
      "--mt-impl", "plucker"], 1200),
    ("r3_classic_c64_g2",  # budget-scaled small clusters (r2's 'crash')
     [sys.executable, BL, "--configs", "sparse:on", "--group", "2",
      "--c-tri", "64"], 1200),
    ("r3_classic_c64_g4",
     [sys.executable, BL, "--configs", "sparse:on", "--group", "4",
      "--c-tri", "64"], 1200),
    ("r3_classic_c32_g4",
     [sys.executable, BL, "--configs", "sparse:on", "--group", "4",
      "--c-tri", "32"], 1200),
    ("r3_classic_c32_g8",
     [sys.executable, BL, "--configs", "sparse:on", "--group", "8",
      "--c-tri", "32"], 1200),
    ("r3_plucker_c64_g2",
     [sys.executable, BL, "--configs", "sparse:on", "--group", "2",
      "--c-tri", "64", "--mt-impl", "plucker"], 1200),
    ("r3_plucker_c64_g4",
     [sys.executable, BL, "--configs", "sparse:on", "--group", "4",
      "--c-tri", "64", "--mt-impl", "plucker"], 1200),
    ("r3_rblk256_c128_g2",  # tighter block unions (r2's other 'crash')
     [sys.executable, BL, "--configs", "sparse:on", "--group", "2",
      "--r-blk", "256"], 1200),
    ("r3_rblk256_c64_g4",
     [sys.executable, BL, "--configs", "sparse:on", "--group", "4",
      "--c-tri", "64", "--r-blk", "256"], 1200),
    ("r3_rblk128_c64_g4",
     [sys.executable, BL, "--configs", "sparse:on", "--group", "4",
      "--c-tri", "64", "--r-blk", "128"], 1200),
]

# Round-5 campaign (VERDICT r4 task 3): attack the executed/exact ~10x
# gap on the 100k config under the sorted+parked NEE regime. Levers:
# (a) the in-kernel walker re-priced on sorted wavefronts (candidate
#     unions are 5-6x shorter than when r3 priced it);
# (b) bigger work-item groups — the sorted sweeps are per-grid-step
#     bound (~1.6 us/step ~ DMA latency), so g4/g8 amortize the step
#     cost over 2-4x the MT work; the r4 g4 row "did not complete" is
#     suspected COMPILE time (4 prefetch operands x 3 cascade variants
#     x kernels), so steps run twice — the rerun prices warm-cache;
# (c) finer short-grid cascade divisors (trim the ~20-60% inactive tail
#     the (8, 2) divisors leave);
# (d) deeper two-pass truncation on the any-hit (r4 only priced k=4).
R5_STEPS = [
    ("r5_base",
     [sys.executable, BL, "--configs", "sparse:on"], 1800),
    ("r5_walker_sorted",
     [sys.executable, BL, "--configs", "walker:on"], 2400),
    ("r5_walker_unsorted",
     [sys.executable, BL, "--configs", "walker:on",
      "--sort-nee", "off"], 2400),
    ("r5_g4_cold",
     [sys.executable, BL, "--configs", "sparse:on", "--group", "4"],
     3000),
    ("r5_g4",
     [sys.executable, BL, "--configs", "sparse:on", "--group", "4"],
     1800),
    ("r5_g8_cold",
     [sys.executable, BL, "--configs", "sparse:on", "--group", "8"],
     3000),
    ("r5_g8",
     [sys.executable, BL, "--configs", "sparse:on", "--group", "8"],
     1800),
    ("r5_divs_fine",
     [sys.executable, BL, "--configs", "sparse:on",
      "--grid-divs", "16,8,4,2"], 3000),
    ("r5_twopass8",
     [sys.executable, BL, "--configs", "sparse:on", "--two-pass", "8"],
     2400),
    ("r5_twopass16",
     [sys.executable, BL, "--configs", "sparse:on", "--two-pass", "16"],
     2400),
    # walker shape sweep (its r3-best c256 already measures ~par with
    # sparse under sorting — the first time any alternative matched)
    ("r5_walker_c128",
     [sys.executable, BL, "--configs", "walker:on",
      "--walker-c-tri", "128"], 2400),
    ("r5_walker_c512",
     [sys.executable, BL, "--configs", "walker:on",
      "--walker-c-tri", "512"], 2400),
    ("r5_walker_nbuf8",
     [sys.executable, BL, "--configs", "walker:on",
      "--walker-nbuf", "8"], 2400),
    # exact-refinement of candidate lists (g4-wash finding: the sweeps
    # are per-cluster-visit bound, so drop the members no lane can hit)
    ("r5_refine32",
     [sys.executable, BL, "--configs", "sparse:on", "--refine-k", "32"],
     2400),
    ("r5_refine96",
     [sys.executable, BL, "--configs", "sparse:on", "--refine-k", "96"],
     2400),
    # walker c128 beat sparse (744 vs 789 ms) — probe its neighborhood
    ("r5_walker_c128_nbuf8",
     [sys.executable, BL, "--configs", "walker:on",
      "--walker-c-tri", "128", "--walker-nbuf", "8"], 2400),
    ("r5_walker_c64",
     [sys.executable, BL, "--configs", "walker:on",
      "--walker-c-tri", "64"], 2400),
    ("r5_walker_c128_w640",
     [sys.executable, BL, "--configs", "walker:on",
      "--walker-c-tri", "128", "--walker-w-per-rb", "640"], 2400),
    ("r5_walker_c128_sparse_mix",
     # sanity row: sparse NEAREST is not obviously worse — this prices
     # the walker on BOTH sweeps vs the best-known sparse both-sweeps;
     # a hybrid dispatch only pays if these bracket a gap
     [sys.executable, BL, "--configs", "sparse:on,walker:on",
      "--walker-c-tri", "128"], 3000),
]

STEPS = R5_STEPS


def log_line(log_path: str, obj: dict) -> None:
    obj["ts"] = datetime.datetime.utcnow().isoformat(timespec="seconds")
    with open(log_path, "a") as f:
        f.write(json.dumps(obj) + "\n")
    print(json.dumps(obj), flush=True)


def poll(timeout_s: int = 120) -> bool:
    try:
        r = subprocess.run(
            POLL_CMD, capture_output=True, text=True, timeout=timeout_s,
        )
    except subprocess.TimeoutExpired:
        return False
    return r.returncode == 0 and "tpu" in r.stdout


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--log", default=os.path.join(REPO, "BENCHLOG_r3.jsonl"))
    p.add_argument("--steps", default=None,
                   help="comma list of step names (default: all)")
    p.add_argument("--skip-done", action="store_true",
                   help="skip steps that already logged a RESULT line "
                        "(resume after a mid-queue tunnel drop)")
    args = p.parse_args()
    wanted = set(args.steps.split(",")) if args.steps else None

    done: set[str] = set()
    if args.skip_done and os.path.exists(args.log):
        with open(args.log) as f:
            for line in f:
                try:
                    obj = json.loads(line)
                except json.JSONDecodeError:
                    continue
                # a step counts as done only if it produced a real result
                if "error" not in obj and "unparsed" not in obj and \
                        obj.get("bench") not in (None, "queue"):
                    done.add(obj["bench"])

    for name, argv, tmo in STEPS:
        if wanted and name not in wanted:
            continue
        if name in done:
            continue
        if not poll():
            log_line(args.log, {"bench": name, "error": "tpu down, abort"})
            return
        env = dict(os.environ)
        # Subprocess scripts live in scripts/, so Python puts scripts/ (not
        # the repo root) on sys.path — the package import needs this.
        env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
        try:
            r = subprocess.run(
                argv, capture_output=True, text=True, timeout=tmo, cwd=REPO,
                env=env,
            )
        except subprocess.TimeoutExpired:
            log_line(args.log, {"bench": name, "error": f"timeout {tmo}s"})
            continue
        for line in r.stdout.splitlines():
            line = line.strip()
            if not line.startswith("{"):
                continue
            try:
                obj = json.loads(line)
            except json.JSONDecodeError:
                log_line(args.log, {"bench": name, "unparsed": line[:200]})
                continue
            if obj.get("platform") not in (None, "tpu"):
                obj["error"] = "NOT ON TPU (tunnel fell back mid-queue)"
            log_line(args.log, {"bench": name, **obj})
        if r.returncode != 0:
            log_line(args.log, {
                "bench": name, "error": f"rc={r.returncode}",
                "stderr_tail": r.stderr[-500:],
            })
    log_line(args.log, {"bench": "queue", "done": True})


if __name__ == "__main__":
    main()
