"""Round-2 TPU bench queue: run every pending measurement the moment the
axon tunnel is alive, guarding each step with a trivial-jit poll (worker
crashes can wedge the tunnel — see docs/PERFORMANCE.md).

Every bench runs as a SUBPROCESS under ``timeout`` so a hung backend
can't wedge this driver; stdout JSON lines are appended to
``BENCHLOG_r2.jsonl`` tagged with the step name.

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

# (name, argv, timeout_s) — ordered by value; later steps are tuning.
STEPS = [
    # fused A/B isolates ONE lever: both steps pin mt-impl=classic, and
    # the fused step passes --fused-bounce=auto explicitly (bench.py's
    # default flipped to off in round 2 — ADVICE r2)
    ("cornell_fused",
     [sys.executable, os.path.join(REPO, "bench.py"),
      "--fused-bounce=auto", "--mt-impl=classic"], 900),
    ("cornell_unfused",
     [sys.executable, os.path.join(REPO, "bench.py"), "--fused-bounce=off",
      "--mt-impl=classic"],
     900),
    ("large_sparse_cascade",  # --group 1 pinned: reproduces the logged
     #  G=1 baseline (module GROUP default is now 2 — ADVICE r2)
     [sys.executable, BL, "--configs", "sparse:on", "--group", "1"], 2400),
    ("large_ranked",
     [sys.executable, BL, "--configs", "ranked:off"], 2400),
    ("large_ranked_nee",  # mixed: sparse nearest + ranked NEE occlusion
     [sys.executable, BL, "--configs", "ranked-nee:on"], 2400),
    ("large_ranked_nee_r3",  # fewer rounds -> residue sweep eats the tail
     [sys.executable, BL, "--configs", "ranked-nee:on", "--ranked-rounds",
      "3"], 2400),
    ("large_ranked_nee_r10",  # more rounds -> smaller residue, more sorts
     [sys.executable, BL, "--configs", "ranked-nee:on", "--ranked-rounds",
      "10"], 2400),
    ("large_group2",
     [sys.executable, BL, "--configs", "sparse:on", "--group", "2"], 2400),
    ("large_group4",
     [sys.executable, BL, "--configs", "sparse:on", "--group", "4"], 2400),
    ("large_group2_twopass_off",  # the two measured winners composed:
     #  grouping (5.27M vs 4.49M) + any-hit two-pass off (4.75M vs 4.49M)
     [sys.executable, BL, "--configs", "sparse:on", "--group", "2",
      "--two-pass", "0"], 2400),
    ("large_group2_c64",
     [sys.executable, BL, "--configs", "sparse:on", "--group", "2",
      "--c-tri", "64", "--two-pass", "0"], 2400),
    ("large_median",
     [sys.executable, BL, "--configs", "sparse:on", "--order", "median",
      "--group", "1"],
     2400),
    ("large_median_group2",
     [sys.executable, BL, "--configs", "sparse:on", "--order", "median",
      "--group", "2"], 2400),
    ("large_twopass_off",  # any-hit two-pass auto-engages at PASS1_K=4;
     #  the informative A/B is OFF (re-measure the cascade without it)
     [sys.executable, BL, "--configs", "sparse:on", "--two-pass", "0",
      "--group", "1"],
     2400),
    ("large_twopass_nearest4",
     [sys.executable, BL, "--configs", "sparse:on", "--two-pass-nearest",
      "4", "--group", "1"], 2400),
    ("large_group4_c64",  # grouping amortizes per-item overhead, which
     #  is what made c64 lose standalone — retest small clusters grouped
     [sys.executable, BL, "--configs", "sparse:on", "--group", "4",
      "--c-tri", "64"], 2400),
    ("large_group4_c32",
     [sys.executable, BL, "--configs", "sparse:on", "--group", "4",
      "--c-tri", "32"], 2400),
    ("large_group8_c32",
     [sys.executable, BL, "--configs", "sparse:on", "--group", "8",
      "--c-tri", "32"], 2400),
    ("large_dense_baseline",
     [sys.executable, BL, "--configs", "none:off,sparse:on"], 3600),
    ("cornell_plucker",  # MXU Plücker side tests vs classic-MT VPU sweeps
     #  (dense kernels only — fused off so the composed path runs)
     [sys.executable, os.path.join(REPO, "bench.py"), "--fused-bounce=off",
      "--mt-impl=plucker"], 900),
    ("large_dense_plucker",  # same lever on the 100k-tri dense baseline
     [sys.executable, BL, "--configs", "none:off", "--mt-impl", "plucker"],
     3600),
    ("mxu_probe",
     [sys.executable, os.path.join(REPO, "scripts", "mxu_probe.py")], 1200),
    ("grid_floor",  # all-parked wavefront: static-grid churn floor
     [sys.executable, os.path.join(REPO, "scripts", "floor_cost.py")], 1200),
]


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
    p.add_argument("--log", default=os.path.join(REPO, "BENCHLOG_r2.jsonl"))
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
