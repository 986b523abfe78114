"""Round-3 measurement campaign driver: run each TPU measurement as its own
subprocess with retry/backoff, skipping rows that already landed.

The axon tunnel fails in bursts (client aborts, wedged compiles) — a
monolithic sweep loses everything on one crash.  This driver makes each
(harness, args) unit idempotent: results append to the jsonl files, a
completed unit is detected there and never re-run, and failures back off
and retry for as long as the budget allows.

Usage: python benchmarks/r3_campaign.py [budget_s=14400]
"""

import json
import os
import subprocess
import sys
import time

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)
RES = os.path.join(HERE, "results")


def rows(path):
    out = []
    try:
        with open(path) as fh:
            for line in fh:
                try:
                    out.append(json.loads(line))
                except json.JSONDecodeError:
                    pass
    except OSError:
        pass
    return out


def acc_done(kind, n, nslices, need_grad=False):
    for r in rows(os.path.join(RES, "tpu_accuracy.jsonl")):
        if r.get("kind") == kind and r.get("n") == n and r.get("nslices") == nslices:
            if not need_grad or "grad_rel_err_vs_xla" in r:
                return True
    return False


def steps_done(kind, n, batch, nslices=64):
    for r in rows(os.path.join(RES, "tpu_steps.jsonl")):
        if (
            r.get("kind") == kind
            and r.get("n") == n
            and r.get("batch", 1) == batch
            and r.get("nslices") == nslices
            and r.get("backend") != "cpu"
        ):
            return True
    return False


# (label, done_fn, argv, env_extra, per_try_timeout_s)
UNITS = [
    # 1) accuracy at the 512^2 headline shape for the round-2 engines
    #    (VERDICT item 1).  xla rides along as the grad reference; its own
    #    row is already recorded, the jsonl just gains a duplicate.
    (
        "acc512-radix",
        lambda: acc_done("radix", 512, 64, need_grad=True),
        ["benchmarks/tpu_accuracy.py", "512", "64"],
        {"FDES_ACC_KINDS": "xla,radix"},
        2400,
    ),
    (
        "acc512-radix_fast",
        lambda: acc_done("radix_fast", 512, 64, need_grad=True),
        ["benchmarks/tpu_accuracy.py", "512", "64"],
        {"FDES_ACC_KINDS": "xla,radix_fast"},
        2400,
    ),
    (
        "acc512-fscan",
        lambda: acc_done("fscan", 512, 64),
        ["benchmarks/tpu_accuracy.py", "512", "64"],
        {"FDES_ACC_KINDS": "fscan"},
        2400,
    ),
    (
        "acc512-fscan_fast",
        lambda: acc_done("fscan_fast", 512, 64),
        ["benchmarks/tpu_accuracy.py", "512", "64"],
        {"FDES_ACC_KINDS": "fscan_fast"},
        2400,
    ),
    (
        "acc512-fused",
        lambda: acc_done("fused", 512, 64, need_grad=True),
        ["benchmarks/tpu_accuracy.py", "512", "64"],
        {"FDES_ACC_KINDS": "xla,fused"},
        2400,
    ),
    (
        "acc512-fused_fast",
        lambda: acc_done("fused_fast", 512, 64, need_grad=True),
        ["benchmarks/tpu_accuracy.py", "512", "64"],
        {"FDES_ACC_KINDS": "xla,fused_fast"},
        2400,
    ),
    # 2) fscan throughput at the headline shape (VERDICT item 2 target:
    #    > 25k slice-props/s at 512^2 x 16)
    (
        "steps512b16-fscan",
        lambda: steps_done("fscan", 512, 16),
        ["benchmarks/tpu_steps.py", "fscan", "512"],
        {"FDES_STEPS_BATCH": "16"},
        2400,
    ),
    (
        "steps512b16-fscan_fast",
        lambda: steps_done("fscan_fast", 512, 16),
        ["benchmarks/tpu_steps.py", "fscan_fast", "512"],
        {"FDES_STEPS_BATCH": "16"},
        2400,
    ),
    # 3) 2048^2 batched engine data (VERDICT item 4): the pod grid's
    #    engine choice measured, not extrapolated
    (
        "steps2048b8-xla",
        lambda: steps_done("xla", 2048, 8),
        ["benchmarks/tpu_steps.py", "xla", "2048"],
        {"FDES_STEPS_BATCH": "8", "FDES_STEPS_REPS": "4"},
        2400,
    ),
    (
        "steps2048b8-radix_fast",
        lambda: steps_done("radix_fast", 2048, 8),
        ["benchmarks/tpu_steps.py", "radix_fast", "2048"],
        {"FDES_STEPS_BATCH": "8", "FDES_STEPS_REPS": "4"},
        2400,
    ),
    (
        "steps2048b8-pallas",
        lambda: steps_done("pallas", 2048, 8),
        ["benchmarks/tpu_steps.py", "pallas", "2048"],
        {"FDES_STEPS_BATCH": "8", "FDES_STEPS_REPS": "4"},
        2400,
    ),
    (
        "steps2048b8-radix",
        lambda: steps_done("radix", 2048, 8),
        ["benchmarks/tpu_steps.py", "radix", "2048"],
        {"FDES_STEPS_BATCH": "8", "FDES_STEPS_REPS": "4"},
        2400,
    ),
    # 4) grad-err rows at pod grids for winner candidates (VERDICT item 4:
    #    certify the inverse at pod grid sizes on chip)
    (
        "acc1024-radix",
        lambda: acc_done("radix", 1024, 32, need_grad=True),
        ["benchmarks/tpu_accuracy.py", "1024", "32"],
        {"FDES_ACC_KINDS": "xla,radix"},
        2400,
    ),
    (
        "acc2048-mxufast",
        lambda: acc_done("mxu_fast", 2048, 16, need_grad=True),
        ["benchmarks/tpu_accuracy.py", "2048", "16"],
        {"FDES_ACC_KINDS": "xla,mxu_fast"},
        3000,
    ),
]


def main():
    budget = float(sys.argv[1]) if len(sys.argv) > 1 else 14400.0
    deadline = time.time() + budget
    fails: dict = {}
    while time.time() < deadline:
        pending = [u for u in UNITS if not u[1]()]
        if not pending:
            print("campaign complete: all units recorded", flush=True)
            return 0
        progressed = False
        for label, done, argv, env_extra, tmo in pending:
            if time.time() > deadline:
                break
            if done():
                continue
            env = dict(os.environ, **env_extra)
            print(f"[{time.strftime('%H:%M:%S')}] running {label}", flush=True)
            t0 = time.time()
            r = subprocess.run(
                [sys.executable, *argv],
                cwd=REPO,
                env=env,
                timeout=None if tmo is None else tmo + 60,
                capture_output=True,
                text=True,
            )
            ok = r.returncode == 0 and done()
            print(
                f"[{time.strftime('%H:%M:%S')}] {label}: "
                f"{'OK' if ok else f'FAIL rc={r.returncode}'} "
                f"({time.time() - t0:.0f}s)",
                flush=True,
            )
            if not ok:
                fails[label] = fails.get(label, 0) + 1
                tail = (r.stdout + r.stderr)[-500:]
                print(f"  tail: {tail!r}", flush=True)
                # tunnel outages last minutes: move on to the next unit,
                # then sleep before the next full pass
            else:
                progressed = True
        if not progressed:
            wait = min(300.0, 60.0 * (1 + min(fails.get("_rounds", 0), 4)))
            fails["_rounds"] = fails.get("_rounds", 0) + 1
            print(f"no progress this pass; sleeping {wait:.0f}s", flush=True)
            time.sleep(wait)
        else:
            fails["_rounds"] = 0
    print("campaign budget exhausted", flush=True)
    return 1


if __name__ == "__main__":
    import signal

    signal.signal(signal.SIGTERM, lambda *a: sys.exit(143))
    sys.exit(main())
