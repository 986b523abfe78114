"""Round-4 measurement campaign driver (same mechanics as r3_campaign.py:
one subprocess per measurement unit, idempotent done-detection from the
results files, retry pending units in passes while the budget lasts).

Round-4 units (VERDICT.md round-3 "next round"):
  1. adjoint-fscan certification: grad-err rows on chip at 128^2 (smoke),
     512^2 and 256^2 for fscan/fscan_fast (item 1 "done" gate)
  2. certification gaps: 256^2 grad rows for mxu/radix; a second engine's
     grad row at 2048^2 (radix) (item 6)
  3. grad-step engine comparison at 512^2 b1: value_and_grad timing for
     fscan/fscan_fast/mxu/radix/fused_fast — the unit config-3's engine
     choice rides on (items 1+3)
  4. config-3 re-runs with the whole-loop grad engines (target >= 55
     recon-iters/s vs round-3's 37.8)

Usage: python benchmarks/r4_campaign.py [budget_s=14400]
"""

import glob
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
        if (
            r.get("kind") == kind
            and r.get("n") == n
            and r.get("nslices") == nslices
            and r.get("backend") != "cpu"
        ):
            if not need_grad or "grad_rel_err_vs_xla" in r:
                return True
    return False


def acc_fwd_done(kind, n, nslices):
    for r in rows(os.path.join(RES, "tpu_accuracy.jsonl")):
        if (
            r.get("kind") == kind
            and r.get("n") == n
            and r.get("nslices") == nslices
            and r.get("engine_grad") is False
            and r.get("backend") != "cpu"
        ):
            return True
    return False


def steps_fwd_done(kind, n, batch, nslices=64):
    for r in rows(os.path.join(RES, "tpu_steps.jsonl")):
        if (
            r.get("kind") == kind
            and r.get("n") == n
            and r.get("batch", 1) == batch
            and r.get("nslices") == nslices
            and r.get("mode") != "value_and_grad"
            and r.get("backend") != "cpu"
        ):
            return True
    return False


def gradsteps_done(kind, n, batch, nslices=64):
    for r in rows(os.path.join(RES, "tpu_steps.jsonl")):
        if (
            r.get("kind") == kind
            and r.get("n") == n
            and r.get("batch", 1) == batch
            and r.get("nslices") == nslices
            and r.get("mode") == "value_and_grad"
            and r.get("backend") != "cpu"
        ):
            return True
    return False


def tilt_done(kind, n, ntilt):
    for r in rows(os.path.join(RES, "tilt_series.jsonl")):
        if (
            r.get("kind") == kind
            and r.get("n") == n
            and r.get("ntilt") == ntilt
            and r.get("backend") != "cpu"
        ):
            return True
    return False


def config_done(tag):
    return bool(glob.glob(os.path.join(RES, f"*_full_{tag}.json")))


def _acc_unit(label, kind, n, nslices, timeout=3600, ref="xla"):
    kinds = f"{ref},{kind}" if ref else kind
    return (
        label,
        lambda: acc_done(kind, n, nslices, need_grad=True),
        ["benchmarks/tpu_accuracy.py", str(n), str(nslices)],
        {"FDES_ACC_KINDS": kinds},
        timeout,
    )


def _gradstep_unit(label, kind, n=512, batch=1, timeout=3600):
    return (
        label,
        lambda: gradsteps_done(kind, n, batch),
        ["benchmarks/tpu_steps.py", kind, str(n)],
        {"FDES_STEPS_GRAD": "1", "FDES_STEPS_BATCH": str(batch)},
        timeout,
    )


UNITS = [
    # 0) smoke: the adjoint kernels' first Mosaic compile at a small grid
    _acc_unit("acc128-fscan-grad-smoke", "fscan", 128, 8, timeout=2400),
    # 1) adjoint certification at the headline shapes
    _acc_unit("acc512-fscan-grad", "fscan", 512, 64),
    _acc_unit("acc512-fscan_fast-grad", "fscan_fast", 512, 64),
    _acc_unit("acc256-fscan-grad", "fscan", 256, 64),
    _acc_unit("acc256-fscan_fast-grad", "fscan_fast", 256, 64),
    # 2) certification gaps (VERDICT item 6)
    _acc_unit("acc256-mxu-grad", "mxu", 256, 64),
    _acc_unit("acc256-radix-grad", "radix", 256, 64),
    _acc_unit("acc2048-radix-grad", "radix", 2048, 16),
    # 3) grad-step engine comparison at 512^2 unbatched (config-3's shape)
    _gradstep_unit("gradstep512-mxu", "mxu"),
    _gradstep_unit("gradstep512-fscan", "fscan"),
    _gradstep_unit("gradstep512-fscan_fast", "fscan_fast"),
    _gradstep_unit("gradstep512-radix", "radix"),
    _gradstep_unit("gradstep512-fused_fast", "fused_fast"),
    _gradstep_unit("gradstep256-mxu", "mxu", n=256),
    _gradstep_unit("gradstep256-fscan", "fscan", n=256),
    _gradstep_unit("gradstep256-fscan_fast", "fscan_fast", n=256),
    # batched grad (the ptycho probe axis): vmap-of-grad through the
    # auto-batched whole-loop adjoint vs the per-slice radix tier that
    # currently owns 1<batch<=16 grad contexts
    _gradstep_unit("gradstep512b16-radix", "radix", batch=16),
    _gradstep_unit("gradstep512b16-radix_fast", "radix_fast", batch=16),
    _gradstep_unit("gradstep512b16-fscan", "fscan", batch=16),
    _gradstep_unit("gradstep512b16-fscan_fast", "fscan_fast", batch=16),
    # 3b) the pod grid attacked with whole-loop fusion (VERDICT item 2):
    # 1024^2 forward rows at the batches the engine table compares
    # (mxu_fast 2.36k batched / xla 1.61k batched / xla 2.58k unbatched),
    # accuracy + grad certification, and the grad step
    (
        "steps1024b1-fscan",
        lambda: steps_fwd_done("fscan", 1024, 1),
        ["benchmarks/tpu_steps.py", "fscan", "1024"],
        {"FDES_STEPS_BATCH": "1", "FDES_STEPS_REPS": "6"},
        3600,
    ),
    (
        "steps1024b1-fscan_fast",
        lambda: steps_fwd_done("fscan_fast", 1024, 1),
        ["benchmarks/tpu_steps.py", "fscan_fast", "1024"],
        {"FDES_STEPS_BATCH": "1", "FDES_STEPS_REPS": "6"},
        3600,
    ),
    (
        "steps1024b8-fscan_fast",
        lambda: steps_fwd_done("fscan_fast", 1024, 8),
        ["benchmarks/tpu_steps.py", "fscan_fast", "1024"],
        {"FDES_STEPS_BATCH": "8", "FDES_STEPS_REPS": "6"},
        3600,
    ),
    (
        "steps1024b8-fscan",
        lambda: steps_fwd_done("fscan", 1024, 8),
        ["benchmarks/tpu_steps.py", "fscan", "1024"],
        {"FDES_STEPS_BATCH": "8", "FDES_STEPS_REPS": "6"},
        3600,
    ),
    _acc_unit("acc1024-fscan-grad", "fscan", 1024, 32),
    _gradstep_unit("gradstep1024-fscan", "fscan", n=1024),
    _gradstep_unit("gradstep1024-xla", "xla", n=1024),
    # forward-only whole-loop certification at 1024^2 (the grad engine
    # routes to the per-slice fallback there, so the whole-loop FORWARD
    # needs its own exit-error row)
    (
        "acc1024-fscan-fwd",
        lambda: acc_fwd_done("fscan", 1024, 32),
        ["benchmarks/tpu_accuracy.py", "1024", "32"],
        {"FDES_ACC_KINDS": "fscan,fscan_fast", "FDES_ACC_GRAD": "0"},
        3600,
    ),
    # 3c) tilt-series dispatch row (VERDICT item 5 "done" gate)
    (
        "tilt512-fscan",
        lambda: tilt_done("fscan", 512, 8),
        ["benchmarks/tilt_series.py", "fscan", "512", "8"],
        {},
        3600,
    ),
    (
        "tilt512-fscan_fast",
        lambda: tilt_done("fscan_fast", 512, 8),
        ["benchmarks/tilt_series.py", "fscan_fast", "512", "8"],
        {},
        3600,
    ),
    # 4) config-3 with the whole-loop grad engine (the round's headline)
    (
        "config3-fscan",
        lambda: config_done("r4c3fscan"),
        ["benchmarks/run_configs.py", "--configs", "3", "--step", "fscan",
         "--tag", "r4c3fscan"],
        {},
        3600,
    ),
    (
        "config3-fscan_fast",
        lambda: config_done("r4c3fscanfast"),
        ["benchmarks/run_configs.py", "--configs", "3", "--step",
         "fscan_fast", "--tag", "r4c3fscanfast"],
        {},
        3600,
    ),
    # 5) fresh full_r4 artifacts with the promoted auto tiers (config 3
    # now resolves the whole-loop adjoint through the product path)
    (
        "configs123-auto",
        lambda: config_done("r4main"),
        ["benchmarks/run_configs.py", "--configs", "1,2,3", "--step",
         "auto", "--tag", "r4main"],
        {},
        3600,
    ),
    (
        "config4-auto",
        lambda: config_done("r4c4"),
        ["benchmarks/run_configs.py", "--configs", "4", "--step", "auto",
         "--tag", "r4c4"],
        {},
        3600,
    ),
    (
        "config4-autofast",
        lambda: config_done("r4c4fast"),
        ["benchmarks/run_configs.py", "--configs", "4", "--step",
         "auto_fast", "--tag", "r4c4fast"],
        {},
        3600,
    ),
    # config-2 re-run: the r4main pass measured 1,185 images/s vs round
    # 3's 1,289 with the same resolved engine — one more sample decides
    # noise vs regression
    # 6) new config-7 (ptycho inverse): the batched-grad context's
    # headline, timed through the product path
    (
        "config7-auto",
        lambda: config_done("r4c7"),
        ["benchmarks/run_configs.py", "--configs", "7", "--step", "auto",
         "--tag", "r4c7"],
        {},
        3600,
    ),
    (
        "config2-confirm",
        lambda: config_done("r4c2b"),
        ["benchmarks/run_configs.py", "--configs", "2", "--step", "auto",
         "--tag", "r4c2b"],
        {},
        3600,
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
            try:
                r = subprocess.run(
                    [sys.executable, *argv],
                    cwd=REPO,
                    env=env,
                    timeout=None if tmo is None else tmo + 60,
                    capture_output=True,
                    text=True,
                )
                rc, err = r.returncode, (r.stderr or "")[-2000:]
            except subprocess.TimeoutExpired:
                rc, err = "timeout", ""
            ok = rc == 0 and done()
            print(
                f"[{time.strftime('%H:%M:%S')}] {label}: "
                f"{'OK' if ok else f'FAIL rc={rc}'} in {time.time() - t0:.0f}s",
                flush=True,
            )
            if ok:
                progressed = True
            else:
                fails[label] = fails.get(label, 0) + 1
                if err:
                    print(f"  stderr tail: {err[-600:]}", flush=True)
        if not progressed:
            wait = min(300.0, 60.0 * max(fails.values(), default=1))
            print(f"no progress this pass; backing off {wait:.0f}s", flush=True)
            time.sleep(wait)
    print("campaign budget exhausted; pending units remain", flush=True)
    return 1


if __name__ == "__main__":
    sys.exit(main())
