"""Regularized full-scale inverse studies (VERDICT.md round-4 item 3).

Round 4 measured the tilt-posed recovery plateau (256^2 x 16 slices,
24 tilts x 2 defoci, lbfgs: V rel-err ~1.2e-1 with data loss down 7.6
orders) and concluded "NO optimizer recovers beyond the information
content" — but never brought the repo's own priors (loss.make_loss's
Tikhonov + TV terms, reconstruct's positivity projection) to bear on the
weak-phase near-null space they exist to shrink.  This study re-runs the
tilt-posed recovery over a small regularization-weight grid, plus a
richer mid-scale pose (more tilts, tilt x defocus jointly), and records
where priors move the V rel-err floor.

Ground truth is the Si [110] supercell potential (positive, sparse —
exactly the structure the priors encode).  Observations are noiseless
tilt x defocus HRTEM series; each unit runs lbfgs (optionally projected)
to convergence and reports raw and gauge-fixed (mean-removed: the q=0
component is an unobservable global phase) V errors.

Appends JSON lines to benchmarks/results/priors_study.jsonl; idempotent
per unit (r3_campaign pattern).

Usage: python benchmarks/r5_priors_study.py [unit ...]
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

RESULTS = os.path.join(
    os.path.dirname(os.path.abspath(__file__)), "results", "priors_study.jsonl"
)

#: unit -> (ntilt, ndef, tik_weight, tv_weight, project, iters, rings)
#: rings: tilt magnitudes (rad) the azimuths cycle through — a single
#: 0.02-rad cone (the round-4-style pose) encodes depth weakly; the
#: 2-ring poses separate pose-information limits from prior effects.
UNITS = {
    "unreg": (24, 2, 0.0, 0.0, False, 1500, (0.02,)),
    "pos": (24, 2, 0.0, 0.0, True, 1500, (0.02,)),
    "tik6": (24, 2, 1e-6, 0.0, True, 1500, (0.02,)),
    "tik4": (24, 2, 1e-4, 0.0, True, 1500, (0.02,)),
    "tv4": (24, 2, 0.0, 1e-4, True, 1500, (0.02,)),
    "tv2": (24, 2, 0.0, 1e-2, True, 1500, (0.02,)),
    "tik6tv4": (24, 2, 1e-6, 1e-4, True, 1500, (0.02,)),
    "rich-unreg": (48, 3, 0.0, 0.0, False, 2000, (0.02,)),
    "rich-reg": (48, 3, 1e-6, 1e-4, True, 2000, (0.02,)),
    "ring2-unreg": (24, 2, 0.0, 0.0, False, 1500, (0.02, 0.06)),
    # depth sweep: same pose, fewer slices — localises the plateau's
    # growth with the depth null space and what priors do to it
    "depth2-unreg": (24, 2, 0.0, 0.0, False, 1500, (0.02, 0.06), 2),
    "depth2-tv4": (24, 2, 0.0, 1e-4, True, 1500, (0.02, 0.06), 2),
    "depth4-unreg": (24, 2, 0.0, 0.0, False, 1500, (0.02, 0.06), 4),
    "depth4-tv4": (24, 2, 0.0, 1e-4, True, 1500, (0.02, 0.06), 4),
    "depth8-unreg": (24, 2, 0.0, 0.0, False, 1500, (0.02, 0.06), 8),
    "depth8-tv4": (24, 2, 0.0, 1e-4, True, 1500, (0.02, 0.06), 8),
    "ring2-pos": (24, 2, 0.0, 0.0, True, 1500, (0.02, 0.06)),
    "ring2-tv4": (24, 2, 0.0, 1e-4, True, 1500, (0.02, 0.06)),
    "ring2-rich-unreg": (48, 3, 0.0, 0.0, False, 2000, (0.02, 0.06)),
    "ring2-rich-reg": (48, 3, 0.0, 1e-4, True, 2000, (0.02, 0.06)),
    # tilt-RANGE sweep at full depth: real tomographic angles (3-11 deg)
    # — the other axis of the information-content surface
    "ring3-unreg": (24, 2, 0.0, 0.0, False, 1500, (0.05, 0.1, 0.15)),
    "ring3-pos": (24, 2, 0.0, 0.0, True, 1500, (0.05, 0.1, 0.15)),
    "ring3-rich-unreg": (48, 3, 0.0, 0.0, False, 2000, (0.05, 0.1, 0.15)),
}


def done_units():
    done = set()
    try:
        with open(RESULTS) as fh:
            for line in fh:
                try:
                    done.add(json.loads(line)["unit"])
                except (json.JSONDecodeError, KeyError):
                    pass
    except OSError:
        pass
    return done


def main():
    import jax
    import jax.numpy as jnp

    if os.environ.get("JAX_PLATFORMS") == "cpu":
        # env var alone loses to the ambient sitecustomize TPU backend
        jax.config.update("jax_platforms", "cpu")
    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"),
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    import fdes_tpu as f
    from fdes_tpu.forward import hrtem_defocus_series
    from fdes_tpu.grids import Grid, host_cast
    from fdes_tpu.loss import l2_mismatch, tikhonov, total_variation
    from fdes_tpu.potential import build_potential
    from fdes_tpu.reconstruct import make_optimizer, positive_projection, reconstruct
    from fdes_tpu.tunnel import safe_put

    units = sys.argv[1:] or [u for u in UNITS if u not in done_units()]
    # smoke knobs (CPU CI): shrink the problem without touching the units
    n = int(os.environ.get("FDES_PRIORS_N", "256"))
    nslices = int(os.environ.get("FDES_PRIORS_SLICES", "16"))
    iter_scale = float(os.environ.get("FDES_PRIORS_ITER_SCALE", "1.0"))
    kv = 300e3
    lam = f.wavelength_A(kv)
    sigma = f.interaction_sigma(kv)
    spec = f.make_si110_supercell(reps=(4, 3, 3))
    lx, ly, lz = spec.box
    grid = Grid(ny=n, nx=n, py=ly / n, px=lx / n)
    os.makedirs(os.path.dirname(RESULTS), exist_ok=True)

    for unit in units:
        ntilt, ndef, tikw, tvw, proj, iters, rings, *rest = UNITS[unit]
        nsl = rest[0] if rest else nslices
        sliced = f.slice_specimen(spec, nslices=nsl, dz=float(lz) / nsl)
        v_true_host = np.asarray(build_potential(sliced, grid, dtype=np.float32))
        iters = max(int(iters * iter_scale), 8)
        angs = np.linspace(0.0, np.pi, ntilt, endpoint=False)
        tilts = [
            (rings[i % len(rings)] * np.cos(a), rings[i % len(rings)] * np.sin(a))
            for i, a in enumerate(angs)
        ]
        props = safe_put(
            np.stack(
                [
                    host_cast(
                        f.fresnel_propagator(grid, lam, sliced.dz, tilt_xy_rad=t),
                        np.complex64,
                    )
                    for t in tilts
                ]
            )
        )
        defoci = np.linspace(-80.0, 80.0, ndef)
        ctfs = safe_put(
            host_cast(f.ctf_series(grid, lam, defoci), np.complex64)
        )
        psi0 = safe_put(
            np.ones((ntilt, n, n), np.complex64)
        )
        v_true = safe_put(v_true_host)

        def forward(v, psi0, props, ctfs):
            # (T, D, n, n): per-tilt rollout shared across the defocus CTFs
            return jax.vmap(
                lambda p0, pr: hrtem_defocus_series(
                    v, p0, pr, sigma, ctfs
                )
            )(psi0, props)

        i_obs = jax.jit(forward)(v_true, psi0, props, ctfs)

        def loss_fn(v, psi0, props, ctfs, i_obs):
            l = l2_mismatch(forward(v, psi0, props, ctfs), i_obs)
            if tikw:
                l = l + tikhonov(v, tikw)
            if tvw:
                l = l + total_variation(v, tvw)
            return l

        t0 = time.time()
        res = reconstruct(
            loss_fn,
            jnp.zeros((nsl, n, n), jnp.float32),
            loss_args=(psi0, props, ctfs, i_obs),
            iterations=iters,
            optimizer=make_optimizer("lbfgs"),
            metrics_every=256,
            project=positive_projection if proj else None,
        )
        wall = time.time() - t0
        v_rec = np.asarray(res.v)
        raw = float(
            np.linalg.norm(v_rec - v_true_host) / np.linalg.norm(v_true_host)
        )
        # gauge-fixed: the q=0 (global mean) component is an unobservable
        # phase offset — remove the mean difference before comparing
        shift = v_rec + (v_true_host.mean() - v_rec.mean())
        gauge = float(
            np.linalg.norm(shift - v_true_host) / np.linalg.norm(v_true_host)
        )
        rec = {
            "unit": unit,
            "workload": f"{n}^2 x {nsl} slices, {ntilt} tilts x {ndef} "
                        f"defoci (rings {rings} rad), lbfgs"
                        + (" + positivity" if proj else ""),
            "tik_weight": tikw,
            "tv_weight": tvw,
            "project": proj,
            "iters": iters,
            "loss_first": float(res.losses[0]),
            "loss_last": float(res.losses[-1]),
            "v_rel_err": raw,
            "v_rel_err_gauge_fixed": gauge,
            "steady_it_per_s": round(1.0 / max(res.median_step_s, 1e-9), 2),
            "wall_s": round(wall, 1),
            "backend": jax.default_backend(),
        }
        print(json.dumps(rec), flush=True)
        with open(RESULTS, "a") as fh:
            fh.write(json.dumps(rec) + "\n")
    return 0


if __name__ == "__main__":
    sys.exit(main())
