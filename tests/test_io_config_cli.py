"""I/O, config and CLI tests (SURVEY §4 unit tier for C1/C2/C18)."""

import json
import os
import subprocess
import sys

import numpy as np
import pytest

from fdes_tpu import io
from fdes_tpu.config import (
    Config,
    apply_overrides,
    config_from_dict,
    load_config,
    load_legacy_params,
)

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_raw_roundtrip_real(tmp_path, rng):
    a = rng.normal(size=(4, 8, 8)).astype(np.float32)
    p = str(tmp_path / "a.bin")
    io.write_raw(p, a)
    b = io.read_raw(p, a.shape, np.float32)
    np.testing.assert_array_equal(a, b)


def test_raw_roundtrip_complex_interleaved(tmp_path, rng):
    a = (rng.normal(size=(8, 8)) + 1j * rng.normal(size=(8, 8))).astype(np.complex64)
    p = str(tmp_path / "c.bin")
    io.write_raw(p, a)
    b = io.read_raw(p, a.shape, np.float32, complex_interleaved=True)
    np.testing.assert_array_equal(a, b)
    # byte layout is float2-style interleaved pairs
    flat = np.fromfile(p, np.float32)
    np.testing.assert_array_equal(flat[:2], [a.real.ravel()[0], a.imag.ravel()[0]])


def test_raw_shape_mismatch(tmp_path, rng):
    p = str(tmp_path / "a.bin")
    io.write_raw(p, np.zeros(10, np.float32))
    with pytest.raises(ValueError):
        io.read_raw(p, (11,), np.float32)


def test_config_toml_and_overrides(tmp_path):
    p = tmp_path / "c.toml"
    p.write_text(
        """
mode = "hrtem"
output_dir = "o"
[sim]
ny = 64
nx = 64
nslices = 8
[optics]
defoci_A = [-100.0, 0.0, 100.0]
cs_A = 1.2e7
"""
    )
    cfg = load_config(str(p))
    assert cfg.mode == "hrtem" and cfg.sim.ny == 64
    assert cfg.optics.defoci_A == (-100.0, 0.0, 100.0)
    cfg2 = apply_overrides(cfg, ["sim.nslices=16", "mode=forward"])
    assert cfg2.sim.nslices == 16 and cfg2.mode == "forward"
    with pytest.raises(KeyError):
        config_from_dict({"nope": 1})
    with pytest.raises(KeyError):
        config_from_dict({"sim": {"bogus_key": 1}})
    with pytest.raises(ValueError):
        apply_overrides(cfg, ["sim.ny.deep=1"])


def test_legacy_param_reader(tmp_path):
    p = tmp_path / "legacy.txt"
    p.write_text(
        """
# FDES-style input
voltage: 300e3   # volts
grid = 256 256
slices 16
atoms_file: specimen.xyz
"""
    )
    d = load_legacy_params(str(p))
    assert d["voltage"] == 300e3.__float__()
    assert d["grid"] == [256, 256]
    assert d["slices"] == 16
    assert d["atoms_file"] == "specimen.xyz"


CLI_ENV = dict(
    os.environ,
    JAX_PLATFORMS="cpu",
    XLA_FLAGS="--xla_force_host_platform_device_count=1",
    PYTHONPATH=REPO,
)


def _write_small_cfg(tmp_path, mode, extra=""):
    cfg = tmp_path / "cfg.toml"
    cfg.write_text(
        f"""
mode = "{mode}"
output_dir = "{tmp_path}/out"
[sim]
ny = 32
nx = 32
nslices = 4
[specimen]
reps = [1, 1, 1]
[optics]
defoci_A = [-100.0, 100.0]
[stem]
scan_ny = 2
scan_nx = 2
semiangle_rad = 0.025
[recon]
iterations = 5
lr = 2.0
{extra}
"""
    )
    return cfg


@pytest.mark.parametrize("mode,outfile", [("forward", "exit_wave.npy"),
                                          ("hrtem", "images.npy"),
                                          ("stem", "stem.npy")])
def test_cli_modes_end_to_end(tmp_path, mode, outfile):
    cfg = _write_small_cfg(tmp_path, mode)
    r = subprocess.run(
        [sys.executable, "-m", "fdes_tpu.cli", str(cfg)],
        env=CLI_ENV, capture_output=True, text=True, timeout=300, cwd=REPO,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    out = np.load(tmp_path / "out" / outfile)
    assert np.all(np.isfinite(np.abs(out)))


def test_cli_forward_thickness_series(tmp_path):
    cfg = _write_small_cfg(tmp_path, "forward")
    text = cfg.read_text().replace("[sim]", "[sim]\nthickness_every = 2\n")
    cfg.write_text(text)
    r = subprocess.run(
        [sys.executable, "-m", "fdes_tpu.cli", str(cfg)],
        env=CLI_ENV, capture_output=True, text=True, timeout=300, cwd=REPO,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    series = np.load(tmp_path / "out" / "thickness_series.npy")
    exit_wave = np.load(tmp_path / "out" / "exit_wave.npy")
    assert series.shape == (2, 32, 32)
    np.testing.assert_allclose(series[-1], exit_wave, atol=1e-6)


def test_cli_stem_prism_matches_multislice(tmp_path):
    """stem.method='prism' at interp=1 reproduces the exact raster."""
    sigs = {}
    for method in ("multislice", "prism"):
        cfg = _write_small_cfg(tmp_path, "stem")
        text = cfg.read_text().replace(
            "[stem]", f'[stem]\nmethod = "{method}"\nprism_interp = 1\n'
        ).replace(f"{tmp_path}/out", f"{tmp_path}/out_{method}")
        cfg.write_text(text)
        r = subprocess.run(
            [sys.executable, "-m", "fdes_tpu.cli", str(cfg)],
            env=CLI_ENV, capture_output=True, text=True, timeout=300, cwd=REPO,
        )
        assert r.returncode == 0, r.stderr[-2000:]
        sigs[method] = np.load(tmp_path / f"out_{method}" / "stem.npy")
    np.testing.assert_allclose(sigs["prism"], sigs["multislice"], rtol=1e-4, atol=1e-6)


def test_cli_invert_self_test(tmp_path):
    cfg = _write_small_cfg(tmp_path, "invert")
    r = subprocess.run(
        [sys.executable, "-m", "fdes_tpu.cli", str(cfg)],
        env=CLI_ENV, capture_output=True, text=True, timeout=300, cwd=REPO,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    v = np.load(tmp_path / "out" / "reconstructed.npy")
    assert v.shape == (4, 32, 32)
    metrics = [json.loads(l) for l in open(tmp_path / "out" / "metrics.jsonl")]
    assert len(metrics) == 5
    assert metrics[-1]["loss"] < metrics[0]["loss"]
    assert (tmp_path / "out" / "checkpoint.npz").exists()


def test_cli_invert_stem4d_modality(tmp_path):
    """Ptychography-style inverse through the CLI (recon.modality=stem4d),
    self-test mode: loss must fall on the synthetic 4D data."""
    cfg = _write_small_cfg(tmp_path, "invert")
    text = cfg.read_text().replace(
        "[recon]\niterations = 5\nlr = 2.0",
        '[recon]\nmodality = "stem4d"\niterations = 8\nlr = 2.0',
    )
    cfg.write_text(text)
    r = subprocess.run(
        [sys.executable, "-m", "fdes_tpu.cli", str(cfg)],
        env=CLI_ENV, capture_output=True, text=True, timeout=300, cwd=REPO,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    metrics = [json.loads(l) for l in open(tmp_path / "out" / "metrics.jsonl")]
    assert metrics[-1]["loss"] < metrics[0]["loss"]


def test_cli_hrtem_with_detector_noise(tmp_path):
    cfg = _write_small_cfg(
        tmp_path,
        "hrtem",
        extra="[detector]\nmtf_sigma_px = 0.5\ndose_per_px = 100.0\napply_noise = true\n",
    )
    r = subprocess.run(
        [sys.executable, "-m", "fdes_tpu.cli", str(cfg)],
        env=CLI_ENV, capture_output=True, text=True, timeout=300, cwd=REPO,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    imgs = np.load(tmp_path / "out" / "images.npy")
    # Poisson noise quantises to multiples of 1/dose
    frac = imgs * 100.0 - np.round(imgs * 100.0)
    assert np.abs(frac).max() < 1e-4


def test_cli_phonon_and_absorptive_and_engine(tmp_path):
    cfg = _write_small_cfg(tmp_path, "hrtem")
    # append extra sim keys (toml: must go under [sim], so rewrite)
    text = cfg.read_text().replace(
        "[sim]", "[sim]\nphonon_configs = 2\nabsorptive_factor = 0.05\n"
    )
    cfg.write_text(text)
    r = subprocess.run(
        [sys.executable, "-m", "fdes_tpu.cli", str(cfg)],
        env=CLI_ENV, capture_output=True, text=True, timeout=300, cwd=REPO,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    imgs = np.load(tmp_path / "out" / "images.npy")
    assert np.all(np.isfinite(imgs))
    # absorption strictly lowers the mean intensity below 1 (plane wave in)
    assert imgs.mean() < 1.0


def test_cli_tilt_series_invert_and_stem4d(tmp_path):
    cfg = _write_small_cfg(tmp_path, "invert")
    text = cfg.read_text().replace(
        "[sim]",
        "[sim]\ntilt_series_rad = [[0.0, 0.0], [0.02, 0.0], [0.0, 0.02], [-0.02, 0.0]]\n",
    )
    cfg.write_text(text)
    r = subprocess.run(
        [sys.executable, "-m", "fdes_tpu.cli", str(cfg)],
        env=CLI_ENV, capture_output=True, text=True, timeout=300, cwd=REPO,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    metrics = [json.loads(l) for l in open(tmp_path / "out" / "metrics.jsonl")]
    assert metrics[-1]["loss"] < metrics[0]["loss"]

    cfg4 = _write_small_cfg(tmp_path, "stem4d")
    r = subprocess.run(
        [sys.executable, "-m", "fdes_tpu.cli", str(cfg4)],
        env=CLI_ENV, capture_output=True, text=True, timeout=300, cwd=REPO,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    cbed = np.load(tmp_path / "out" / "cbed.npy")
    assert cbed.shape == (2, 2, 32, 32)
    assert np.all(np.isfinite(cbed))


def test_cli_stem_dpc_and_com(tmp_path):
    """STEM mode with segmented DPC detectors + iCOM raster output."""
    cfg = _write_small_cfg(tmp_path, "stem")
    r = subprocess.run(
        [sys.executable, "-m", "fdes_tpu.cli", str(cfg),
         "--set", "stem.dpc_nseg=4", "--set", "stem.compute_com=true"],
        env=CLI_ENV, capture_output=True, text=True, timeout=300, cwd=REPO,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    stem = np.load(tmp_path / "out" / "stem.npy")
    assert stem.shape == (1 + 4, 2, 2)  # annular + 4 DPC sectors
    # DPC sectors partition the annulus: their sum equals the full annular
    # signal of the same (inner, outer) range
    np.testing.assert_allclose(stem[1:].sum(axis=0), stem[0], rtol=1e-5)
    com = np.load(tmp_path / "out" / "stem_com.npy")
    assert com.shape == (2, 2, 2) and np.isfinite(com).all()


def test_example_configs_parse():
    """Every shipped example config loads through the typed config system."""
    import glob

    from fdes_tpu.config import load_config

    paths = sorted(glob.glob(os.path.join(REPO, "examples", "*.toml")))
    assert len(paths) >= 4
    for p in paths:
        cfg = load_config(p)
        assert cfg.mode in ("forward", "hrtem", "stem", "stem4d", "invert")


def test_cli_hrtem_explicit_coherence(tmp_path):
    """optics.coherence='explicit' runs the quadrature TCC path end-to-end
    and converges to the envelope images in this weak-contrast regime."""
    imgs = {}
    for coh in ("envelope", "explicit"):
        cfg = _write_small_cfg(tmp_path, "hrtem")
        text = cfg.read_text().replace(
            "[optics]",
            "[optics]\n"
            f'coherence = "{coh}"\n'
            "defocus_spread_A = 20.0\n"
            "source_semiangle_rad = 0.0003\n"
            "quad_defocus = 9\nquad_tilt = 5\n",
        ).replace(f"{tmp_path}/out", f"{tmp_path}/out_{coh}")
        cfg.write_text(text)
        r = subprocess.run(
            [sys.executable, "-m", "fdes_tpu.cli", str(cfg)],
            env=CLI_ENV, capture_output=True, text=True, timeout=300, cwd=REPO,
        )
        assert r.returncode == 0, r.stderr[-2000:]
        imgs[coh] = np.load(tmp_path / f"out_{coh}" / "images.npy")
    assert imgs["explicit"].shape == imgs["envelope"].shape
    # Si phases here are not weak (sigma*V ~ 1 rad), so only demand the
    # models agree at the few-percent level; equality in the weak-phase
    # limit is pinned in tests/test_physics.py.
    scale = np.abs(imgs["envelope"] - imgs["envelope"].mean()).max()
    assert np.abs(imgs["explicit"] - imgs["envelope"]).max() < 0.2 * scale

def test_cli_invert_sharded_equals_single_device(tmp_path):
    """C19 product path: `fdes-tpu invert` on an 8-device mesh shards the
    defocus series (pipeline.shard_sim) and reconstructs the SAME potential
    as a single-device run (GSPMD DP is semantics-preserving)."""
    results = {}
    for ndev in (1, 8):
        cfg = _write_small_cfg(tmp_path, "invert")
        text = cfg.read_text().replace(
            "defoci_A = [-100.0, 100.0]",
            "defoci_A = [-400.0, -300.0, -200.0, -100.0, "
            "100.0, 200.0, 300.0, 400.0]",
        ).replace(f"{tmp_path}/out", f"{tmp_path}/out_{ndev}")
        cfg.write_text(text)
        env = dict(CLI_ENV, XLA_FLAGS=f"--xla_force_host_platform_device_count={ndev}")
        r = subprocess.run(
            [sys.executable, "-m", "fdes_tpu.cli", str(cfg)],
            env=env, capture_output=True, text=True, timeout=300, cwd=REPO,
        )
        assert r.returncode == 0, r.stderr[-2000:]
        results[ndev] = np.load(tmp_path / f"out_{ndev}" / "reconstructed.npy")
    # Tolerance: psum over 8 shards reorders the f32 gradient reduction
    # (~1e-7/step), and 5 iterations at lr=2.0 amplify that through the
    # optimization dynamics.  Step-level sharded==single equality is pinned
    # tightly in tests/test_sharding.py; this test asserts the CLI wiring.
    np.testing.assert_allclose(results[8], results[1], rtol=2e-3, atol=2e-4)


def test_cli_stem_sharded_equals_single_device(tmp_path):
    """STEM raster through the CLI: probe positions sharded over 8 devices
    produce the same signals as single-device (scan is 2x4=8 probes)."""
    results = {}
    for ndev in (1, 8):
        cfg = _write_small_cfg(tmp_path, "stem")
        text = cfg.read_text().replace(
            "scan_nx = 2", "scan_nx = 4"
        ).replace(f"{tmp_path}/out", f"{tmp_path}/out_stem{ndev}")
        cfg.write_text(text)
        env = dict(CLI_ENV, XLA_FLAGS=f"--xla_force_host_platform_device_count={ndev}")
        r = subprocess.run(
            [sys.executable, "-m", "fdes_tpu.cli", str(cfg)],
            env=env, capture_output=True, text=True, timeout=300, cwd=REPO,
        )
        assert r.returncode == 0, r.stderr[-2000:]
        results[ndev] = np.load(tmp_path / f"out_stem{ndev}" / "stem.npy")
    np.testing.assert_allclose(results[8], results[1], rtol=1e-5, atol=1e-8)


def test_cli_invert_gridsharded_equals_single_device(tmp_path):
    """Tensor-parallel product path (VERDICT round-2 missing item 1):
    `fdes-tpu invert` with a mesh axis named 'grid' row-shards the field
    and the potential gradient, and reconstructs the SAME potential as a
    single-device run.  Also exercises the ('data', 'grid') composition."""
    results = {}
    meshes = {
        "1dev": ("", 1),
        "grid8": ('axis_names = ["grid"]\nshape = [8]', 8),
        "data2grid4": ('axis_names = ["data", "grid"]\nshape = [2, 4]', 8),
    }
    for name, (mesh_toml, ndev) in meshes.items():
        cfg = _write_small_cfg(tmp_path, "invert")
        text = cfg.read_text().replace(
            f"{tmp_path}/out", f"{tmp_path}/out_gs_{name}"
        )
        if mesh_toml:
            text += f"\n[mesh]\n{mesh_toml}\n"
        cfg.write_text(text)
        env = dict(CLI_ENV, XLA_FLAGS=f"--xla_force_host_platform_device_count={ndev}")
        r = subprocess.run(
            [sys.executable, "-m", "fdes_tpu.cli", str(cfg)],
            env=env, capture_output=True, text=True, timeout=300, cwd=REPO,
        )
        assert r.returncode == 0, r.stderr[-2000:]
        results[name] = np.load(tmp_path / f"out_gs_{name}" / "reconstructed.npy")
    # Distributed-FFT reduction order perturbs the f32 gradient at ~1e-7;
    # 5 iterations at lr=2.0 amplify it (same tolerance rationale as the
    # DP-sharded CLI test above).
    np.testing.assert_allclose(results["grid8"], results["1dev"], rtol=2e-3, atol=2e-4)
    np.testing.assert_allclose(
        results["data2grid4"], results["1dev"], rtol=2e-3, atol=2e-4
    )


def test_cli_forward_gridsharded_equals_single_device(tmp_path):
    results = {}
    for name, mesh_toml, ndev in (
        ("1dev", "", 1),
        ("grid8", '[mesh]\naxis_names = ["grid"]\nshape = [8]', 8),
    ):
        cfg = _write_small_cfg(tmp_path, "forward")
        text = cfg.read_text().replace(
            f"{tmp_path}/out", f"{tmp_path}/out_fgs_{name}"
        ) + f"\n{mesh_toml}\n"
        cfg.write_text(text)
        env = dict(CLI_ENV, XLA_FLAGS=f"--xla_force_host_platform_device_count={ndev}")
        r = subprocess.run(
            [sys.executable, "-m", "fdes_tpu.cli", str(cfg)],
            env=env, capture_output=True, text=True, timeout=300, cwd=REPO,
        )
        assert r.returncode == 0, r.stderr[-2000:]
        results[name] = np.load(tmp_path / f"out_fgs_{name}" / "exit_wave.npy")
    np.testing.assert_allclose(results["grid8"], results["1dev"], rtol=1e-5, atol=1e-8)


def test_cli_forward_streamed_equals_prebuilt(tmp_path):
    """sim.streamed routes `fdes-tpu forward` through multislice_streamed
    (potential built inside the scan — the pod-memory policy, BASELINE.md)
    and reproduces the prebuilt-stack exit wave."""
    results = {}
    for name, extra in (("stack", ""), ("streamed", "streamed = true")):
        cfg = _write_small_cfg(tmp_path, "forward")
        text = cfg.read_text().replace(
            f"{tmp_path}/out", f"{tmp_path}/out_st_{name}"
        ).replace("[sim]", f"[sim]\n{extra}")
        cfg.write_text(text)
        r = subprocess.run(
            [sys.executable, "-m", "fdes_tpu.cli", str(cfg)],
            env=CLI_ENV, capture_output=True, text=True, timeout=300, cwd=REPO,
        )
        assert r.returncode == 0, r.stderr[-2000:]
        results[name] = np.load(tmp_path / f"out_st_{name}" / "exit_wave.npy")
        if name == "streamed":  # the stack must NOT be written (never built)
            assert not (tmp_path / f"out_st_{name}" / "potential.npy").exists()
    # f32 device dtype: the per-slice rfft2 build reorders the scatter sums
    # vs the batched builder (~1e-6 abs on unit-amplitude waves)
    np.testing.assert_allclose(
        results["streamed"], results["stack"], rtol=1e-5, atol=1e-5
    )


def test_cli_streamed_invert_rejected(tmp_path):
    cfg = _write_small_cfg(tmp_path, "invert")
    cfg.write_text(cfg.read_text().replace("[sim]", "[sim]\nstreamed = true"))
    r = subprocess.run(
        [sys.executable, "-m", "fdes_tpu.cli", str(cfg)],
        env=CLI_ENV, capture_output=True, text=True, timeout=300, cwd=REPO,
    )
    assert r.returncode != 0
    assert "streamed" in (r.stderr + r.stdout)
