"""Camera retargeting (data/retarget.py — reference deeptam
view_utils.py:70-143 semantics): geometric correctness against the
analytic renderer, identity behavior, and border padding."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from banet_tpu.data.retarget import (adjust_intrinsics,
                                     default_retarget_intrinsics)
from banet_tpu.data.synthetic import make_plane_scene
from banet_tpu.geometry.camera import Intrinsics


def _render(key, intr4, H, W):
    render, _ = make_plane_scene(key, num_planes=3)
    intr = Intrinsics(jnp.array([intr4[0]]), jnp.array([intr4[1]]),
                      jnp.array([intr4[2]]), jnp.array([intr4[3]]))
    rgb, d = render(jnp.eye(3), jnp.zeros(3), intr, H, W)
    return np.asarray(rgb), np.asarray(d)


def test_identity_retarget_is_noop():
    key = jax.random.PRNGKey(0)
    k = [50.0, 50.0, 32.0, 24.0]
    rgb, d = _render(key, k, 48, 64)
    out, dout = adjust_intrinsics(rgb, d, k, k, (48, 64))
    # uint8 round-trip only.
    assert np.abs(out - np.clip(rgb, 0, 255).astype(np.uint8)).max() <= 1
    np.testing.assert_allclose(dout, d, atol=1e-5)


def test_retarget_matches_direct_render():
    """Retargeting a rendered view to new intrinsics must match
    rendering directly with those intrinsics (same camera pose — the
    operation is purely 2D)."""
    key = jax.random.PRNGKey(1)
    H, W = 64, 80
    k_src = [60.0, 60.0, W / 2.0, H / 2.0]
    rgb_src, d_src = _render(key, k_src, H, W)
    # New camera: 1.5x focal, smaller crop, shifted principal point.
    Hn, Wn = 48, 64
    k_new = [90.0, 90.0, Wn / 2.0 + 3.0, Hn / 2.0 - 2.0]
    rgb_got, d_got = adjust_intrinsics(rgb_src, d_src, k_src, k_new,
                                       (Hn, Wn))
    rgb_want, d_want = _render(key, k_new, Hn, Wn)

    # Interior comparison (resampling kernels differ at edges).
    a = rgb_got[4:-4, 4:-4]
    b = np.clip(rgb_want[4:-4, 4:-4], 0, 255)
    assert np.abs(a - b).mean() < 6.0, np.abs(a - b).mean()
    # Depth: NEAREST resample of a smooth field.
    dd = np.abs(d_got[4:-4, 4:-4] - d_want[4:-4, 4:-4])
    assert np.median(dd) < 0.02, np.median(dd)


def test_out_of_range_crop_pads():
    key = jax.random.PRNGKey(2)
    k = [50.0, 50.0, 32.0, 24.0]
    rgb, d = _render(key, k, 48, 64)
    # Principal point far right -> crop extends left of the image.
    k_new = [50.0, 50.0, 60.0, 24.0]
    out, dout = adjust_intrinsics(rgb, d, k, k_new, (48, 64))
    assert np.all(out[:, :20] == 127.0)   # gray padding
    assert np.all(dout[:, :20] == 0.0)    # invalid depth
    assert out[:, 40:].std() > 1.0        # real content survives


def test_default_retarget_intrinsics_plain_resize():
    k = default_retarget_intrinsics([100.0, 100.0, 40.0, 30.0],
                                    (60, 80), (120, 160))
    np.testing.assert_allclose(k, [200.0, 200.0, 80.0, 60.0])


def test_make_retarget_fn_binds_source_intrinsics_by_value():
    """Regression for ADVICE r4 (high): the CLI builds its retarget
    callable and then REBINDS the intrinsics variable to the target
    calibration; the original inline closure late-bound it and so
    resampled with src == dst (sx=sy=1 — frames never rescaled while
    the tracker was handed the new intrinsics).  The factory must bind
    by value: mutate/rebind everything after construction and the
    output must still match a direct render at the target
    intrinsics."""
    from banet_tpu.cli import make_retarget_fn

    key = jax.random.PRNGKey(1)
    H, W = 64, 80
    k_src = np.asarray([60.0, 60.0, W / 2.0, H / 2.0], np.float32)
    rgb_src, d_src = _render(key, k_src, H, W)
    Hn, Wn = 48, 64
    k_new = np.asarray([90.0, 90.0, Wn / 2.0 + 3.0, Hn / 2.0 - 2.0],
                       np.float32)

    fn = make_retarget_fn(k_src, k_new, (Hn, Wn))
    # The CLI's exact hazard pattern: the caller's arrays are rebound /
    # mutated after the factory returns.
    k_src[:] = k_new            # in-place mutation of the source array
    k_src = k_new               # and rebinding of the name
    rgb_got, d_got = fn(rgb_src, d_src)

    rgb_want, d_want = _render(key, k_new, Hn, Wn)
    a = rgb_got[4:-4, 4:-4]
    b = np.clip(rgb_want[4:-4, 4:-4], 0, 255)
    # With the late-binding bug this is a no-scale center crop: mean
    # abs error vs the direct render measures ~40 gray levels; correct
    # rescaling lands well under 6 (same bound as
    # test_retarget_matches_direct_render).
    assert np.abs(a - b).mean() < 6.0, np.abs(a - b).mean()
    dd = np.abs(d_got[4:-4, 4:-4] - d_want[4:-4, 4:-4])
    assert np.median(dd) < 0.02, np.median(dd)


@pytest.mark.slow
def test_cli_odometry_retarget(tmp_path):
    import json
    import subprocess
    import sys

    from banet_tpu.data.synthetic import write_rendered_sequence

    seq_dir = str(tmp_path / "seq")
    write_rendered_sequence(seq_dir, num_frames=3, size=(48, 64), seed=3)
    out = str(tmp_path / "traj.txt")
    import os
    env = dict(os.environ, JAX_PLATFORMS="cpu", PALLAS_AXON_POOL_IPS="")
    proc = subprocess.run(
        [sys.executable, "-m", "banet_tpu.cli", "odometry", seq_dir,
         "--out", out, "--num-points", "16", "--max-frames", "3",
         "--retarget", "32", "64"],
        capture_output=True, text=True, env=env, timeout=1200)
    assert proc.returncode == 0, proc.stderr[-2000:]
    rec = json.loads(proc.stdout.strip().splitlines()[-1])
    assert rec["frames"] == 3
    assert len(open(out).read().strip().splitlines()) == 3
