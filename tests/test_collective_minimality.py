"""Communication-minimality invariants (SURVEY.md §2.5 design).

The sharded window-BA step must cross devices exactly once per
iteration: one fused psum of the tiny Schur partials.  We compile the
step on the 8-device virtual mesh and count collective ops in the
optimized HLO — a regression here means someone introduced extra
synchronization into the hot path.
"""

import re

import jax
import jax.numpy as jnp
import pytest

from banet_tpu.config import SolverConfig
from banet_tpu.geometry.camera import Intrinsics
from banet_tpu.parallel.mesh import make_mesh
from banet_tpu.parallel.window_ba import sharded_window_ba_step


@pytest.mark.multichip
def test_window_ba_single_fused_psum():
    F, H, W, C, N, K = 8, 32, 40, 4, 64, 4
    mesh = make_mesh(data=1, frame=8)
    key = jax.random.PRNGKey(0)
    intr = Intrinsics(jnp.array([30.0]), jnp.array([30.0]),
                      jnp.array([W / 2.0]), jnp.array([H / 2.0]))
    ref = jax.random.normal(key, (N, C))
    tgt = jax.random.normal(jax.random.fold_in(key, 1), (F, H, W, 3 * C))
    rays = jnp.concatenate([jax.random.normal(
        jax.random.fold_in(key, 2), (N, 2)) * 0.1,
        jnp.ones((N, 1))], axis=-1)
    depth = jnp.full((N,), 3.0)
    basis = 0.1 * jax.random.normal(jax.random.fold_in(key, 3), (N, K))
    Rs = jnp.broadcast_to(jnp.eye(3), (F, 3, 3))
    ts = jnp.zeros((F, 3))
    W0 = jnp.zeros((K,))
    cfg = SolverConfig()

    fn = jax.jit(lambda *a: sharded_window_ba_step(mesh, *a, intr, 1e-3,
                                                   cfg))
    hlo = fn.lower(ref, tgt, rays, depth, basis, Rs, ts,
                   W0).compile().as_text()
    collectives = re.findall(
        r"(all-reduce|all-gather|reduce-scatter|collective-permute"
        r"|all-to-all)", hlo)
    # XLA splits the psum tuple into one all-reduce per operand (4) and
    # may emit start/done pairs; the invariant is O(1) collectives of
    # all-reduce type only — never O(F)/O(N)/per-block, and no gathers
    # or permutes in the hot path.
    assert 1 <= len(collectives) <= 8, collectives
    assert all(c == "all-reduce" for c in collectives), collectives
