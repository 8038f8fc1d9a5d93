"""Native (C++) runtime: decode parity vs PIL, prefetcher ordering,
point-selection contract.  Skipped when the toolchain is unavailable."""

import os

import numpy as np
import pytest

from banet_tpu.runtime import (Prefetcher, decode_depth, decode_rgb,
                               native_available, png_dims,
                               sobel_select_points)

pytestmark = pytest.mark.skipif(not native_available(),
                                reason="native runtime not built")


@pytest.fixture(scope="module")
def pngs(tmp_path_factory):
    from PIL import Image

    d = tmp_path_factory.mktemp("pngs")
    rng = np.random.default_rng(0)
    imgs, deps, rps, dps = [], [], [], []
    for i in range(4):
        img = rng.integers(0, 255, (32, 40, 3), dtype=np.uint8)
        dep = (rng.uniform(1, 4, (32, 40)) * 5000).astype(np.uint16)
        rp = str(d / f"r{i}.png")
        dp = str(d / f"d{i}.png")
        Image.fromarray(img).save(rp)
        Image.fromarray(dep).save(dp)
        imgs.append(img)
        deps.append(dep)
        rps.append(rp)
        dps.append(dp)
    return imgs, deps, rps, dps


def test_decode_parity_with_pil(pngs):
    imgs, deps, rps, dps = pngs
    h, w, c, bd = png_dims(rps[0])
    assert (h, w, c, bd) == (32, 40, 3, 8)
    assert png_dims(dps[0])[3] == 16
    rgb = decode_rgb(rps[1], 32, 40)
    np.testing.assert_allclose(rgb, imgs[1].astype(np.float32))
    dep = decode_depth(dps[2], 32, 40)
    np.testing.assert_allclose(dep, deps[2] / 5000.0, atol=1e-6)


def test_prefetcher_in_order(pngs):
    imgs, deps, rps, dps = pngs
    # More frames than capacity to exercise slot reuse.
    order = [0, 1, 2, 3, 1, 0, 3, 2, 0, 1]
    with Prefetcher([rps[i] for i in order], [dps[i] for i in order],
                    32, 40, num_threads=3, capacity=3) as pf:
        for k, (rgb, dep) in enumerate(pf):
            i = order[k]
            np.testing.assert_allclose(rgb, imgs[i].astype(np.float32))
            np.testing.assert_allclose(dep, deps[i] / 5000.0, atol=1e-6)
    assert k == len(order) - 1


def test_prefetcher_rgb_only(pngs):
    imgs, deps, rps, dps = pngs
    with Prefetcher(rps, None, 32, 40) as pf:
        frames = list(pf)
    assert len(frames) == 4
    assert frames[0][1] is None


def test_sobel_select_points_contract(pngs):
    imgs, deps, rps, dps = pngs
    rgb = imgs[0].astype(np.float32)
    depth = deps[0].astype(np.float32) / 5000.0
    pts, ds = sobel_select_points(rgb, depth, 64, texture_threshold=10.0,
                                  seed=7)
    assert pts.shape == (1, 64, 2) and ds.shape == (1, 64, 1)
    assert np.all(ds > 0)
    xs, ys = pts[0, :, 0].astype(int), pts[0, :, 1].astype(int)
    np.testing.assert_allclose(ds[0, :, 0], depth[ys, xs])
    # Reproducible for a fixed seed.
    pts2, _ = sobel_select_points(rgb, depth, 64, texture_threshold=10.0,
                                  seed=7)
    np.testing.assert_array_equal(pts, pts2)


def test_zero_depth_relaxation(pngs):
    imgs, deps, rps, dps = pngs
    rgb = imgs[0].astype(np.float32)
    depth = np.zeros((32, 40), np.float32)
    depth[10:14, 10:14] = 2.0
    pts, ds = sobel_select_points(rgb, depth, 16, texture_threshold=1e9)
    assert np.all(ds == 2.0)
