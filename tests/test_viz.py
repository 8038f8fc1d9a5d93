"""Visual diagnostics: shapes, warp-diff correctness at the true pose."""

import jax
import numpy as np

from banet_tpu.data.synthetic import make_plane_scene_pair
from banet_tpu.utils.viz import (draw_correspondences, save_png,
                                 warp_diff_panel, warp_image)


def test_draw_correspondences_shapes(tmp_path):
    rng = np.random.default_rng(0)
    img1 = rng.integers(0, 255, (32, 48, 3)).astype(np.uint8)
    img2 = rng.integers(0, 255, (32, 48, 3)).astype(np.uint8)
    pts1 = rng.uniform(2, 44, (20, 2))
    pts2 = pts1 + 1.0
    mask = np.ones(20)
    mask[::3] = 0
    panel = draw_correspondences(img1, img2, pts1, pts2, mask)
    assert panel.shape == (32, 96, 3) and panel.dtype == np.uint8
    save_png(str(tmp_path / "c.png"), panel)
    assert (tmp_path / "c.png").exists()


def test_warp_diff_small_at_true_pose():
    pair = make_plane_scene_pair(jax.random.PRNGKey(0), batch=1,
                                 height=48, width=64)
    img1 = np.asarray(pair["image1"][0])
    img2 = np.asarray(pair["image2"][0])
    depth = np.asarray(pair["depth"][0])
    k = np.asarray([pair["intr"].fx[0], pair["intr"].fy[0],
                    pair["intr"].cx[0], pair["intr"].cy[0]])
    # At the TRUE pose the warped image matches view 1 (up to
    # resampling + occlusion); at identity it does not.
    w_true, valid = warp_image(img2, depth, np.asarray(pair["R_true"][0]),
                               np.asarray(pair["t_true"][0]), k)
    err_true = np.abs(img1 - w_true)[valid].mean()
    w_id, valid_id = warp_image(img2, depth, np.eye(3), np.zeros(3), k)
    err_id = np.abs(img1 - w_id)[valid_id].mean()
    assert err_true < err_id / 2, (err_true, err_id)

    panel = warp_diff_panel(img1, img2, depth,
                            np.asarray(pair["R_true"][0]),
                            np.asarray(pair["t_true"][0]), k)
    assert panel.shape == (48, 192, 3) and panel.dtype == np.uint8
