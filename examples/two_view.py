"""Two-view pose tracking example (the legacy/example.py workflow).

Usage:
    python examples/two_view.py <rgb1.png> <rgb2.png> <depth1.png> \
        [fx fy cx cy]

Reads an RGB pair + the reference frame's 16-bit depth PNG (TUM
scaling), selects textured points, tracks, and prints the relative
pose.  With no arguments, runs on a generated synthetic pair.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import numpy as np


def main():
    from banet_tpu.config import default_config
    from banet_tpu.data.points import select_points
    from banet_tpu.eval.trajectory import _rot_to_quat
    from banet_tpu.tracking import TwoViewTracker

    if len(sys.argv) >= 4:
        from banet_tpu.runtime import decode_depth, decode_rgb, png_dims

        h, w, _, _ = png_dims(sys.argv[1])
        img1 = decode_rgb(sys.argv[1], h, w)
        img2 = decode_rgb(sys.argv[2], h, w)
        depth1 = decode_depth(sys.argv[3], h, w)
        k = ([float(v) for v in sys.argv[4:8]] if len(sys.argv) >= 8
             else [535.4, 539.2, 320.1, 247.6])
    else:
        print("no inputs given - using a synthetic pair")
        import jax

        from banet_tpu.data.synthetic import make_synthetic_image_pair

        pair = make_synthetic_image_pair(jax.random.PRNGKey(0), batch=1,
                                         height=128, width=160)
        img1 = np.asarray(pair["image1"][0])
        img2 = np.asarray(pair["image2"][0])
        depth1 = np.asarray(pair["depth"][0])
        k = [float(v) for v in np.asarray(pair["intr"].as_array()[0])]

    tracker = TwoViewTracker.initialize(default_config(),
                                        image_size=img1.shape[:2],
                                        num_points=1024)
    pts, depths = select_points(img1, depth1, 1024)
    R, t, keep = tracker.track(img1, img2, k, pts, depths)
    q = _rot_to_quat(R[0])
    print(f"keep_ratio: {float(keep[0]):.3f}")
    print(f"q (xyzw):   {np.round(q, 6).tolist()}")
    print(f"t (m):      {np.round(t[0], 6).tolist()}")


if __name__ == "__main__":
    main()
