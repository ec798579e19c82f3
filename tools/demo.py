"""Demo: track an object through a frame directory (tennis clip by default).

Mirrors `tools/demo.py`: init from a box on frame 0, per-frame mask+refine track,
writes overlay frames (headless: saves instead of cv2.imshow).
"""
import argparse
import sys
import time
from glob import glob
from os import makedirs
from os.path import dirname, isdir, join, realpath

sys.path.insert(0, dirname(dirname(realpath(__file__))))

import cv2
import numpy as np


def main():
    parser = argparse.ArgumentParser(description="SiamMask-TPU demo")
    parser.add_argument("--config", required=True)
    parser.add_argument("--resume", default=None)
    parser.add_argument("--base-path", default="/root/reference/data/tennis")
    parser.add_argument("--box", default="300,110,165,250",
                        help="x,y,w,h init box (frame 0)")
    parser.add_argument("--out-dir", default=None, help="write overlays here")
    parser.add_argument("--box-only", action="store_true",
                        help="SiamRPN path: no mask branch")
    parser.add_argument("--platform", default=None, choices=["cpu", "tpu"],
                        help="force the JAX backend")
    args = parser.parse_args()

    if args.platform:
        from siammask_tpu.parallel.mesh import force_platform
        force_platform(args.platform)

    from siammask_tpu.config import Config
    from siammask_tpu.tracker.runtime import TrackerRuntime
    from tools.test import build_model, load_variables

    cfg = Config.load(args.config)
    model = build_model(cfg.arch, cfg.anchors.anchor_num)
    variables = load_variables(model, args.resume)
    runtime = TrackerRuntime(model, variables, cfg.tracker_config(),
                             mask=not args.box_only, refine=not args.box_only)

    img_files = sorted(glob(join(args.base_path, "*.jp*")))
    ims = [cv2.imread(f) for f in img_files]

    x, y, w, h = map(int, args.box.split(","))
    toc = 0.0
    warm = 0.0
    for f, im in enumerate(ims):
        tic = time.perf_counter()
        if f == 0:
            runtime.init(im, np.array([x + w / 2, y + h / 2]), np.array([w, h]))
        else:
            out = runtime.track(im, soft_mask=False)
        dt = time.perf_counter() - tic
        # frames 0-1 absorb the init/track compiles (minutes cold on the
        # remote compile service) — report them separately like the
        # reference's per-video FPS, which also excludes one-time setup
        if f <= 1:
            warm += dt
        else:
            toc += dt

        if args.out_dir and f > 0:
            if not isdir(args.out_dir):
                makedirs(args.out_dir)
            im_show = im.copy()
            if "mask_bin" in out:
                mask = out["mask_bin"].astype(bool)
                im_show[:, :, 2] = mask * 255 + (1 - mask) * im_show[:, :, 2]
                poly = np.asarray(out["polygon"], np.float64)
                if np.all(np.isfinite(poly)):  # untrained weights can emit NaN
                    cv2.polylines(im_show, [np.intp(poly).reshape(-1, 1, 2)],
                                  True, (0, 255, 0), 3)
            else:
                x0, y0 = out["target_pos"] - out["target_sz"] / 2
                x1, y1 = out["target_pos"] + out["target_sz"] / 2
                cv2.rectangle(im_show, (int(x0), int(y0)), (int(x1), int(y1)),
                              (0, 255, 0), 3)
            cv2.imwrite(join(args.out_dir, f"{f:05d}.jpg"), im_show)

    print(f"SiamMask-TPU demo: {len(ims)} frames, "
          f"init+compile {warm:.1f}s, "
          f"tracked {max(len(ims) - 2, 0)} frames in {toc:.2f}s "
          f"({max(len(ims) - 2, 0) / max(toc, 1e-9):.1f} fps)")


if __name__ == "__main__":
    main()
