"""AMV-Bench replay CLI (rebuild of Examples/MultiCamera/multicam_amv.cc).

Loads the run YAML + per-camera JSON calibration, reads per-camera timestamp
files with zero-padded image names (System::LoadAmvImages), replays the
sequence with real-time pacing, prints median/mean tracking time
(multicam_amv.cc:120-128), and saves the TUM trajectory named by sequence
index.

Usage:
    python examples/multicam_amv.py <config.yaml> [--seq N] [--out DIR]
        [--no-realtime] [--max-frames N]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from amcslam_tpu.frontend.features import build_frame, make_extractors
from amcslam_tpu.pipeline.config import load_config
from amcslam_tpu.pipeline.system import System
from amcslam_tpu.utils.io import load_amv_images
from amcslam_tpu.utils.timing import GLOBAL_TIMER


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("config")
    ap.add_argument("--seq", type=int, default=0)
    ap.add_argument("--out", default=".")
    ap.add_argument("--no-realtime", action="store_true")
    ap.add_argument("--max-frames", type=int, default=0)
    args = ap.parse_args()

    import cv2

    cfg = load_config(args.config)
    rig = cfg.rig
    n_cams = rig.n_cams
    ticks, stamps = load_amv_images(cfg.dataset_path, n_cams)
    if args.max_frames:
        ticks, stamps = ticks[: args.max_frames], stamps[: args.max_frames]
    print(f"{len(ticks)} ticks, {n_cams} cameras")

    extractors = make_extractors(n_cams, cfg.n_features)
    slam = System(rig, cfg.tracking, enable_loop_closing=cfg.loop_closing,
                  b_extrinsic=cfg.extrinsic_refine)

    track_times = []
    t_wall0 = time.time()
    for k, (paths, ts) in enumerate(zip(ticks, stamps)):
        imgs = [cv2.imread(p, cv2.IMREAD_GRAYSCALE) for p in paths[:-1]]
        right = cv2.imread(paths[-1], cv2.IMREAD_GRAYSCALE)
        if any(i is None for i in imgs):
            print(f"missing image at tick {k}; skipping")
            continue
        with GLOBAL_TIMER.span("frame_total"):
            frame = build_frame(imgs, ts, rig, extractors, right_image=right)
            t0 = time.time()
            slam.track_multicamera(frame)
            track_times.append(time.time() - t0)
        if not args.no_realtime and k + 1 < len(ticks):
            lag = (stamps[k + 1][-1] - ts[-1]) - (time.time() - t_wall0)
            if lag > 0:
                time.sleep(lag)

    tt = np.array(track_times)
    print(f"median tracking time: {np.median(tt)*1e3:.2f} ms")
    print(f"mean tracking time:   {np.mean(tt)*1e3:.2f} ms")
    GLOBAL_TIMER.print_stats()

    out = os.path.join(args.out, f"f_{args.seq}.txt")
    slam.save_trajectory_tum(out)
    kf_out = os.path.join(args.out, f"kf_{args.seq}.txt")
    slam.save_keyframe_trajectory_tum(kf_out)
    print(f"saved {out}, {kf_out}")
    slam.shutdown()


if __name__ == "__main__":
    main()
