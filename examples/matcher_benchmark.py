"""Matcher-vs-classical tracking benchmark over the synthetic scene family.

Measures the learned matcher (any weights) against the classical LK+NCC
tracker on every regime the docs cite: degraded (noise/contrast/flicker),
non-rigid deformation, rotation, zoom, clean, pan — exact ground truth
from tdspa.utils.synthetic_video. This is the qualification gate for
shipping new matcher weights (docs/BENCHMARKS.md "Learned matcher",
"Non-rigid content", "Camera zoom/roll").

Usage:
  PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu \
  python examples/matcher_benchmark.py [matcher.npz] [--json out.json]
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

DEGRADE = dict(noise_sigma=15.0, contrast=0.5, gain_flicker=0.15)

REGIMES = {
    # name: (scene kwargs, seeds)
    "degraded": (DEGRADE, (100, 101, 102)),
    "deform": (dict(deform_amp=5.0, **DEGRADE), (200, 201)),
    "deform_clean": (dict(deform_amp=5.0), (200, 201)),
    "rot_mild": (dict(rot_rate=float(np.deg2rad(1.0)), noise_sigma=10.0,
                      contrast=0.7), (300, 301)),
    "rot_strong": (dict(rot_rate=float(np.deg2rad(2.5)), **DEGRADE),
                   (310, 311)),
    "zoom": (dict(zoom_rate=0.004, noise_sigma=10.0), (320, 321)),
    "clean": ({}, (3, 4)),
    "pan": (dict(pan=(8, 0)), (330,)),
    # HELD-OUT regimes (never used to train the matcher or tune the
    # auto-gate thresholds — gate-generalization evidence, VERDICT-r3 #6):
    "jpeg_heavy": (dict(jpeg_quality=10), (400, 401)),
    "jpeg_mild": (dict(jpeg_quality=60), (410,)),
    "motion_blur": (dict(motion_blur=1), (420, 421)),
    "blur_noise": (dict(motion_blur=1, noise_sigma=12.0), (430,)),
    # Natural-statistics regimes (round 5: multi-octave ~1/f texture +
    # camera response — the photographic regime where the cells-trained
    # round-4 matcher measured WORSE than classical LK; docs/BENCHMARKS.md
    # "Natural-statistics scenes"):
    "nat_clean": (dict(texture="natural"), (500, 501)),
    "nat_degraded": (dict(noise_sigma=10.0, contrast=0.7,
                          texture="natural"), (510, 511)),
    "nat_zoom": (dict(noise_sigma=10.0, contrast=0.7, zoom_rate=0.02,
                      texture="natural"), (520,)),
    "nat_gamma": (dict(noise_sigma=10.0, contrast=0.7, texture="natural",
                       camera_gamma=2.2), (530,)),
    "nat_deform": (dict(deform_amp=3.0, texture="natural"), (540,)),
}

KEYS = ("pts_within_2", "visibility_accuracy", "occlusion_recall",
        "visible_recall")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("weights", nargs="?", default="default")
    ap.add_argument("--json", default=None)
    ap.add_argument("--grid", type=int, default=12)
    ap.add_argument("--regimes", default=None,
                    help="comma-separated subset (fast sweeps); default all")
    args = ap.parse_args()
    regimes = REGIMES
    if args.regimes:
        names = args.regimes.split(",")
        unknown = [n for n in names if n not in REGIMES]
        if unknown:
            raise SystemExit(f"unknown regimes {unknown}; have {list(REGIMES)}")
        regimes = {n: REGIMES[n] for n in names}

    from tdspa.eval.tracking_quality import tracking_quality
    from tdspa.features.matcher import estimate_degradation, load_matcher
    from tdspa.features.tracks import PyramidalLKTracker
    from tdspa.utils.synthetic_video import make_tracking_scene

    params = load_matcher(args.weights)
    classical = PyramidalLKTracker(grid_size=args.grid, device="cpu")
    learned = PyramidalLKTracker(grid_size=args.grid, device="cpu",
                                 matcher=params)
    # The full adaptive policy as shipped (photometric gate + collapse
    # rescue + matcher), with the CANDIDATE weights pre-seeded into the
    # auto cache so qualification measures the weights under test.
    auto = PyramidalLKTracker(grid_size=args.grid, device="cpu",
                              matcher="auto")
    auto._auto_matcher_params = params

    report = {}
    for name, (kw, seeds) in regimes.items():
        accs = {f"{k}_{who}": [] for k in KEYS for who in ("lk", "m", "a")}
        gate = []
        for seed in seeds:
            video, gt_tracks, gt_vis = make_tracking_scene(seed=seed, **kw)
            base_out = classical(video)
            # gate_engages reports the TRIGGER (photometric degradation OR
            # the classical pass's collapse signal); the 'a' columns report
            # the adaptive policy's end metrics (rescue may satisfy a
            # collapse trigger without engaging the matcher).
            gate.append(
                bool(estimate_degradation(video)["degraded"])
                or PyramidalLKTracker._collapse_engage(base_out["visible"])
            )
            base = tracking_quality(base_out, gt_tracks, gt_vis)
            ours = tracking_quality(learned(video), gt_tracks, gt_vis)
            policy = tracking_quality(auto(video), gt_tracks, gt_vis)
            for k in KEYS:
                accs[f"{k}_lk"].append(base[k])
                accs[f"{k}_m"].append(ours[k])
                accs[f"{k}_a"].append(policy[k])
        row = {k: round(float(np.mean(v)), 3) for k, v in accs.items()}
        row["gate_engages"] = round(float(np.mean(gate)), 2)
        report[name] = row
        print(f"{name:14s} gate {row['gate_engages']:.2f} "
              f"pts2 {row['pts_within_2_lk']:.3f}->"
              f"{row['pts_within_2_m']:.3f}"
              f" (auto {row['pts_within_2_a']:.3f})  acc "
              f"{row['visibility_accuracy_lk']:.3f}->"
              f"{row['visibility_accuracy_m']:.3f}"
              f" (auto {row['visibility_accuracy_a']:.3f})  occ "
              f"{row['occlusion_recall_lk']:.3f}->"
              f"{row['occlusion_recall_m']:.3f}  visrec "
              f"{row['visible_recall_lk']:.3f}->"
              f"{row['visible_recall_m']:.3f}", flush=True)
    if args.json:
        with open(args.json, "w") as f:
            json.dump(report, f, indent=1)


if __name__ == "__main__":
    main()
