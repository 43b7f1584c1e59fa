"""Demo: end-to-end realism scoring of a synthetic video, no external data.

Generates a textured clip with known motion, runs the full pipeline
(JAX LK tracking -> unit depth -> lift -> support/query split -> 3DSPA
forward), scores reconstruction realism, and writes a color-coded
visualization mp4 via the same npz contract as the reference visualizer.

Run (CPU):
  PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu python examples/score_synthetic_video.py
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def make_video(t=12, h=64, w=64, vx=1.0, vy=0.5, seed=0):
    rng = np.random.default_rng(seed)
    waves = [(rng.uniform(2, 9), rng.uniform(2, 9), rng.uniform(0, 6)) for _ in range(12)]
    yy, xx = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
    frames = []
    for i in range(t):
        img = sum(
            np.sin(2 * np.pi * (fx * (xx - vx * i) / w + fy * (yy - vy * i) / h) + ph)
            for fx, fy, ph in waves
        )
        img = (img - img.min()) / (np.ptp(img) + 1e-9)
        frames.append(np.repeat((img * 255).astype(np.uint8)[..., None], 3, -1))
    return np.stack(frames)


def main():
    from tdspa.eval.realism import save_visualization_npz, score_tracks
    from tdspa.features.depth import ConstantDepthProvider
    from tdspa.features.tracks import PyramidalLKTracker
    from tdspa.infer.pipeline import InferencePipeline
    from tdspa.utils.testing import TINY_3D
    from tdspa.models import TrackAutoEncoder3D

    T = 12
    video = make_video(t=T)
    model = TrackAutoEncoder3D(
        num_output_frames=T, use_dino=False, use_depth=True, **TINY_3D
    )
    pipeline = InferencePipeline(
        num_output_frames=T,
        use_dino=False,
        use_depth=True,
        num_query_points=32,
        num_support_tracks=128,
        track_provider=PyramidalLKTracker(grid_size=16),
        depth_provider=ConstantDepthProvider(),
        model=model,
    )
    results = pipeline.run_on_frames(video)
    print("timings:", {k: round(v, 3) for k, v in results["timings"].items()})

    # Score the query tracks' reconstruction (random weights -> low scores;
    # a trained checkpoint separates realistic from implausible motion).
    batch = {
        "support_tracks": results["support_tracks"][None],
        "support_tracks_visible": np.ones(
            results["support_tracks"].shape[:-1] + (1,), np.float32
        )[None],
        "query_points": np.concatenate(
            [np.zeros((32, 1), np.float32), results["query_tracks"][:, 0]], -1
        )[None],
        "query_tracks": results["query_tracks"][None],
        "query_tracks_visible": np.ones(
            results["query_tracks"].shape[:-1] + (1,), np.float32
        )[None],
        "boundary_frame": np.array([T]),
    }
    scores = score_tracks(model, pipeline.params, batch)
    print(f"realism_score={scores['realism_score']:.4f} "
          f"mean_error={scores['mean_error']:.4f}")

    out_dir = os.environ.get("DEMO_OUT", "/tmp/tdspa_demo")
    os.makedirs(out_dir, exist_ok=True)
    npz_path = os.path.join(out_dir, "scored.npz")
    save_visualization_npz(
        npz_path,
        coords=np.transpose(results["query_tracks"], (1, 0, 2)),
        coords_score=scores["coords_score"],
        video=video,
    )
    from tdspa.cli.visualize import main as viz_main

    viz_main(["--npz_path", npz_path, "--fps", "5"])
    print("demo artifacts in", out_dir)


if __name__ == "__main__":
    main()
