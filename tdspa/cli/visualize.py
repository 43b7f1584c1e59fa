"""Visualizer CLI (argparse, reference visualizer.py:86-234).

Example:
  python -m tdspa.cli.visualize --npz_path results.npz --save_frames

Loads coords/coords_score/video/intrinsics/extrinsics from the npz, projects
3D tracks with ``tdspa.ops.geometry.project_all_tracks`` (on device), paints
score-colored trails, writes mp4 (+ optional PNG frames). Installed as the
``3dspa-visualizer`` console script for reference CLI parity (setup.py:38-40).
"""

import argparse
from pathlib import Path

import numpy as np


def build_parser() -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser(
        description="Visualize 3DSPA point tracks on video with color coding",
        formatter_class=argparse.ArgumentDefaultsHelpFormatter,
    )
    parser.add_argument("--npz_path", type=str, required=True,
                        help="Path to .npz with coords, coords_score, video, "
                             "intrinsics, extrinsics")
    parser.add_argument("--output_dir", type=str, default=None,
                        help="Output directory (default: npz directory)")
    parser.add_argument("--output_name", type=str, default=None,
                        help="Output video name (default: {stem}_visualized.mp4)")
    parser.add_argument("--trail", type=int, default=5,
                        help="Number of frames for trail")
    parser.add_argument("--point_size", type=int, default=2,
                        help="Radius of points")
    parser.add_argument("--resize_height", type=int, default=1024,
                        help="Height used for projection scaling")
    parser.add_argument("--resize_width", type=int, default=1024,
                        help="Width used for projection scaling")
    parser.add_argument("--fps", type=int, default=10,
                        help="Frames per second for output video")
    parser.add_argument("--normalize_scores", action="store_true", default=True,
                        help="Normalize scores to [0, 1] range")
    parser.add_argument("--no_normalize_scores", action="store_false",
                        dest="normalize_scores",
                        help="Use raw scores (must be in [0, 1] range)")
    parser.add_argument("--save_frames", action="store_true",
                        help="Save individual frames as PNG images")
    return parser


def main(args=None):
    args = build_parser().parse_args(args)

    from tdspa.ops.geometry import project_all_tracks
    from tdspa.viz.paint import (
        load_visualization_data,
        normalize_scores,
        paint_point_track_with_colors,
        prepare_video_for_visualization,
        save_frames,
        save_video_opencv,
    )

    print(f"Loading data from {args.npz_path}...")
    data = load_visualization_data(args.npz_path)
    coords = data["coords"]
    num_frames, num_points = coords.shape[:2]
    _, _, h_orig, w_orig = data["video"].shape
    print(f"Loaded {num_frames} frames, {num_points} points "
          f"({h_orig}x{w_orig})")

    video_rgb, video_bgr = prepare_video_for_visualization(data["video"])
    tracks_2d = np.asarray(
        project_all_tracks(
            coords,
            data["intrinsics"],
            data["extrinsics"],
            resize_height=args.resize_height,
            resize_width=args.resize_width,
            original_height=h_orig,
            original_width=w_orig,
        )
    )

    scores = data["coords_score"]
    if args.normalize_scores:
        scores = normalize_scores(scores, normalize=True)

    video_viz = paint_point_track_with_colors(
        video_bgr,
        tracks_2d,
        data["visibs"].T,
        scores,
        trail=args.trail,
        point_size=args.point_size,
    )

    npz_path = Path(args.npz_path)
    output_dir = Path(args.output_dir) if args.output_dir else npz_path.parent
    stem = (
        Path(args.output_name).stem if args.output_name
        else npz_path.stem + "_visualized"
    )
    output_video_path = output_dir / f"{stem}.mp4"
    save_video_opencv(video_viz, output_video_path, fps=args.fps)
    print(f"Saved visualized video to: {output_video_path}")

    if args.save_frames:
        import cv2

        frames_rgb = np.stack(
            [cv2.cvtColor(f, cv2.COLOR_BGR2RGB) for f in video_viz]
        )
        frames_dir = output_dir / stem
        save_frames(frames_rgb, frames_dir)
        print(f"Saved {num_frames} frames to: {frames_dir}")


if __name__ == "__main__":
    main()
