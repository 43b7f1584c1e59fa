"""Minimal "serving binary": run the exported fused tail without the model.

Demonstrates the AOT deployment contract (docs/SERVING.md "AOT export"):
this script imports NOTHING from tdspa's model/pipeline stack — only
`tdspa.infer.export.load_exported` (jax-only) — and drives the artifact
from its JSON manifest + the artifact's own input pytree. Weights come
from a flat checkpoint npz ('a/b/c' keys, tdspa's flat writer layout) or
zero placeholders with --zero_params for a shape smoke.

Produce an artifact first, e.g.:
  python -m tdspa.cli.export --tiny_model --output_path=/tmp/tail.shlo \
      --num_output_frames=8 --video_height=32 --video_width=32 \
      --tracking_grid_size=4 --num_query_points=4 --num_support_tracks=8 \
      --dino_dim=8
then:
  python examples/serve_from_artifact.py /tmp/tail.shlo --zero_params
"""

import argparse
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from tdspa.infer.export import load_exported, read_manifest


def _aval_shape_dtype(aval: str):
    m = re.match(r"(\w+)\[([\d,]*)\]", aval)
    return (
        tuple(int(s) for s in m.group(2).split(",") if s),
        jnp.dtype(m.group(1)),
    )


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("artifact")
    ap.add_argument("--params_npz", help="flat checkpoint npz (weights)")
    ap.add_argument("--zero_params", action="store_true")
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    manifest = read_manifest(args.artifact)
    exported = load_exported(args.artifact)
    t, n = manifest["num_output_frames"], manifest["num_tracks"]
    h, w = manifest["video_hw"]
    print(f"artifact: {manifest['fn_name']} platforms={manifest['platforms']} "
          f"jax={manifest['jax_version']} T={t} tracks={n} video={h}x{w}")

    # Inputs a real deployment would produce upstream (tracking + features).
    keys = jax.random.split(jax.random.PRNGKey(args.seed), 4)
    n_inputs = 3 + manifest["use_dino"] + manifest["use_depth"]
    n_param_leaves = manifest["nr_args"] - n_inputs
    tracks_2d = jax.random.uniform(keys[0], (n, t, 2), maxval=w - 1.0)
    visible = (jax.random.uniform(keys[1], (n, t, 1)) > 0.2).astype(jnp.float32)
    extra = []
    aval_idx = n_param_leaves + 3  # past param leaves + seed/tracks/visible
    if manifest["use_dino"]:
        shape, _ = _aval_shape_dtype(manifest["in_avals"][aval_idx])
        extra.append(jax.random.normal(keys[2], shape))
        aval_idx += 1
    if manifest["use_depth"]:
        extra.append(
            jax.random.uniform(keys[3], (t, h, w, 1), minval=0.5, maxval=4.0)
        )

    if args.params_npz:
        # Flat 'a/b/kernel' keys -> the nested dict the artifact's pytree
        # expects (tdspa/infer/checkpoint.py flat writer layout).
        loaded = np.load(args.params_npz)
        params: dict = {}
        for k in loaded.files:
            d = params
            *path, leaf = k.split("/")
            for p in path:
                d = d.setdefault(p, {})
            d[leaf] = jnp.asarray(loaded[k])
    elif args.zero_params:
        # Rebuild the params pytree from the artifact itself: unflatten
        # zero leaves shaped by in_avals through the serialized in_tree.
        leaves = [
            jnp.zeros(*_aval_shape_dtype(a))
            for a in manifest["in_avals"][:n_param_leaves]
        ]
        flat = [*leaves, jnp.uint32(0), tracks_2d, visible, *extra]
        call_args, _kwargs = jax.tree.unflatten(exported.in_tree, flat)
        params = call_args[0]
    else:
        raise SystemExit("pass --params_npz or --zero_params")

    t0 = time.perf_counter()
    out = exported.call(params, jnp.uint32(args.seed), tracks_2d, visible,
                        *extra)
    tracks = out["tracks"]
    print(f"tracks sum={float(jnp.sum(tracks)):.4f} "
          f"shape={tuple(tracks.shape)} ({time.perf_counter()-t0:.2f}s)")


if __name__ == "__main__":
    main()
