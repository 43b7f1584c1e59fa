"""Offline RESCUE_PENALTY sweep: one instrumented run per scene, the whole curve.

Measured record: docs/BENCHMARKS.md "RESCUE_PENALTY trade curve".

One instrumented run per scene reconstructs tracking quality at ANY
penalty exactly: with rescue=1 the switch decision
(switch_vis = lost & (vis2 > vis + MARGIN)) does not depend on the
penalty, positions never depend on it, and the tracker binarizes at
vis_logit > matcher_vis_threshold — so capturing (pos, vis_base, vis2,
switch_vis) from the real policy run gives visible(P) =
((where(switch, vis2 - P, vis_base) > thresh) & in_bounds) for free.
Self-check: the reconstruction at the shipped P must equal the actual
tracker output elementwise.
"""
import functools
import json
import os
import sys

os.environ["PALLAS_AXON_POOL_IPS"] = ""
os.environ.setdefault("JAX_PLATFORMS", "cpu")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

import tdspa.features.matcher as M
from tdspa.eval.tracking_quality import tracking_quality
from tdspa.features.tracks import PyramidalLKTracker
from tdspa.utils.synthetic_video import make_tracking_scene

DEGRADE = dict(noise_sigma=15.0, contrast=0.5, gain_flicker=0.15)
REGIMES = {
    "deform": (dict(deform_amp=5.0, **DEGRADE), (200, 201)),
    "degraded": (DEGRADE, (100, 101, 102)),
    "blur_noise": (dict(motion_blur=1, noise_sigma=12.0), (430,)),
    # rot_strong deliberately excluded: it engages the roll-stabilization
    # path whose _stabilized_result ANDs a second in-bounds mask over the
    # similarity-mapped tracks — the offline reconstruction does not model
    # that stage (the self-check catches it: 23 mismatched cells).
}
PENALTIES = [0.0, 0.5, 1.0, 1.5, 2.0, 2.5, 3.0, 4.0]
KEYS = ("pts_within_2", "visibility_accuracy", "occlusion_recall",
        "visible_recall")

STORE = []


@functools.partial(
    jax.jit,
    static_argnames=("dim", "radius", "hidden", "stride", "fhidden", "bank",
                     "iterations", "refine_first", "backend"),
)
def _refine_instr(weights, video, tracks, template_frame, template_pos,
                  dim, radius, hidden, stride, fhidden, bank, iterations,
                  refine_first, backend="xla"):
    head = M.MatcherHead(radius=radius, hidden=hidden)
    fnet = M.MatcherFeatureNet(dim=dim, stride=stride, hidden=fhidden)
    feats = fnet.apply({"params": weights["feature"]}, M._to_gray01(video))
    tfeats = fnet.apply(
        {"params": weights["feature"]}, M._to_gray01(template_frame)[jnp.newaxis]
    )
    template_vec = M.bilinear_sample(
        tfeats, M.img_to_feat(template_pos, stride)[:, jnp.newaxis]
    )[:, 0]
    cost_multi = M._make_cost_multi(feats, radius, stride, backend)
    pos, vis, _ = M._run_matcher(
        weights, head, cost_multi, feats, template_vec, tracks,
        stride, iterations, bank,
    )
    # one rescue round (the shipped default), instrumented
    cand = M._field_candidate(tracks[:, 0], pos, vis)
    pos2, vis2, _ = M._run_matcher(
        weights, head, cost_multi, feats, template_vec, cand,
        stride, iterations, bank,
    )
    lost = vis < M.RESCUE_GATE
    switch_pos = lost & (vis2 > vis)
    switch_vis = lost & (vis2 > vis + M.RESCUE_MARGIN)
    pos = jnp.where(switch_pos[..., jnp.newaxis], pos2, pos)
    vis_base = vis
    vis_shipped = jnp.where(switch_vis, vis2 - M.RESCUE_PENALTY, vis)
    if not refine_first:
        pos = jnp.concatenate([tracks[:, :1], pos[:, 1:]], axis=1)
        vis_shipped = jnp.concatenate(
            [jnp.full_like(vis_shipped[:, :1], 10.0), vis_shipped[:, 1:]], 1
        )
        vis_base = jnp.concatenate(
            [jnp.full_like(vis_base[:, :1], 10.0), vis_base[:, 1:]], 1
        )
        switch_vis = jnp.concatenate(
            [jnp.zeros_like(switch_vis[:, :1]), switch_vis[:, 1:]], 1
        )
    return pos, vis_shipped, vis_base, vis2, switch_vis


def refine_tracks_patched(params, video, tracks, iterations=2,
                          template_frame=None, template_pos=None,
                          refine_first=False, backend="auto", rescue=1):
    assert rescue == 1, "instrumentation assumes the shipped rescue=1"
    dim, radius, hidden, stride, fhidden, bank = M._cfg(params)
    if backend == "auto":
        backend = "pallas" if jax.default_backend() == "tpu" else "xla"
    weights = {"feature": params["feature"], "head": params["head"]}
    if bank > 0:
        weights["select"] = params["select"]
    if template_frame is None:
        template_frame = jnp.asarray(video)[0]
    if template_pos is None:
        template_pos = jnp.asarray(tracks, jnp.float32)[:, 0]
    pos, vis_shipped, vis_base, vis2, switch = _refine_instr(
        weights, jnp.asarray(video), jnp.asarray(tracks, jnp.float32),
        jnp.asarray(template_frame), jnp.asarray(template_pos, jnp.float32),
        dim, radius, hidden, stride, fhidden, bank, iterations,
        refine_first, backend,
    )
    STORE.append(dict(
        pos=np.asarray(pos), vis_base=np.asarray(vis_base),
        vis2=np.asarray(vis2), switch=np.asarray(switch),
    ))
    return pos, vis_shipped


M.refine_tracks = refine_tracks_patched


def main():
    results = {}
    for name, (kw, seeds) in REGIMES.items():
        per_penalty = {p: {k: [] for k in KEYS} for p in PENALTIES}
        fired = []
        for seed in seeds:
            video, gt_tracks, gt_vis = make_tracking_scene(seed=seed, **kw)
            auto = PyramidalLKTracker(grid_size=12, device="cpu",
                                      matcher="auto")
            STORE.clear()
            out = auto(video)
            if not STORE:
                # matcher never engaged (e.g. denoise suppressed it);
                # penalty is irrelevant for this scene
                print(f"{name}/{seed}: matcher not engaged, skipping")
                continue
            assert len(STORE) == 1, f"expected 1 refine call, got {len(STORE)}"
            rec = STORE[0]
            h, w = video.shape[1], video.shape[2]
            pos = rec["pos"]
            in_bounds = ((pos[..., 0] >= 0) & (pos[..., 0] <= w - 1)
                         & (pos[..., 1] >= 0) & (pos[..., 1] <= h - 1))
            thresh = auto.matcher_vis_threshold
            # self-check vs the actual output at the shipped penalty
            vis_ship = np.where(rec["switch"],
                                rec["vis2"] - M.RESCUE_PENALTY,
                                rec["vis_base"])
            vis_ship[:, 0] = 10.0
            recon = ((vis_ship > thresh) & in_bounds).astype(np.float32)
            actual = np.asarray(out["visible"])[..., 0]
            assert np.array_equal(recon, actual), \
                f"{name}/{seed}: reconstruction mismatch " \
                f"({np.abs(recon - actual).sum()} cells)"
            frac_switched = float(rec["switch"][:, 1:].mean())
            fired.append(frac_switched)
            for p in PENALTIES:
                vis_p = np.where(rec["switch"], rec["vis2"] - p,
                                 rec["vis_base"])
                vis_p[:, 0] = 10.0
                visible = (((vis_p > thresh) & in_bounds)
                           .astype(np.float32)[..., None])
                q = tracking_quality(
                    {"tracks": pos, "visible": visible}, gt_tracks, gt_vis)
                for k in KEYS:
                    per_penalty[p][k].append(float(q[k]))
        results[name] = {
            "switched_frac": round(float(np.mean(fired)), 4) if fired else 0.0,
            "penalties": {
                str(p): {k: round(float(np.mean(v)), 3)
                         for k, v in per_penalty[p].items() if v}
                for p in PENALTIES
            },
        }
        print(f"\n=== {name} (switched {results[name]['switched_frac']:.3f}) ===")
        for p in PENALTIES:
            row = results[name]["penalties"][str(p)]
            if row:
                print(f"  P={p:3.1f}  pts2 {row['pts_within_2']:.3f}  "
                      f"visacc {row['visibility_accuracy']:.3f}  "
                      f"occrec {row['occlusion_recall']:.3f}  "
                      f"visrec {row['visible_recall']:.3f}", flush=True)
    with open("/tmp/penalty_offline.json", "w") as f:  # noqa
        json.dump(results, f, indent=1)


if __name__ == "__main__":
    main()
