"""Generate golden outputs for fixed-seed tiny models (see test_golden.py)."""

import os

GOLDEN_PATH = os.path.join(os.path.dirname(__file__), "goldens.npz")


def compute_goldens() -> dict:
    import jax
    import numpy as np

    from tdspa.utils.testing import synthetic_batch, tiny_model_2d, tiny_model_3d

    T = 12
    rng = jax.random.PRNGKey(1234)
    out: dict = {}

    batch2d = synthetic_batch(rng, num_coords=2, num_frames=T)
    model2d = tiny_model_2d(T)
    v2 = jax.jit(model2d.init)(jax.random.PRNGKey(7), batch2d)
    res2 = jax.jit(model2d.apply)(v2, batch2d)
    out["tracks_2d"] = np.asarray(res2.tracks)
    out["visible_logits_2d"] = np.asarray(res2.visible_logits)
    out["certain_logits_2d"] = np.asarray(res2.certain_logits)

    batch3d = synthetic_batch(rng, num_coords=3, num_frames=T, with_features=True)
    model3d = tiny_model_3d(T)
    v3 = jax.jit(model3d.init)(jax.random.PRNGKey(7), batch3d)
    res3 = jax.jit(model3d.apply)(v3, batch3d)
    out["tracks_3d"] = np.asarray(res3.tracks)
    out["visible_logits_3d"] = np.asarray(res3.visible_logits)
    latents = model3d.apply(v3, batch3d, method=model3d.encode)
    out["latents_3d"] = np.asarray(latents)
    return out


def main():
    import numpy as np

    goldens = compute_goldens()
    np.savez(GOLDEN_PATH, **goldens)
    print(f"wrote {len(goldens)} golden arrays to {GOLDEN_PATH}")


if __name__ == "__main__":
    main()
