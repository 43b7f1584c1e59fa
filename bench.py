"""Benchmark: query-track decodes/sec/chip at the reference operating point.

Runs the flagship 3DSPA model (full reference hyperparameters, T=150) on
whatever accelerator JAX exposes, at the BASELINE.json configuration:
512 query points + 2048 support tracks with DINO+depth features, batch 1 —
the single-video inference regime.

Prints ONE JSON line:
  {"metric": "query_track_decodes_per_sec_per_chip", "value": N,
   "unit": "decodes/s", "vs_baseline": R}

``vs_baseline`` is value / 102.4: the north-star target rate implied by
BASELINE.json (512 queries in < 5 s end-to-end) — >1.0 means the model
forward alone beats the whole-pipeline target budget.
"""

import json
import time

import jax
import jax.numpy as jnp


def main():
    from tdspa.models import TrackAutoEncoder3D
    from tdspa.utils.testing import synthetic_batch

    T, N_SUPPORT, N_QUERY = 150, 2048, 512
    model = TrackAutoEncoder3D(num_output_frames=T, dtype=jnp.bfloat16)
    batch = synthetic_batch(
        jax.random.PRNGKey(0),
        batch=1,
        num_support=N_SUPPORT,
        num_queries=N_QUERY,
        num_frames=T,
        num_coords=3,
        with_features=True,
    )
    batch = jax.device_put(batch)

    variables = jax.jit(model.init)(jax.random.PRNGKey(42), batch)

    @jax.jit
    def forward(params, batch):
        return model.apply({"params": params}, batch)

    params = variables["params"]
    # Warmup / compile.
    out = forward(params, batch)
    jax.block_until_ready(out.tracks)

    iters = 10
    t0 = time.perf_counter()
    for _ in range(iters):
        out = forward(params, batch)
    jax.block_until_ready(out.tracks)
    dt = (time.perf_counter() - t0) / iters

    decodes_per_sec = N_QUERY / dt
    target_rate = N_QUERY / 5.0  # north-star: 512 queries e2e in < 5 s
    print(
        json.dumps(
            {
                "metric": "query_track_decodes_per_sec_per_chip",
                "value": round(decodes_per_sec, 2),
                "unit": "decodes/s",
                "vs_baseline": round(decodes_per_sec / target_rate, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
