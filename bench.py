"""Benchmark: the BASELINE.json north star, measured end to end.

Default mode runs BOTH measurements at the reference operating point
(150-frame 512x512 video, 512 query points + 2048 support tracks, batch 1)
and prints ONE JSON line headlined by the north-star metric:

  {"metric": "e2e_compute_seconds_per_video_150f_512q_2048s",
   "value": N, "unit": "s/video", "vs_baseline": 5.0 / N,
   "compute_only_s": ..., "total_with_transport_s": ...,
   "transport_upload_s": ..., "stage_timings_s": {...},
   "decodes_per_sec_per_chip": ...}

* ``value`` / ``compute_only_s``: the full pipeline (LK 64x64-grid
  tracking + DINOv2 + depth + fused lift/sample/split/model tail) with the
  video pre-staged device-resident — the on-chip cost a production host
  (GB/s DMA) sees. vs_baseline > 1.0 beats the <5 s/video north star.
* ``total_with_transport_s`` / ``transport_upload_s``: the streamed path
  including this dev rig's tunnel relay, reported separately because relay
  bandwidth swings ~50x over hours (docs/BENCHMARKS.md).
* ``decodes_per_sec_per_chip``: the model-forward micro-benchmark
  (rounds 1-2's headline metric; kept for round-over-round comparability).

``BENCH_MODE=decode`` runs only the micro-benchmark (fast);
``BENCH_MODE=e2e`` runs only the pipeline measurement.

Default orchestration additionally measures the SERVING configuration
(bf16 residual + half-res depth tail + tanh GELU + grid-56 tracking)
when the main e2e pass ran fast enough to indicate a warm cache/healthy
tunnel, reporting it as additive ``serving_e2e_*`` fields
(``BENCH_SERVING_TIMEOUT=0`` disables).

``BENCH_RESID`` picks the residual-stream dtype: the decode micro-bench
defaults to ``bf16`` (the serving config, +22% measured), the e2e mode
defaults to ``f32`` (the recorded north-star number stays
reference-numerics); set explicitly to force either everywhere.
``BENCH_QUANT=1`` adds the fused-int8 projection/MLP path (decode mode).
"""

import json
import os
import subprocess
import sys
import time

# Zero-egress environment: skip huggingface-hub's ~2 min of connection
# retries during the e2e warmup (weights resolve from local cache or fall
# back to random init either way).
os.environ.setdefault("HF_HUB_OFFLINE", "1")
# Big programs (streamed pipeline, scan-chunked decoder) take 20-35 min to
# compile through the tunnel on a cold cache; persist compilations. The
# directory is namespaced by the host CPU fingerprint — entries compiled
# on a different host segfault at load (tdspa/utils/cache.py).
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from tdspa.utils.cache import fingerprinted_cache_dir  # noqa: E402

os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    fingerprinted_cache_dir("/tmp/tdspa_jax_cache"),
)

if os.environ.get("BENCH_MODE", "") in ("decode", "e2e"):
    # Measurement child / direct invocation: touch the backend here.
    import jax
    import jax.numpy as jnp


def measure_decode():
    """Model-forward micro-benchmark -> decode-rate JSON dict."""
    from tdspa.models import TrackAutoEncoder3D
    from tdspa.utils.testing import synthetic_batch

    T, N_SUPPORT, N_QUERY = 150, 2048, 512
    fused = os.environ.get("BENCH_FUSED", "1") == "1"
    quant = os.environ.get("BENCH_QUANT", "0") == "1"
    # BENCH_FUSED_BLOCK=1: whole-block Pallas kernel for the unmasked
    # self-attention stacks — measured 3.3x SLOWER than the shipped XLA
    # path at decode shapes (docs/BENCHMARKS.md "Fused transformer-block
    # kernel"); kept as the recorded-negative toggle.
    fused_block = os.environ.get("BENCH_FUSED_BLOCK", "0") == "1"
    # Residual-stream dtype. Default bf16 — the serving configuration
    # (halves the decoder's elementwise/HBM traffic, ~0.6% relative output
    # error; measured +22% decode rate — docs/BENCHMARKS.md "Residual
    # dtype"). BENCH_RESID=f32 measures the reference-numerics config.
    resid = (
        jnp.float32
        if os.environ.get("BENCH_RESID", "bf16") == "f32"
        else jnp.bfloat16
    )
    model = TrackAutoEncoder3D(
        num_output_frames=T, dtype=jnp.bfloat16, fused_attention=fused,
        quantize=quant, residual_dtype=resid, fused_block=fused_block,
    )
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

    # Timed on-device iterations. 10 amortizes dispatch noise on TPU; the
    # CPU-fallback ladder passes 2 (a CPU forward at this operating point
    # is minutes — the fallback only needs an honest order-of-magnitude).
    iters = int(os.environ.get("BENCH_ITERS", 10))

    @jax.jit
    def forward_loop(params, batch):
        # The timing loop runs ON DEVICE (lax.scan with a data dependency
        # between iterations): one dispatch, so host/tunnel round-trip
        # overhead amortizes away and iterations can't be cached or elided.
        def body(carry, _):
            b = dict(batch)
            b["query_points"] = batch["query_points"] + carry
            out = model.apply({"params": params}, b)
            # Consume EVERY output element so no query/head can be DCE'd.
            probe = jnp.mean(out.tracks) + jnp.mean(out.visible_logits)
            return probe * 1e-30, probe
        carry, probes = jax.lax.scan(
            body, jnp.zeros((), jnp.float32), None, length=iters
        )
        return probes

    params = variables["params"]
    # Warmup / compile. Synchronization: fetch a concrete host value —
    # block_until_ready can return at enqueue on remote-tunnel platforms.
    float(jnp.sum(forward_loop(params, batch)))

    # The timed call gets perturbed inputs: identical (program, inputs)
    # dispatches can be served from an execution cache by remote runtimes,
    # which would time as ~0.
    batch_timed = dict(batch)
    batch_timed["support_tracks"] = batch["support_tracks"] + 1e-3
    t0 = time.perf_counter()
    float(jnp.sum(forward_loop(params, batch_timed)))
    dt = (time.perf_counter() - t0) / iters

    decodes_per_sec = N_QUERY / dt
    target_rate = N_QUERY / 5.0  # north-star: 512 queries e2e in < 5 s
    return {
        "metric": "query_track_decodes_per_sec_per_chip",
        "value": round(decodes_per_sec, 2),
        "unit": "decodes/s",
        "vs_baseline": round(decodes_per_sec / target_rate, 3),
    }


def measure_e2e():
    """Full-pipeline measurement, split three ways (VERDICT r2 #1/#8):

    * ``compute_only`` (the headline ``value``): the video pre-staged
      device-resident, plain (non-streamed) path, median of 3 perturbed
      runs — the on-chip cost a production host (GB/s DMA) would see.
    * ``total_with_transport``: the streamed production path including the
      dev-tunnel upload, median of 3. Relay bandwidth swings ~50x over
      hours (docs/BENCHMARKS.md), so this number is environment, not
      framework.
    * ``transport_upload``: the raw YUV 4:2:0 wire upload alone, synced.
    """
    import numpy as np

    from tdspa.features.depth import VideoDepthEstimator
    from tdspa.features.tracks import PyramidalLKTracker
    from tdspa.infer.pipeline import InferencePipeline

    T, H, W = 150, 512, 512
    rng = np.random.default_rng(0)
    video = rng.integers(0, 255, (T, H, W, 3)).astype(np.uint8)

    # BENCH_RESID=bf16: bf16 residual streams in the model AND the
    # DINO/depth ViT backbones (the serving config; ~0.6-0.8% relative
    # feature/output error — docs/BENCHMARKS.md "Residual dtype").
    # Default f32 keeps the recorded north-star number reference-numerics.
    resid = (
        jnp.bfloat16
        if os.environ.get("BENCH_RESID", "f32") == "bf16"
        else None
    )
    # BENCH_DEPTH_SCALE=0.5: run the DPT head's HBM-bound full-res tail at
    # half resolution (approximate serving knob — see VideoDepthEstimator.
    # output_scale). Default 1.0 keeps the exact reference head.
    depth_scale = float(os.environ.get("BENCH_DEPTH_SCALE", "1.0"))
    # BENCH_FAST_GELU=1: tanh GELU in the DINO/VDA ViT backbones
    # (serving knob; the exact-erf GELU is VPU-bound — measured -17.5%
    # on the DINO stage). Default 0 keeps exact HF numerics.
    fast_gelu = os.environ.get("BENCH_FAST_GELU", "0") == "1"
    # BENCH_DEPTH_INPUT=392: resize frames so the long side ~ this before
    # the VDA backbone (approximate serving knob — the backbone dominates
    # the depth stage and scales ~quadratically with side length).
    # Default 518 keeps the exact reference input.
    depth_input = int(os.environ.get("BENCH_DEPTH_INPUT", "518"))
    # BENCH_TRACK_GRID=56: tracking grid side (kernel time scales with
    # grid^2; the model still receives the full 2048-support/512-query
    # split as long as grid^2 >= 2560 — serving knob, measured -21% on
    # the tracking stage at 56 vs the reference's 64).
    track_grid = int(os.environ.get("BENCH_TRACK_GRID", "64"))
    fused_block = os.environ.get("BENCH_FUSED_BLOCK", "0") == "1"

    def make_pipeline(chunk):
        return InferencePipeline(
            num_output_frames=T,
            use_dino=True,
            use_depth=True,
            num_query_points=512,
            num_support_tracks=2048,
            tracking_grid_size=track_grid,
            track_provider=PyramidalLKTracker(
                grid_size=track_grid, fb_threshold=-1.0, iterations=3,
            ),
            depth_provider=VideoDepthEstimator(
                encoder="vitb",
                residual_dtype=resid or jnp.float32,
                output_scale=depth_scale,
                input_size=depth_input,
                gelu_approximate=fast_gelu,
            ),
            upload_chunk_frames=chunk,
            residual_dtype=resid,
            gelu_approximate=fast_gelu,
            fused_block=fused_block,
        )

    def median3(run, prep=lambda v: v):
        runs = []
        for i in range(3):
            v = prep(np.roll(video, i + 1, axis=0))  # perturb, same shapes
            t0 = time.perf_counter()
            results = run(v)
            float(np.asarray(results["predictions"].tracks).sum())
            runs.append((time.perf_counter() - t0, i, results))
        runs.sort(key=lambda r: r[0])
        times = sorted(r[0] for r in runs)
        # Return the MEDIAN run's results so the published stage timings
        # belong to the same run as the headline number (the last run can
        # be a transport outlier — CLAUDE.md's ~50x relay swing).
        return times[1], times, runs[1][2]

    # --- compute-only: device-resident input, plain path.
    pipe_plain = make_pipeline(chunk=0)
    pipe_plain.run_on_frames(jax.device_put(video))  # warmup/compiles

    def stage(v):
        v_dev = jax.device_put(v)
        float(jnp.sum(v_dev.astype(jnp.float32)))  # upload OUTSIDE timer
        return v_dev

    compute_s, compute_runs, compute_results = median3(
        pipe_plain.run_on_frames, prep=stage
    )

    # --- transport: the streamed path's actual wire bytes (YUV 4:2:0).
    from tdspa.ops.yuv import rgb_to_yuv420

    y, u, v_ = rgb_to_yuv420(video)
    t0 = time.perf_counter()
    planes = [jnp.asarray(p) for p in (y, u, v_)]
    for p in planes:
        float(jnp.sum(p.astype(jnp.float32)))
    transport_s = time.perf_counter() - t0

    # --- total: streamed production path (upload overlapped with compute).
    pipe_stream = make_pipeline(chunk=40)
    pipe_stream.params = pipe_plain.params  # share weights; skip re-init
    pipe_stream.run_on_frames(video)  # warmup/compiles
    total_s, total_runs, _ = median3(pipe_stream.run_on_frames)

    return {
        "metric": "e2e_compute_seconds_per_video_150f_512q_2048s",
        "value": round(compute_s, 3),
        "unit": "s/video",
        "vs_baseline": round(5.0 / compute_s, 3),
        "compute_only_s": round(compute_s, 3),
        "compute_runs_s": [round(t, 3) for t in compute_runs],
        "total_with_transport_s": round(total_s, 3),
        "total_runs_s": [round(t, 3) for t in total_runs],
        "transport_upload_s": round(transport_s, 3),
        "stage_timings_s": {
            k: round(v, 3) for k, v in compute_results["timings"].items()
        },
    }


def _run_child(mode, timeout_s, force_cpu=False, extra_env=None):
    """Run one measurement in a child interpreter; parse its JSON line.

    Returns (dict | None, elapsed_s). The parent process NEVER touches the
    JAX backend: on this rig backend init can hang indefinitely when the
    TPU tunnel relay is down (round-3 postmortem — BENCH_r03 recorded
    nothing because one in-process backend failure zeroed the whole round).
    """
    env = dict(os.environ)
    env["BENCH_MODE"] = mode
    env.update(extra_env or {})
    cmd = [sys.executable, os.path.abspath(__file__)]
    if force_cpu:
        # Empty pool-IP list skips the axon TPU-tunnel platform registration
        # (sitecustomize hook); jax_platforms=cpu before first backend touch.
        env["PALLAS_AXON_POOL_IPS"] = ""
        cmd = [
            sys.executable,
            "-c",
            "import jax; jax.config.update('jax_platforms', 'cpu'); "
            "import runpy; runpy.run_path(%r, run_name='__main__')"
            % os.path.abspath(__file__),
        ]
    t0 = time.perf_counter()
    try:
        proc = subprocess.run(
            cmd, env=env, text=True, capture_output=True, timeout=timeout_s
        )
    except subprocess.TimeoutExpired:
        return None, time.perf_counter() - t0
    elapsed = time.perf_counter() - t0
    sys.stderr.write(proc.stderr[-4000:])
    for line in reversed(proc.stdout.strip().splitlines()):
        if line.startswith("{"):
            try:
                return json.loads(line), elapsed
            except json.JSONDecodeError:
                continue
    return None, elapsed


def _orchestrate():
    """Driver default mode: decode micro-bench first (the guaranteed
    number), then the full e2e; one JSON line out, never zero.

    Ladder: TPU decode (retry once if the tunnel flakes fast) -> TPU e2e ->
    merge. Any rung failing degrades the report instead of erasing it; the
    terminal fallback is a CPU-platform decode tagged "platform": "cpu" so
    a dead tunnel still yields a parsed, honestly-labelled record.
    """
    t_decode = int(os.environ.get("BENCH_DECODE_TIMEOUT", 1500))
    t_e2e = int(os.environ.get("BENCH_E2E_TIMEOUT", 2700))
    t_retry = int(os.environ.get("BENCH_RETRY_SLEEP", 120))
    decode, el = _run_child("decode", timeout_s=t_decode)
    if decode is None and el < min(300, t_decode):
        # Fast failure = backend init raised (tunnel UNAVAILABLE). Bounded
        # retry: outages are often transient relay restarts.
        time.sleep(t_retry)
        decode, _ = _run_child("decode", timeout_s=t_decode)
    if decode is None:
        report, _ = _run_child(
            "decode", timeout_s=2400, force_cpu=True,
            extra_env={"BENCH_ITERS": "2"},
        )
        if report is None:  # even CPU failed: emit a parseable record
            report = {
                "metric": "query_track_decodes_per_sec_per_chip",
                "value": 0.0,
                "unit": "decodes/s",
                "vs_baseline": 0.0,
                "error": "TPU backend unavailable and CPU fallback failed",
            }
        else:
            report["platform"] = "cpu-fallback"
            report["error"] = "TPU backend unavailable; decode measured on CPU"
        print(json.dumps(report))
        return
    # The rounds-1/2 decode rate rides along for comparability; the
    # north-star e2e metric is the headline when it completes.
    report, e2e_elapsed = _run_child("e2e", timeout_s=t_e2e)
    if report is None:
        decode["note"] = "e2e stage failed/timed out; decode-only record"
        print(json.dumps(decode))
        return
    report["decodes_per_sec_per_chip"] = decode["value"]
    # Serving-config e2e (bf16 residual + half-res depth tail + tanh GELU
    # + grid-56 tracking — docs/SERVING.md; measured 2.618 s/video in a
    # healthy window). Additive fields; the headline stays
    # reference-numerics. Skipped when the main e2e child itself ran long
    # (cold compile cache / degraded tunnel): the serving variant compiles
    # DIFFERENT programs, so a cold pass could double a slow round.
    t_serving = int(os.environ.get("BENCH_SERVING_TIMEOUT", 2100))
    if t_serving > 0 and e2e_elapsed < int(
        os.environ.get("BENCH_SERVING_SKIP_ABOVE", 1200)
    ):
        serving, _ = _run_child(
            "e2e", timeout_s=t_serving,
            extra_env={
                "BENCH_RESID": "bf16", "BENCH_DEPTH_SCALE": "0.5",
                "BENCH_FAST_GELU": "1", "BENCH_TRACK_GRID": "56",
            },
        )
        if serving is not None:
            report["serving_e2e_s"] = serving["value"]
            report["serving_e2e_vs_baseline"] = serving["vs_baseline"]
            report["serving_e2e_runs_s"] = serving["compute_runs_s"]
            report["serving_stage_timings_s"] = serving["stage_timings_s"]
            report["serving_config"] = (
                "bf16_residual + depth_output_scale=0.5 + fast_gelu "
                "+ tracking_grid=56 (docs/SERVING.md)"
            )
        else:
            report["serving_note"] = "serving e2e child failed/timed out"
    print(json.dumps(report))


if __name__ == "__main__":
    mode = os.environ.get("BENCH_MODE", "")
    if mode == "e2e":
        print(json.dumps(measure_e2e()))
    elif mode == "decode":
        print(json.dumps(measure_decode()))
    else:
        _orchestrate()
