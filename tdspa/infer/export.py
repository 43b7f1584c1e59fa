"""AOT serving export: serialize the fused inference tail via ``jax.export``.

The fused tail (lift + sample + split + autoencode —
``pipeline.py::fused_tail``) is the one on-device program a serving
deployment dispatches per video once the per-frame features exist. This
module exports that program, bound to static serving shapes, to a
version-stable StableHLO artifact (the ``jax.export`` serialization format)
plus a JSON manifest, so a serving binary can
``deserialize(...).call(params, ...)`` without the model source, Flax, or a
re-trace — and can lower it for TPU from a CPU-only build host
(``platforms=("tpu",)``). The fused Pallas attention kernels ride along as
``tpu_custom_call``s; their cross-version stability check is explicitly
waived and the manifest pins the producing jax version instead, which is the
standard trade for Mosaic kernels in exported artifacts.

No reference counterpart: the reference (inference.py:511-635) re-traces the
model in every process. This is a tdspa-native deployment feature
(docs/SERVING.md).
"""

from __future__ import annotations

import json
import os
from typing import Any, Sequence

import jax
import jax.numpy as jnp

MANIFEST_SUFFIX = ".json"


def _spec(shape, dtype=jnp.float32):
    return jax.ShapeDtypeStruct(tuple(int(s) for s in shape), dtype)


def make_serving_fn(
    model: Any,
    num_support: int,
    num_queries: int,
    video_hw: tuple,
    use_dino: bool,
    use_depth: bool,
):
    """The export-shaped wrapper around :func:`fused_tail`.

    Positional signature (feature args appear only when enabled, so the
    artifact's calling convention carries no dummy operands)::

        fn(params, seed, tracks_2d, visible, [dino_grid], [depth_maps])

    ``seed`` is a uint32 scalar folded into the support/query split's
    PRNGKey on device. Returns a plain dict (pytree-serializable without
    custom registrations): predicted ``tracks`` / ``visible_logits`` /
    ``certain_logits`` plus the sampled ``query_points`` ([Q 4] (t,x,y,z) —
    the identities the predictions answer for) and the lifted ``tracks_3d``.
    """

    # Deferred so a serving binary can import this module for
    # load_exported() with nothing beyond jax (no Flax/model sources).
    from tdspa.infer.pipeline import fused_tail

    def fn(params, seed, tracks_2d, visible, *features):
        i = 0
        dino_grid = None
        depth_maps = None
        if use_dino:
            dino_grid = features[i]
            i += 1
        if use_depth:
            depth_maps = features[i]
            i += 1
        key = jax.random.PRNGKey(seed)
        preds, batch, tracks_3d = fused_tail(
            params,
            tracks_2d,
            visible,
            dino_grid,
            depth_maps,
            key,
            model=model,
            num_support=num_support,
            num_queries=num_queries,
            video_hw=tuple(video_hw),
            use_dino=use_dino,
            use_depth=use_depth,
        )
        return {
            "tracks": preds.tracks,
            "visible_logits": preds.visible_logits,
            "certain_logits": preds.certain_logits,
            "query_points": batch["query_points"],
            "tracks_3d": tracks_3d,
            # The split's two sides: what scoring compares predictions
            # against (and what InferencePipeline(tail_artifact=...) needs
            # to reconstruct its results dict).
            "support_tracks": batch["support_tracks"],
            "query_tracks": batch["query_tracks"],
        }

    return fn


def export_serving_tail(
    model: Any,
    params: Any,
    *,
    num_tracks: int,
    num_frames: int,
    video_hw: tuple,
    num_support: int,
    num_queries: int,
    use_dino: bool = True,
    use_depth: bool = True,
    dino_grid_hw: tuple | None = None,
    dino_dim: int = 768,
    platforms: Sequence[str] | None = None,
):
    """Trace + lower the fused serving tail to a ``jax.export.Exported``.

    ``params`` may be real weights or any pytree of arrays /
    ``ShapeDtypeStruct``s with the model's layout — only shapes/dtypes enter
    the artifact; weights are fed at call time (so one artifact serves every
    checkpoint with the same layout). ``platforms`` lowers for those targets
    (e.g. ``("tpu",)`` or ``("tpu", "cpu")``) regardless of the local
    backend; None = the default export platform of this process.
    """
    from jax import export as jexport

    fn = make_serving_fn(
        model, num_support, num_queries, video_hw, use_dino, use_depth
    )
    param_specs = jax.tree.map(
        lambda x: _spec(x.shape, x.dtype), params
    )
    args = [
        param_specs,
        _spec((), jnp.uint32),  # seed
        _spec((num_tracks, num_frames, 2)),  # tracks_2d
        _spec((num_tracks, num_frames, 1)),  # visible
    ]
    if use_dino:
        if dino_grid_hw is None:
            # DINOv2 patch-14 grid of the patch-multiple resize (dino.py).
            dino_grid_hw = (video_hw[0] // 14, video_hw[1] // 14)
        args.append(_spec((num_frames,) + tuple(dino_grid_hw) + (dino_dim,)))
    if use_depth:
        args.append(_spec((num_frames,) + tuple(video_hw) + (1,)))

    kwargs = {}
    if platforms is not None:
        kwargs["platforms"] = tuple(platforms)
    # Mosaic (Pallas TPU) kernels serialize as tpu_custom_calls whose
    # payload is not covered by jax.export's cross-version guarantee; the
    # manifest pins the producing jax version instead.
    kwargs["disabled_checks"] = (
        jexport.DisabledSafetyCheck.custom_call("tpu_custom_call"),
    )
    return jexport.export(jax.jit(fn), **kwargs)(*args)


def register_result_serialization():
    """Register ``TrackAutoEncoderResults`` with jax.export's serializer.

    The container is a flax.struct dataclass with empty aux data, so the
    registration is trivial; idempotent (safe to call per export)."""
    from jax import export as jexport

    from tdspa.models.containers import TrackAutoEncoderResults

    try:
        jexport.register_pytree_node_serialization(
            TrackAutoEncoderResults,
            serialized_name="tdspa.models.TrackAutoEncoderResults",
            serialize_auxdata=lambda aux: b"",
            deserialize_auxdata=lambda b: (),
        )
    except ValueError:
        pass  # already registered in this process


def export_mesh_tail(
    mesh, model, num_support: int, num_queries: int, video_hw: tuple,
    use_dino: bool = True, use_depth: bool = True, *, params, tracks_2d_shape,
    dino_grid_shape=None, depth_maps_shape=None,
):
    """Export the MULTI-CHIP fused tail (``make_mesh_tail``) as an AOT
    artifact with its shardings baked in.

    The artifact records the mesh's device assignment (``nr_devices``) and
    every input/output sharding; a serving host deserializes it and calls
    with the same device count — no model source, no re-trace, kernels'
    ``custom_partitioning`` rules already applied at export time. Call
    signature matches ``make_mesh_tail``'s tail: ``(params, tracks_2d,
    visible, dino_grid, depth_maps, key)`` -> (results, batch, tracks_3d).
    """
    from jax import export as jexport

    from tdspa.infer.pipeline import make_mesh_tail

    register_result_serialization()
    tail = make_mesh_tail(
        mesh, model, num_support, num_queries, tuple(video_hw), use_dino,
        use_depth,
    )
    n, t = tracks_2d_shape[0], tracks_2d_shape[1]
    param_specs = jax.tree.map(lambda x: _spec(x.shape, x.dtype), params)
    # A concrete key stands in as the spec: typed-key avals can't be built
    # via ShapeDtypeStruct, and export only reads its shape/dtype.
    key_spec = jax.random.PRNGKey(0)
    return jexport.export(
        tail,
        disabled_checks=(
            jexport.DisabledSafetyCheck.custom_call("tpu_custom_call"),
        ),
    )(
        param_specs,
        _spec((n, t, 2)),
        _spec((n, t, 1)),
        _spec(dino_grid_shape) if use_dino else None,
        _spec(depth_maps_shape) if use_depth else None,
        key_spec,
    )


def call_exported_mesh(exported, mesh, *args):
    """Call a mesh-exported artifact on a live mesh of the same size.

    The deserialized artifact refuses a 1-device call context, so inputs
    are committed leaf-wise to the artifact's own recorded shardings laid
    over ``mesh`` (``Exported.in_shardings_jax`` is flat, one entry per
    leaf) and the call runs under jit.
    """
    flat, tree = jax.tree.flatten(args)
    put = [
        jax.device_put(x, s)
        for x, s in zip(flat, exported.in_shardings_jax(mesh), strict=True)
    ]
    return jax.jit(exported.call)(*jax.tree.unflatten(tree, put))


def export_model_forward(
    model: Any, params: Any, example_batch: dict,
    platforms: Sequence[str] | None = None,
):
    """Export a bare ``model.apply`` forward (TRAJAN-2D or 3DSPA).

    For deployments that prepare batches themselves (eval harnesses,
    training-side scoring): ``call(params, batch)`` -> dict of ``tracks`` /
    ``visible_logits`` / ``certain_logits``. ``example_batch`` fixes the
    batch pytree's shapes/dtypes (only specs enter the artifact).
    """
    from jax import export as jexport

    def fn(params, batch):
        res = model.apply({"params": params}, batch)
        return {
            "tracks": res.tracks,
            "visible_logits": res.visible_logits,
            "certain_logits": res.certain_logits,
        }

    specs = jax.tree.map(
        lambda x: _spec(x.shape, x.dtype), (params, dict(example_batch))
    )
    kwargs = {"disabled_checks": (
        jexport.DisabledSafetyCheck.custom_call("tpu_custom_call"),
    )}
    if platforms is not None:
        kwargs["platforms"] = tuple(platforms)
    return jexport.export(jax.jit(fn), **kwargs)(*specs)


def save_exported(exported, path: str, extra_manifest: dict | None = None):
    """Write the serialized artifact to ``path`` + a ``.json`` manifest."""
    data = exported.serialize()
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    with open(path, "wb") as f:
        f.write(data)
    manifest = {
        "format": "jax.export StableHLO",
        "jax_version": jax.__version__,
        "platforms": list(exported.platforms),
        "calling_convention_version": exported.calling_convention_version,
        "fn_name": exported.fun_name,
        "nr_args": len(exported.in_avals),
        "in_avals": [str(a) for a in exported.in_avals],
        "out_avals": [str(a) for a in exported.out_avals],
        "bytes": len(data),
    }
    if extra_manifest:
        manifest.update(extra_manifest)
    with open(path + MANIFEST_SUFFIX, "w") as f:
        json.dump(manifest, f, indent=2)
    return manifest


def load_exported(path: str):
    """Deserialize an artifact; run it via ``.call(params, seed, ...)``."""
    from jax import export as jexport

    with open(path, "rb") as f:
        return jexport.deserialize(f.read())


def load_exported_mesh(path: str):
    """Deserialize a MESH-TAIL artifact (``export_mesh_tail``).

    Its output pytree embeds ``TrackAutoEncoderResults``, so the custom
    pytree serialization must be registered before deserializing — which
    pulls in the model containers (unlike the jax-only ``load_exported``).
    Call via :func:`call_exported_mesh` on a live same-size mesh.
    """
    register_result_serialization()
    return load_exported(path)


def read_manifest(path: str) -> dict:
    with open(path + MANIFEST_SUFFIX) as f:
        return json.load(f)
