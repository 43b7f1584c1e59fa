"""Checkpoint I/O: reference-compatible .npz formats + Orbax for training.

The reference *loads* checkpoints in three .npz layouts plus Flax msgpack
directories (inference.py:450-508, duplicated at evaluate_tapvid3d.py:247-285)
but its *saving* is a log-only stub (train.py:389-393). This module is the
single consolidated implementation:

* ``load_checkpoint`` — reads (a) ``.npz`` with a pickled ``params`` object,
  (b) ``.npz`` with a pickled ``optimizer`` dict exposing ``target``,
  (c) flat ``.npz`` with ``a/b/c``-style keys, or (d) a Flax/Orbax checkpoint
  directory. The released ``3dspa_ckpt.npz`` loads through (a)-(c).
* ``save_checkpoint_npz`` — writes the flat-key layout (c), bit-compatible
  with the reference loader.
* ``OrbaxCheckpointer`` — real train-time save/restore/resume
  (params + opt_state + step), the recovery story the reference lacks.
* ``check_params_structure`` — recursive key/shape diff returning a list of
  mismatch strings (the reference logs warnings; we return them so callers
  and tests can assert).
"""

from __future__ import annotations

import os
from typing import Any

from absl import logging
import jax
import numpy as np


def unflatten_params(flat_dict: dict) -> dict:
    """'a/b/c' flat keys -> nested dicts (reference inference.py:450-461)."""
    result: dict = {}
    for key, value in flat_dict.items():
        parts = key.split("/")
        node = result
        for part in parts[:-1]:
            node = node.setdefault(part, {})
        node[parts[-1]] = value
    return result


def flatten_params(tree: dict, prefix: str = "") -> dict:
    """Nested dicts -> 'a/b/c' flat keys (inverse of ``unflatten_params``)."""
    flat = {}
    for key, value in tree.items():
        path = f"{prefix}/{key}" if prefix else str(key)
        if isinstance(value, dict):
            flat.update(flatten_params(value, path))
        else:
            flat[path] = np.asarray(value)
    return flat


def _load_npz(checkpoint_path: str):
    data = np.load(checkpoint_path, allow_pickle=True)
    if "params" in data:
        p = data["params"]
        return p.item() if hasattr(p, "item") and p.ndim == 0 else dict(p)
    if "optimizer" in data:
        opt = data["optimizer"]
        opt = opt.item() if hasattr(opt, "item") and opt.ndim == 0 else dict(opt)
        return opt.get("target", opt) if isinstance(opt, dict) else opt
    return unflatten_params({k: np.array(data[k]) for k in data.files})


def load_checkpoint(checkpoint_path: str, model=None,
                    projection_policy: str = "error",
                    track_token_dim: int = 384) -> Any:
    """Load model params from any reference-supported checkpoint layout.

    Args:
      checkpoint_path: ``.npz`` file or Flax/Orbax checkpoint directory.
      model: unused; accepted for reference CLI-signature compatibility
        (inference.py:464).
      projection_policy: how to handle reference-layout feature projections
        (see ``adapt_reference_projections``): ``'error'`` (default) raises
        an actionable message, ``'slice'`` adapts, ``'ignore'`` loads as-is.
      track_token_dim: the destination model's track-token width (the
        projection adapter's target; 384 = full-size 3DSPA).

    Returns:
      Nested dict of parameters.
    """
    del model
    logging.info("Loading checkpoint from %s", checkpoint_path)
    if not os.path.exists(checkpoint_path):
        raise FileNotFoundError(f"Checkpoint not found: {checkpoint_path}")

    if checkpoint_path.endswith(".npz"):
        params = _load_npz(checkpoint_path)
    else:
        state_dict = _restore_dir(checkpoint_path)
        if state_dict is None:
            raise ValueError(
                f"Checkpoint at {checkpoint_path} is empty or invalid"
            )
        params = state_dict
        if isinstance(state_dict, dict):
            if "params" in state_dict:
                params = state_dict["params"]
            elif "optimizer" in state_dict and isinstance(
                state_dict["optimizer"], dict
            ) and "target" in state_dict["optimizer"]:
                params = state_dict["optimizer"]["target"]
    if projection_policy != "ignore" and isinstance(params, dict):
        params = adapt_reference_projections(
            params, track_token_dim=track_token_dim, policy=projection_policy
        )
    return params


_PROJECTION_NAMES = ("dino_projection", "depth_projection")


def adapt_reference_projections(params: dict, track_token_dim: int = 384,
                                policy: str = "error") -> dict:
    """Handle reference-declared square feature-projection kernels.

    The reference declares ``dino_projection = Dense(768)`` and
    ``depth_projection = Dense(256)`` (track_autoencoder_3d.py:76-79) whose
    outputs cannot be residual-added to ``track_token_dim``-wide track tokens
    — that code path crashes, so such kernels were never functional. The
    rebuild projects to ``track_token_dim`` (tdspa/models/spa3d.py). If a
    released checkpoint nevertheless carries the square [768,768]/[256,256]
    kernels, this adapter detects them and either:

    * ``policy='slice'``: makes the stored linear map shape-consistent —
      output channels beyond ``track_token_dim`` are cut (dino, 768→384) and
      missing ones zero-padded (depth, 256→384; zero channels add nothing to
      the residual), logging exactly what changed; or
    * ``policy='error'``: raises with the offending paths/shapes and the fix.
    """
    if policy not in ("slice", "error"):
        raise ValueError(f"Unknown projection_policy: {policy!r}")

    hits: list[tuple[str, dict]] = []

    def walk(node, path):
        if not isinstance(node, dict):
            return
        for key, value in node.items():
            sub = f"{path}/{key}" if path else str(key)
            if key in _PROJECTION_NAMES and isinstance(value, dict):
                kernel = value.get("kernel")
                if (
                    kernel is not None
                    and getattr(kernel, "ndim", 0) == 2
                    and kernel.shape[1] != track_token_dim
                    and kernel.shape[0] == kernel.shape[1]
                ):
                    hits.append((sub, value))
            else:
                walk(value, sub)

    walk(params, "")
    if not hits:
        return params
    if policy == "error":
        detail = ", ".join(
            f"{p} kernel{tuple(np.asarray(v['kernel']).shape)}" for p, v in hits
        )
        raise ValueError(
            "Checkpoint carries reference-layout square feature-projection "
            f"kernels that cannot be residual-added to {track_token_dim}-wide "
            f"track tokens: {detail}. These weights were never functional in "
            "the reference (its projection add crashes — see docs/PARITY.md). "
            "Re-load with projection_policy='slice' (CLI: "
            "--projection_policy=slice) to keep the first "
            f"{track_token_dim} output channels, or 'ignore' to load as-is."
        )
    for path, value in hits:
        kernel = np.asarray(value["kernel"])
        width = kernel.shape[1]
        verb = "Slicing" if width > track_token_dim else "Zero-padding"
        logging.warning(
            "%s reference projection %s: kernel %s -> (%d, %d)%s",
            verb, path, kernel.shape, kernel.shape[0], track_token_dim,
            "" if "bias" not in value else " (bias adjusted to match)",
        )
        if width > track_token_dim:
            value["kernel"] = kernel[:, :track_token_dim]
        else:
            value["kernel"] = np.pad(
                kernel, ((0, 0), (0, track_token_dim - width))
            )
        if "bias" in value:
            bias = np.asarray(value["bias"])
            value["bias"] = (
                bias[:track_token_dim] if bias.shape[0] > track_token_dim
                else np.pad(bias, (0, track_token_dim - bias.shape[0]))
            )
    return params


def _restore_dir(path: str):
    """Restore a checkpoint directory: Orbax first, Flax msgpack fallback."""
    try:
        import orbax.checkpoint as ocp

        ckptr = ocp.PyTreeCheckpointer()
        return ckptr.restore(os.path.abspath(path))
    except Exception:  # noqa: BLE001 - fall through to flax format
        pass
    from flax.training import checkpoints as flax_checkpoints

    return flax_checkpoints.restore_checkpoint(checkpoint_path=path, target=None)


def save_checkpoint_npz(checkpoint_path: str, params) -> None:
    """Write params as a flat-key .npz the reference loader reads back."""
    params = jax.tree_util.tree_map(np.asarray, params)
    flat = flatten_params(params)
    os.makedirs(os.path.dirname(os.path.abspath(checkpoint_path)), exist_ok=True)
    np.savez(checkpoint_path, **flat)
    logging.info("Saved %d arrays to %s", len(flat), checkpoint_path)


def check_params_structure(expected, actual, path: str = "") -> list[str]:
    """Recursive key/shape diff; returns human-readable mismatch strings."""
    problems: list[str] = []
    if isinstance(expected, dict) and isinstance(actual, dict):
        for key in expected:
            sub = f"{path}.{key}" if path else str(key)
            if key not in actual:
                problems.append(f"Key {sub} missing in checkpoint")
                logging.warning("Key %s missing in checkpoint", sub)
            else:
                problems += check_params_structure(expected[key], actual[key], sub)
        for key in actual:
            if key not in expected:
                problems.append(f"Unexpected key {path}.{key} in checkpoint")
    elif hasattr(expected, "shape") and hasattr(actual, "shape"):
        if tuple(expected.shape) != tuple(actual.shape):
            problems.append(
                f"Shape mismatch at {path}: {tuple(expected.shape)} vs"
                f" {tuple(actual.shape)}"
            )
            logging.warning(
                "Shape mismatch at %s: %s vs %s", path, expected.shape, actual.shape
            )
    return problems


class OrbaxCheckpointer:
    """Train-state save/restore with retention, for resume-after-failure.

    Saves ``{'params', 'opt_state', 'step'}`` under ``dir/step_N``. This is
    the real implementation of the reference's save stub (train.py:389-393).
    """

    def __init__(self, directory: str, max_to_keep: int = 3):
        import orbax.checkpoint as ocp

        self._directory = os.path.abspath(directory)
        os.makedirs(self._directory, exist_ok=True)
        self._mgr = ocp.CheckpointManager(
            self._directory,
            options=ocp.CheckpointManagerOptions(
                max_to_keep=max_to_keep, create=True
            ),
        )

    def save(self, step: int, state_tree) -> None:
        import orbax.checkpoint as ocp

        self._mgr.save(step, args=ocp.args.StandardSave(state_tree))
        self._mgr.wait_until_finished()

    def restore(self, step: int | None = None, template=None):
        import orbax.checkpoint as ocp

        step = self.latest_step() if step is None else step
        if step is None:
            return None
        if template is not None:
            return self._mgr.restore(
                step, args=ocp.args.StandardRestore(template)
            )
        return self._mgr.restore(step)

    def latest_step(self) -> int | None:
        return self._mgr.latest_step()
