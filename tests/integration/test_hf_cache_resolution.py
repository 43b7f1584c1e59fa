"""HF offline-cache weight resolution (VERDICT-r3 missing #2 mitigation).

The reference runs released DINOv2 weights through HuggingFace
(/root/reference/inference.py:157-165). This environment has zero egress,
so the production story is a PRE-SEEDED local HF hub cache +
``HF_HUB_OFFLINE=1`` (what bench.py and the pipeline set). This test
proves that story end to end without the network: it writes a tiny
random-init dinov2 checkpoint into a hub-layout cache
(``models--<org>--<name>/snapshots/<rev>/`` + ``refs/main``), then — in a
subprocess, because huggingface_hub reads HF_HUB_OFFLINE/HF_HUB_CACHE at
import time — resolves it by MODEL NAME through the exact
``load_dinov2_params`` path the pipeline uses.
"""

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

_CHILD = r"""
import sys
import jax
jax.config.update("jax_platforms", "cpu")
sys.path.insert(0, %(repo)r)
from tdspa.features.dino import load_dinov2_params
from tdspa.features.vit import ViTConfig

cfg = ViTConfig(hidden_size=32, num_layers=2, num_heads=2, patch_size=14)
params = load_dinov2_params("tdspa-test/tiny-dinov2", cfg)
assert params is not None, "cache-resolved weights came back None"
# Structure sanity: converted flax tree has the embeddings + both layers.
assert "patch_embed" in params and "layer_0" in params and "layer_1" in params, (
    list(params)
)
print("CACHE_RESOLVED_OK")
"""


def test_offline_hub_cache_resolves_by_model_name(tmp_path):
    import pytest

    transformers = pytest.importorskip("transformers")

    hf_cfg = transformers.Dinov2Config(
        hidden_size=32, num_hidden_layers=2, num_attention_heads=2,
        intermediate_size=128, patch_size=14, image_size=518,
    )
    model = transformers.Dinov2Model(hf_cfg)
    rev = "0" * 40
    cache = tmp_path / "hub"
    snap = cache / "models--tdspa-test--tiny-dinov2" / "snapshots" / rev
    snap.mkdir(parents=True)
    model.save_pretrained(snap)
    refs = cache / "models--tdspa-test--tiny-dinov2" / "refs"
    refs.mkdir()
    (refs / "main").write_text(rev)

    env = dict(os.environ)
    env.update(
        HF_HUB_OFFLINE="1",
        TRANSFORMERS_OFFLINE="1",
        HF_HUB_CACHE=str(cache),
        PALLAS_AXON_POOL_IPS="",
    )
    proc = subprocess.run(
        [sys.executable, "-c", _CHILD % {"repo": REPO}],
        env=env, text=True, capture_output=True, timeout=600,
    )
    assert proc.returncode == 0, proc.stderr[-3000:]
    assert "CACHE_RESOLVED_OK" in proc.stdout


def test_offline_without_cache_degrades_to_none(tmp_path):
    """No cache entry: the loader must return None (random-init fallback),
    not raise — the pipeline stays runnable without weights."""
    child = r"""
import sys
import jax
jax.config.update("jax_platforms", "cpu")
sys.path.insert(0, %(repo)r)
from tdspa.features.dino import load_dinov2_params
from tdspa.features.vit import ViTConfig

params = load_dinov2_params("tdspa-test/absent-model", ViTConfig.preset("vits"))
assert params is None
print("NONE_OK")
"""
    env = dict(os.environ)
    env.update(
        HF_HUB_OFFLINE="1",
        TRANSFORMERS_OFFLINE="1",
        HF_HUB_CACHE=str(tmp_path / "empty_hub"),
        PALLAS_AXON_POOL_IPS="",
    )
    proc = subprocess.run(
        [sys.executable, "-c", child % {"repo": REPO}],
        env=env, text=True, capture_output=True, timeout=600,
    )
    assert proc.returncode == 0, proc.stderr[-3000:]
    assert "NONE_OK" in proc.stdout
