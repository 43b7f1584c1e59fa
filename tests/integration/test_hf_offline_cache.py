"""The real-weight day-one path: HF offline cache lookup actually works.

`examples/real_weight_smoke.sh` (VERDICT r3 #8) promises that on a host
with a pre-seeded HF hub cache, `HF_HUB_OFFLINE=1` resolves
`facebook/dinov2-*` by name with zero egress (the reference downloads the
same backbone at runtime, inference.py:157-166). This drill seeds a hub
cache with a tiny random Dinov2 the way a real download lands it
(snapshots/<rev> + refs/main) and proves the lookup + our converter work
end-to-end. Runs in a subprocess: HF_HUB_OFFLINE is read at import time,
so it cannot be flipped inside an interpreter that already imported
transformers.
"""

import os
import subprocess
import sys

_DRILL = r"""
import os, sys, tempfile
cache = tempfile.mkdtemp()
os.environ["HF_HUB_OFFLINE"] = "1"
os.environ["HF_HUB_CACHE"] = cache
import torch
import transformers

cfg = transformers.Dinov2Config(
    image_size=28, patch_size=14, hidden_size=32, num_hidden_layers=2,
    num_attention_heads=2, intermediate_size=128,
)
m = transformers.Dinov2Model(cfg).eval()
rev = "0" * 40
root = os.path.join(cache, "models--fake-org--dinov2-tiny")
snap = os.path.join(root, "snapshots", rev)
os.makedirs(snap)
os.makedirs(os.path.join(root, "refs"))
m.save_pretrained(snap)
with open(os.path.join(root, "refs", "main"), "w") as f:
    f.write(rev)

loaded = transformers.AutoModel.from_pretrained("fake-org/dinov2-tiny")
ref, got = m.state_dict(), loaded.state_dict()
assert set(ref) == set(got)
assert all(torch.equal(got[k], ref[k]) for k in ref)

from tdspa.features.vit import ViTConfig, convert_hf_dinov2_params

vcfg = ViTConfig(hidden_size=32, num_layers=2, num_heads=2, image_size=28)
params = convert_hf_dinov2_params(loaded.state_dict(), vcfg)
assert "patch_embed" in params and "layer_0" in params
print("OFFLINE_CACHE_OK")
"""


def test_seeded_hub_cache_resolves_offline():
    env = dict(os.environ, PALLAS_AXON_POOL_IPS="", JAX_PLATFORMS="cpu")
    env.pop("HF_HUB_OFFLINE", None)
    env.pop("HF_HUB_CACHE", None)
    out = subprocess.run(
        [sys.executable, "-c", _DRILL],
        capture_output=True, text=True, timeout=600, env=env,
        cwd=os.path.dirname(os.path.dirname(os.path.dirname(__file__))),
    )
    assert out.returncode == 0, (out.stdout, out.stderr)
    assert "OFFLINE_CACHE_OK" in out.stdout, (out.stdout, out.stderr)
