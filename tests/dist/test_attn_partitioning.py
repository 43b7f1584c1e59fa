"""Q-sharding propagation into the fused-attention custom_partitioning.

Round-3 open question (docs/ROADMAP.md): `_attn_batch_axes`
(tdspa/kernels/attention.py) keys off the FLATTENED leading axis's
sharding spec — if GSPMD failed to propagate a query-set sharding through
the batch-1 [1, Q, s, h, d] -> [Q, s, h, d] reshape in
core/attention._fused_attention, the kernel would silently replicate
(correct but 8x redundant on an 8-device mesh at decode).

Probe technique: the pallas base is swapped for an XLA-equivalent function
under the SAME custom_partitioning rules (interpret-mode pallas +
custom_partitioning hangs CPU-mesh compiles), then the compiled HLO is
inspected: no all-gather may feed the call, per-device parameter shapes
must be 1/8 slices, and the output sharding must keep the query split.
Resolution (recorded round 4): propagation WORKS — the flatten is a
degenerate-leading-dim merge GSPMD handles exactly.
"""

import re

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

import tdspa.kernels.attention as ka
from tdspa.parallel.mesh import make_mesh


def _xla_fused_forward(q, k, v, key_mask, interpret=False,
                       out_dtype=jnp.float32):
    """Same contract as kernels.attention._fused_forward, pure XLA."""
    depth = q.shape[-1]
    logits = jnp.einsum(
        "bshd,bkhd->bhsk", q, k, preferred_element_type=jnp.float32
    ) / jnp.sqrt(depth)
    if key_mask is not None:
        logits = jnp.where(
            key_mask[:, None, None, :] > 0, logits,
            jnp.finfo(jnp.float32).min,
        )
    probs = jax.nn.softmax(logits, axis=-1)
    return jnp.einsum(
        "bhsk,bkhd->bshd", probs, v, preferred_element_type=jnp.float32
    ).astype(out_dtype)


@pytest.mark.parametrize("with_mask", (False, True))
def test_batch1_query_sharding_reaches_kernel(monkeypatch, with_mask):
    if jax.device_count() < 8:
        pytest.skip("needs the 8-virtual-device CPU mesh")
    monkeypatch.setattr(ka, "_fused_forward", _xla_fused_forward)
    # _spmd_fused's lru_cache holds partition closures that resolve
    # _fused_forward at CALL time (module global), so patching is enough —
    # but compiled-executable caches would mask the patch: use fresh shapes.
    mesh = make_mesh(data=2, seq=4)
    B, Q, s, h, d = 1, 512, 151, 2, 32
    kv = s
    key = jax.random.PRNGKey(0)
    kq, kk, kv_ = jax.random.split(key, 3)
    q = jax.random.normal(kq, (B, Q, s, h, d), jnp.float32)
    k = jax.random.normal(kk, (B, Q, kv, h, d), jnp.float32)
    v = jax.random.normal(kv_, (B, Q, kv, h, d), jnp.float32)
    mask = (
        jnp.ones((B, Q, 1, 1, kv), jnp.float32) if with_mask else None
    )

    both = ("data", "seq")
    sh = NamedSharding(mesh, P(None, both, None, None, None))

    def f(q, k, v):
        from tdspa.core.attention import _fused_attention

        return _fused_attention(q, k, v, mask)

    compiled = jax.jit(f, in_shardings=(sh, sh, sh)).lower(q, k, v).compile()
    txt = compiled.as_text()
    assert not re.findall(r"all-gather", txt), (
        "query set replicated around the fused-attention call "
        "(8x redundant decode)"
    )
    # Per-device entry parameters must be 1/8 query slices.
    entry = txt[txt.index("ENTRY"):].split("\n", 1)[0]
    assert f"[1,{Q // 8},{s},{h},{d}]" in entry, entry
    (out_sharding,) = (
        compiled.output_shardings
        if isinstance(compiled.output_shardings, (list, tuple))
        else (compiled.output_shardings,)
    )
    assert out_sharding.spec[1] == both, out_sharding

    # And the sharded result equals the single-device computation.
    got = np.asarray(jax.jit(f, in_shardings=(sh, sh, sh))(q, k, v))
    want = np.asarray(
        _xla_fused_forward(
            q.reshape(-1, s, h, d), k.reshape(-1, kv, h, d),
            v.reshape(-1, kv, h, d),
            jnp.ones((B * Q, kv), jnp.float32) if with_mask else None,
        ).reshape(B, Q, s, h, d)
    )
    np.testing.assert_allclose(got, want, atol=1e-5)
