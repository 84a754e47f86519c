"""Pallas fused-IPA kernel: equivalence against the pure-jnp path.

The jnp path is the numerics reference (itself pinned to the torch
reference by tests/test_golden_ipa.py); the kernel must match it.  On CPU
the kernel runs in interpret mode; on TPU the same code compiles to Mosaic.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffab_pytorch_tpu.config import tiny_config
from diffab_pytorch_tpu.geometry import so3
from diffab_pytorch_tpu.models import InvariantPointAttentionLayer
from diffab_pytorch_tpu.ops import ipa_pallas

B, L = 2, 32


@pytest.fixture(scope="module")
def cfg():
    return tiny_config().model


@pytest.fixture(scope="module")
def inputs(cfg):
    ks = jax.random.split(jax.random.key(0), 4)
    x = jax.random.normal(ks[0], (B, L, cfg.d_residue_emb))
    pair = jax.random.normal(ks[1], (B, L, L, cfg.d_pair_emb))
    rot = so3.uniform(ks[2], (B, L))
    trans = jax.random.normal(ks[3], (B, L, 3)) * 5
    mask = jnp.ones((B, L), bool).at[:, -6:].set(False)
    return x, pair, rot, trans, mask


def test_core_matches_jnp_reference():
    rng = np.random.default_rng(0)
    h, ds, P, dp = 4, 8, 4, 16
    f = lambda *s: jnp.asarray(rng.normal(size=s).astype(np.float32))
    q_s, k_s, v_s = f(B, L, h, ds), f(B, L, h, ds), f(B, L, h, ds)
    q_p, k_p, v_p = f(B, L, h, P, 3), f(B, L, h, P, 3), f(B, L, h, P, 3)
    pair, bias = f(B, L, L, dp), f(B, h, L, L)
    gamma = jnp.abs(f(h)) + 0.1
    mask = jnp.ones((B, L)).at[:, -5:].set(0.0)
    scales = (ds**-0.5, (4.5 * P) ** -0.5, 3**-0.5)

    ref = ipa_pallas._attention_core_jnp(
        q_s, k_s, v_s, q_p, k_p, v_p, pair, bias, gamma, mask, *scales
    )
    out = ipa_pallas.fused_ipa_attention(
        q_s, k_s, v_s, q_p, k_p, v_p, pair, bias, gamma, mask, *scales
    )
    for r, o in zip(ref, out):
        np.testing.assert_allclose(np.asarray(o), np.asarray(r.reshape(o.shape)),
                                   atol=1e-4)


def test_layer_flag_equivalence(cfg, inputs):
    """Same params, pallas on vs off: identical outputs."""
    x, pair, rot, trans, mask = inputs
    layer_jnp = InvariantPointAttentionLayer(cfg)
    params = layer_jnp.init(jax.random.key(1), x, pair, rot, trans, mask)

    cfg_pl = dataclasses.replace(cfg, use_pallas_attention=True)
    layer_pl = InvariantPointAttentionLayer(cfg_pl)

    out_jnp = layer_jnp.apply(params, x, pair, rot, trans, mask)
    out_pl = layer_pl.apply(params, x, pair, rot, trans, mask)
    np.testing.assert_allclose(np.asarray(out_pl), np.asarray(out_jnp), atol=2e-4)


def test_layer_fuse_off_equivalence(cfg, inputs):
    """fuse_ipa_layer=False (attention-only kernel + XLA projections) must
    match both the jnp path and the fully fused layer (round 3)."""
    x, pair, rot, trans, mask = inputs
    layer_jnp = InvariantPointAttentionLayer(cfg)
    params = layer_jnp.init(jax.random.key(7), x, pair, rot, trans, mask)
    out_jnp = layer_jnp.apply(params, x, pair, rot, trans, mask)
    outs = {}
    for fuse in (True, False):
        cfg_pl = dataclasses.replace(
            cfg, use_pallas_attention=True, fuse_ipa_layer=fuse
        )
        outs[fuse] = InvariantPointAttentionLayer(cfg_pl).apply(
            params, x, pair, rot, trans, mask
        )
        np.testing.assert_allclose(
            np.asarray(outs[fuse]), np.asarray(out_jnp), atol=2e-4
        )
    np.testing.assert_allclose(
        np.asarray(outs[True]), np.asarray(outs[False]), atol=2e-4
    )


def test_layer_flag_equivalence_no_mask(cfg, inputs):
    x, pair, rot, trans, _ = inputs
    layer_jnp = InvariantPointAttentionLayer(cfg)
    params = layer_jnp.init(jax.random.key(2), x, pair, rot, trans)
    cfg_pl = dataclasses.replace(cfg, use_pallas_attention=True)
    out_jnp = layer_jnp.apply(params, x, pair, rot, trans)
    out_pl = InvariantPointAttentionLayer(cfg_pl).apply(params, x, pair, rot, trans)
    np.testing.assert_allclose(np.asarray(out_pl), np.asarray(out_jnp), atol=2e-4)


def test_gradients_flow_through_pallas(cfg, inputs):
    """Custom VJP: grads through the fused layer match the jnp layer."""
    x, pair, rot, trans, mask = inputs
    layer_jnp = InvariantPointAttentionLayer(cfg)
    params = layer_jnp.init(jax.random.key(3), x, pair, rot, trans, mask)
    cfg_pl = dataclasses.replace(cfg, use_pallas_attention=True)
    layer_pl = InvariantPointAttentionLayer(cfg_pl)

    def loss(m, p):
        return jnp.sum(m.apply(p, x, pair, rot, trans, mask) ** 2)

    g_jnp = jax.grad(lambda p: loss(layer_jnp, p))(params)
    g_pl = jax.grad(lambda p: loss(layer_pl, p))(params)
    flat_j = jax.tree.leaves(g_jnp)
    flat_p = jax.tree.leaves(g_pl)
    for a, b in zip(flat_j, flat_p):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), atol=5e-3)


def test_jit_and_scan_compatible(cfg, inputs):
    """The fused layer works under jit + lax.scan (the sampler pattern)."""
    x, pair, rot, trans, mask = inputs
    cfg_pl = dataclasses.replace(cfg, use_pallas_attention=True)
    layer = InvariantPointAttentionLayer(cfg_pl)
    params = layer.init(jax.random.key(4), x, pair, rot, trans, mask)

    @jax.jit
    def run(p, x0):
        def body(carry, _):
            return layer.apply(p, carry, pair, rot, trans, mask), None
        out, _ = jax.lax.scan(body, x0, None, length=3)
        return out

    out = run(params, x)
    assert out.shape == x.shape
    assert bool(jnp.all(jnp.isfinite(out)))


def test_kernel_supports_longer_contexts():
    """patch_size is user-configurable (cli.preprocess -k); the kernel's
    only shape constraint is L % 128 == 0 — pin L=256."""
    import dataclasses

    import numpy as np

    from diffab_pytorch_tpu.config import ModelConfig
    from diffab_pytorch_tpu.models.ipa import InvariantPointAttentionLayer

    cfg = ModelConfig(
        d_residue_emb=16, d_pair_emb=8, n_head=2, d_scalar_per_head=4,
        n_query_point_per_head=2, n_value_point_per_head=2,
    )
    b, L = 1, 256
    key = jax.random.key(0)
    x = jax.random.normal(key, (b, L, 16))
    pair = jax.random.normal(key, (b, L, L, 8)) * 0.1
    rot = jnp.broadcast_to(jnp.eye(3), (b, L, 3, 3))
    trans = jax.random.normal(key, (b, L, 3))

    layer_on = InvariantPointAttentionLayer(
        dataclasses.replace(cfg, use_pallas_attention=True))
    layer_off = InvariantPointAttentionLayer(
        dataclasses.replace(cfg, use_pallas_attention=False))
    params = layer_on.init(key, x, pair, rot, trans)
    out_on = layer_on.apply(params, x, pair, rot, trans)
    out_off = layer_off.apply(params, x, pair, rot, trans)
    np.testing.assert_allclose(
        np.asarray(out_on), np.asarray(out_off), atol=2e-4
    )
