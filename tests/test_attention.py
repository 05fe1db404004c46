"""Attention op tests: blockwise online-softmax vs dense masked reference."""

import jax
import jax.numpy as jnp
import numpy as np

from triforce_tpu.ops.attention import (blockwise_attention, masked_attention,
                                        causal_from, budget_causal)


def _rand(key, shape):
    return jax.random.normal(key, shape, jnp.float32)


def test_blockwise_matches_dense_causal():
    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, 3)
    b, hq, hkv, t, s, d = 1, 4, 2, 5, 300, 16
    q = _rand(ks[0], (b, hq, t, d))
    k = _rand(ks[1], (b, hkv, s, d))
    v = _rand(ks[2], (b, hkv, s, d))
    base = jnp.asarray(100, jnp.int32)

    rows = jax.lax.broadcasted_iota(jnp.int32, (t, s), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (t, s), 1)
    dense = masked_attention(q, k, v, causal_from(base)(rows, cols))
    blocked = blockwise_attention(q, k, v, causal_from(base), block=64)
    np.testing.assert_allclose(np.asarray(blocked), np.asarray(dense),
                               atol=2e-5, rtol=2e-5)


def test_blockwise_budget_mask():
    key = jax.random.PRNGKey(1)
    ks = jax.random.split(key, 3)
    b, h, t, budget, gamma, d = 1, 2, 7, 128, 6, 16
    s = budget + gamma + 1
    q = _rand(ks[0], (b, h, t, d))
    k = _rand(ks[1], (b, h, s, d))
    v = _rand(ks[2], (b, h, s, d))

    rows = jax.lax.broadcasted_iota(jnp.int32, (t, s), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (t, s), 1)
    dense = masked_attention(q, k, v, budget_causal(budget)(rows, cols))
    blocked = blockwise_attention(q, k, v, budget_causal(budget), block=32)
    np.testing.assert_allclose(np.asarray(blocked), np.asarray(dense),
                               atol=2e-5, rtol=2e-5)


def test_causal_mask_excludes_future_keys():
    """A key written beyond the visible region must not change the output."""
    key = jax.random.PRNGKey(2)
    ks = jax.random.split(key, 4)
    b, h, t, s, d = 1, 2, 1, 64, 8
    q = _rand(ks[0], (b, h, t, d))
    k = _rand(ks[1], (b, h, s, d))
    v = _rand(ks[2], (b, h, s, d))
    base = jnp.asarray(10, jnp.int32)
    out1 = blockwise_attention(q, k, v, causal_from(base), block=16)
    k2 = k.at[:, :, 20].set(1e3)  # beyond slot base+0=10 -> invisible
    v2 = v.at[:, :, 20].set(1e3)
    out2 = blockwise_attention(q, k2, v2, causal_from(base), block=16)
    np.testing.assert_array_equal(np.asarray(out1), np.asarray(out2))
