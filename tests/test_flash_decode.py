"""Pallas flash-decode kernel vs the portable XLA attention path (SURVEY.md
§4: "Pallas kernels vs jnp reference implementations"). Runs the kernel in
interpreter mode on CPU; on a real TPU the same comparisons exercise the
compiled kernel.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from triforce_tpu.ops import attention
from triforce_tpu.ops.flash_decode import append_attention_pallas

BLOCK = 128  # small DMA block so tests cover multi-block trips


def _mk(hq, hkv, t, s, d, seed=0):
    ks = jax.random.split(jax.random.PRNGKey(seed), 5)
    q = jax.random.normal(ks[0], (1, hq, t, d), jnp.float32)
    k = jax.random.normal(ks[1], (1, hkv, s, d), jnp.float32)
    v = jax.random.normal(ks[2], (1, hkv, s, d), jnp.float32)
    kn = jax.random.normal(ks[3], (1, hkv, t, d), jnp.float32)
    vn = jax.random.normal(ks[4], (1, hkv, t, d), jnp.float32)
    return q, k, v, kn, vn


@pytest.mark.parametrize("hq,hkv,t,k_len", [
    (4, 4, 1, 300),     # MHA 1-token decode, partial last block
    (4, 2, 1, 512),     # GQA, exact block boundary
    (4, 2, 7, 413),     # gamma+1 verify shapes
    (2, 2, 3, 0),       # empty cache (first tokens)
])
def test_kernel_matches_xla(hq, hkv, t, k_len):
    s, d = 512, 32
    q, k, v, kn, vn = _mk(hq, hkv, t, s, d, seed=k_len + t)
    want = attention.append_attention(q, k, v, kn, vn,
                                      k_len=jnp.asarray(k_len))
    got = append_attention_pallas(q, k, v, kn, vn,
                                  k_len=jnp.asarray(k_len), block=BLOCK,
                                  interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-5, rtol=2e-5)


def test_kernel_tree_mask():
    s, d, t = 256, 32, 5
    q, k, v, kn, vn = _mk(4, 4, t, s, d, seed=9)
    mask = np.tril(np.ones((t, t), bool))
    mask[3, 1] = False  # arbitrary non-causal tree shape
    mask[4, 2] = False
    want = attention.append_attention(q, k, v, kn, vn,
                                      k_len=jnp.asarray(100),
                                      new_mask=jnp.asarray(mask))
    got = append_attention_pallas(q, k, v, kn, vn, k_len=jnp.asarray(100),
                                  new_mask=jnp.asarray(mask), block=BLOCK,
                                  interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-5, rtol=2e-5)


def test_kernel_ignores_stale_tail():
    """Slots at or beyond k_len must not contribute (rollback semantics)."""
    s, d, t = 256, 16, 1
    q, k, v, kn, vn = _mk(2, 2, t, s, d, seed=3)
    poisoned_k = k.at[:, :, 120:].set(1e4)
    poisoned_v = v.at[:, :, 120:].set(1e4)
    clean = append_attention_pallas(q, k, v, kn, vn,
                                    k_len=jnp.asarray(120), block=BLOCK,
                                    interpret=True)
    dirty = append_attention_pallas(q, poisoned_k, poisoned_v, kn, vn,
                                    k_len=jnp.asarray(120), block=BLOCK,
                                    interpret=True)
    np.testing.assert_allclose(np.asarray(clean), np.asarray(dirty))


def test_kernel_quantized_cache():
    """int8 cache path: kernel vs XLA dequant path."""
    from triforce_tpu.cache import quantize_tokens
    s, d, t = 512, 32, 3
    q, k, v, kn, vn = _mk(4, 4, t, s, d, seed=21)
    k8, ks = quantize_tokens(k)
    v8, vs = quantize_tokens(v)
    want = attention.append_attention(q, k8, v8, kn, vn,
                                      k_len=jnp.asarray(300),
                                      k_scale=ks, v_scale=vs)
    got = append_attention_pallas(q, k8, v8, kn, vn,
                                  k_len=jnp.asarray(300), block=BLOCK,
                                  interpret=True, k_scale=ks, v_scale=vs)
    # the kernel also quantizes q and p to run int8 MXU matmuls (the XLA
    # path dequantizes exactly), so tolerance is int8-rounding-sized
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-2)


@pytest.mark.parametrize("quant", [False, True])
def test_kernel_prefill_chunk_shapes(quant):
    """Flash-PREFILL: a whole chunk of queries (gt = T >> 64) against the
    committed prefix + causal self-block — the shape class the dispatch
    guard admits for prefill after round 2."""
    hq = hkv = 2
    t, s, d, k_len = 128, 512, 32, 293
    q, k, v, kn, vn = _mk(hq, hkv, t, s, d, seed=3)
    ks = vs = None
    if quant:
        def q8(x):
            sc = jnp.maximum(jnp.max(jnp.abs(x), axis=-1) / 127.0, 1e-8)
            codes = jnp.clip(jnp.round(x / sc[..., None]), -127, 127)
            return codes.astype(jnp.int8), sc
        k, ks = q8(k)
        v, vs = q8(v)
    want = attention.append_attention(
        q, k, v, kn, vn, k_len=jnp.asarray(k_len), k_scale=ks, v_scale=vs)
    got = append_attention_pallas(
        q, k, v, kn, vn, k_len=jnp.asarray(k_len), block=BLOCK,
        interpret=True, k_scale=ks, v_scale=vs)
    tol = 5e-2 if quant else 2e-5
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=tol, rtol=tol)
