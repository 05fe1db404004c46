"""Fused Pallas chunk-score kernel vs the XLA path (interpret mode off-TPU).

The kernel must reproduce ops.retrieval.chunk_scores_xla's scores — same
chunk means, same GQA group averaging — for bf16 and int8 caches, including
a live prefill shorter than the padded cache and a prefill that does not
align to the DMA block.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from triforce_tpu.ops import retrieval
from triforce_tpu.ops.retrieval_kernel import chunk_scores_pallas


def _mk(seed, hkv, g, s, d):
    ks = jax.random.split(jax.random.PRNGKey(seed), 3)
    q = jax.random.normal(ks[0], (1, hkv * g, 1, d), jnp.float32)
    k = jax.random.normal(ks[1], (1, hkv, s, d), jnp.float32)
    return q, k


@pytest.mark.parametrize("g", [1, 2])
@pytest.mark.parametrize("prefill", [512, 384])
def test_chunk_scores_kernel_bf16(g, prefill):
    hkv, s, d, chunk = 2, 512, 64, 8
    q, k = _mk(0, hkv, g, s, d)
    qb, kb = q.astype(jnp.bfloat16), k.astype(jnp.bfloat16)
    want = retrieval.chunk_scores_xla(qb, kb[:, :, :prefill], chunk)
    got = chunk_scores_pallas(qb[0].reshape(hkv, g, d), kb[0],
                              chunk=chunk, prefill=prefill, block=128,
                              interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want[0]),
                               atol=2e-2, rtol=2e-2)


def test_chunk_scores_kernel_int8():
    hkv, g, s, d, chunk, prefill = 2, 1, 512, 64, 8, 448
    q, k = _mk(1, hkv, g, s, d)
    # quantize k per token like cache.py's int8 cache
    ksc = jnp.maximum(jnp.max(jnp.abs(k), axis=-1) / 127.0, 1e-8)
    k8 = jnp.clip(jnp.round(k / ksc[..., None]), -127, 127).astype(jnp.int8)
    want = retrieval.chunk_scores_xla(
        q, k8[:, :, :prefill].astype(jnp.float32)
        * ksc[:, :, :prefill, None], chunk)
    got = chunk_scores_pallas(
        q[0].reshape(hkv, g, d).astype(jnp.bfloat16), k8[0],
        chunk=chunk, prefill=prefill, k_scale=ksc[0], block=128,
        interpret=True)
    # int8 q introduces ~1/127 relative error on top of bf16
    np.testing.assert_allclose(np.asarray(got), np.asarray(want[0]),
                               atol=5e-2, rtol=5e-2)


def test_build_layer_dispatch_unchanged_off_tpu():
    """build_layer still produces the XLA result off-TPU (dispatch guard)."""
    hkv, g, s, d, chunk, prefill, budget = 2, 1, 128, 32, 4, 64, 16
    q, k = _mk(2, hkv, g, s, d)
    v = jax.random.normal(jax.random.PRNGKey(9), (1, hkv, s, d), jnp.float32)
    out = retrieval.build_layer(q, k, v, prefill, chunk, budget)
    assert out[0].shape == (1, hkv, budget, d)


def test_pick_block_invariants():
    """pick_block must only return Mosaic-admissible blocks: a divisor of s,
    chunk-aligned, with a lane-divisible output tile (block//chunk % 128)
    unless the block spans the whole array. Regression: s=64512/chunk=8 used
    to pick 8064 -> output tile 1008, rejected by the TPU lowering."""
    from triforce_tpu.ops.retrieval_kernel import pick_block
    for s in [64512, 65536, 63488, 64000, 4096, 8192, 1000, 66560]:
        for chunk in [4, 8, 16, 32]:
            for quant in [False, True]:
                b = pick_block(s, 16, 128, chunk, quant)
                if b is None:
                    continue
                assert s % b == 0, (s, chunk, b)
                assert b % chunk == 0, (s, chunk, b)
                assert (b // chunk) % 128 == 0 or b == s, (s, chunk, b)
    # the regression shape gets a valid tiled block, not a fallback
    b = pick_block(64512, 16, 128, 8, True)
    assert b == 7168 and (b // 8) % 128 == 0


def test_chunk_scores_admission_uses_valid_block():
    """chunk_scores admission and the kernel agree: any s the dispatcher
    would admit has a pick_block result the kernel's asserts accept."""
    from triforce_tpu.ops.retrieval_kernel import pick_block
    for s in range(512, 70000, 512):
        b = pick_block(s, 16, 128, 8, True)
        if b is not None:
            assert s % b == 0 and b % 8 == 0
            assert (b // 8) % 128 == 0 or b == s
