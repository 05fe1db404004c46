"""Attention ops over static-shape caches.

Replaces ``flash_attn_with_kvcache`` (reference models/modeling_llama.py:240,
models/tensor_op.py:166) with length-masked attention in pure XLA. XLA fuses
the softmax chain on TPU; a hand-written Pallas flash-decode kernel lives in
``ops/flash_decode.py`` for the HBM-bound long-context path and both are
interchangeable here.

Convention: q is [B, Hq, T, D]; cached K/V are [B, Hkv, S, D]; GQA is handled
by grouping q heads (no materialised ``repeat_kv`` — reference
modeling_llama_68m.py:183-184 materialises it; we avoid the copy).
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

_NEG_INF = jnp.float32(-1e30)


def masked_attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                     mask: jnp.ndarray) -> jnp.ndarray:
    """q [B,Hq,T,D], k/v [B,Hkv,S,D], mask [T,S] bool (True = attend).

    fp32 softmax (flash-attn also accumulates in fp32), output in q.dtype.
    """
    b, hq, t, d = q.shape
    hkv = k.shape[1]
    g = hq // hkv
    scale = 1.0 / math.sqrt(d)

    qg = q.reshape(b, hkv, g, t, d)
    scores = jnp.einsum("bhgtd,bhsd->bhgts", qg, k,
                        preferred_element_type=jnp.float32) * scale
    scores = jnp.where(mask[None, None, None], scores, _NEG_INF)
    p = jax.nn.softmax(scores, axis=-1)
    out = jnp.einsum("bhgts,bhsd->bhgtd", p.astype(v.dtype), v,
                     preferred_element_type=jnp.float32)
    return out.reshape(b, hq, t, d).astype(q.dtype)


def append_mask(t: int, s_max: int, seq_len: jnp.ndarray) -> jnp.ndarray:
    """Causal mask for T tokens appended at slot ``seq_len`` of an S_max-slot
    cache: query i attends slots [0, seq_len + i]. (Covers prefill, AR decode
    and full-cache verify — reference relies on flash-attn's end-aligned
    causal mode for all three.)
    """
    rows = jax.lax.broadcasted_iota(jnp.int32, (t, s_max), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (t, s_max), 1)
    return cols <= seq_len + rows


def spec_mask(t: int, real_budget: int, budget: int) -> jnp.ndarray:
    """Mask for middle-model speculative verify over the retrieval cache:
    budget slots always visible, scratch slot j visible to query i iff j <= i
    (end-aligned causal within the gamma+1 scratch region).
    reference semantics: flash causal over [budget + gamma + 1] slots with
    q_len = gamma + 1 (models/modeling_llama.py:226-240, cache.py:184-189).
    """
    rows = jax.lax.broadcasted_iota(jnp.int32, (t, real_budget), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (t, real_budget), 1)
    return (cols < budget) | (cols - budget <= rows)


def causal_from(base):
    """Mask factory: query row i attends key slots [0, base + i] — the
    end-aligned causal layout shared by prefill, AR decode, full-cache verify
    and drafter windows (``base`` = tokens already cached before this call).
    """
    def fn(rows, cols):
        return cols <= base + rows
    return fn


def budget_causal(budget: int):
    """Mask factory for the retrieval cache: see ``spec_mask``."""
    def fn(rows, cols):
        return (cols < budget) | (cols - budget <= rows)
    return fn


def blockwise_attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                        mask_fn, block: int = 2048) -> jnp.ndarray:
    """Flash-style online-softmax attention, scanned over key blocks in pure
    XLA so the [T, S] score matrix is never materialised (S can be 128K+).

    q [B,Hq,T,D]; k/v [B,Hkv,S,D]; ``mask_fn(rows, cols) -> bool`` with
    absolute row/col indices. The Pallas kernel in ``ops/flash_decode.py``
    is a drop-in replacement on real TPU; this version is the portable
    reference/fallback and what CPU tests run.
    """
    b, hq, t, d = q.shape
    hkv, s = k.shape[1], k.shape[2]
    g = hq // hkv
    scale = 1.0 / math.sqrt(d)

    if s <= block:
        rows = jax.lax.broadcasted_iota(jnp.int32, (t, s), 0)
        cols = jax.lax.broadcasted_iota(jnp.int32, (t, s), 1)
        return masked_attention(q, k, v, mask_fn(rows, cols))

    nb = -(-s // block)
    s_pad = nb * block
    if s_pad != s:
        pad = [(0, 0), (0, 0), (0, s_pad - s), (0, 0)]
        k = jnp.pad(k, pad)
        v = jnp.pad(v, pad)

    qg = (q.reshape(b, hkv, g, t, d).astype(jnp.float32)) * scale
    k_blocks = k.reshape(b, hkv, nb, block, d).transpose(2, 0, 1, 3, 4)
    v_blocks = v.reshape(b, hkv, nb, block, d).transpose(2, 0, 1, 3, 4)

    rows = jax.lax.broadcasted_iota(jnp.int32, (t, block), 0)
    cols0 = jax.lax.broadcasted_iota(jnp.int32, (t, block), 1)

    def body(carry, xs):
        m, l, acc, blk = carry[0], carry[1], carry[2], carry[3]
        k_blk, v_blk = xs
        cols = cols0 + blk * block
        valid = mask_fn(rows, cols) & (cols < s)
        sc = jnp.einsum("bhgtd,bhsd->bhgts", qg, k_blk.astype(jnp.float32))
        sc = jnp.where(valid[None, None, None], sc, _NEG_INF)
        m_new = jnp.maximum(m, sc.max(axis=-1))
        alpha = jnp.exp(m - m_new)
        p = jnp.exp(sc - m_new[..., None])
        l = l * alpha + p.sum(axis=-1)
        acc = acc * alpha[..., None] + jnp.einsum(
            "bhgts,bhsd->bhgtd", p, v_blk.astype(jnp.float32))
        return (m_new, l, acc, blk + 1), None

    m0 = jnp.full((b, hkv, g, t), _NEG_INF, jnp.float32)
    l0 = jnp.zeros((b, hkv, g, t), jnp.float32)
    acc0 = jnp.zeros((b, hkv, g, t, d), jnp.float32)
    (m, l, acc, _), _ = jax.lax.scan(
        body, (m0, l0, acc0, jnp.zeros((), jnp.int32)), (k_blocks, v_blocks))

    out = acc / jnp.maximum(l, 1e-37)[..., None]
    return out.reshape(b, hq, t, d).astype(q.dtype)
