"""Pallas TPU flash-decode kernel: attention of a few query tokens against a
huge KV cache, fused with the in-register new-token block.

This is the hot op of the whole framework — the reference's
``flash_attn_with_kvcache`` (models/modeling_llama.py:240) — re-designed for
TPU: per KV head, key/value blocks are streamed HBM -> VMEM with
double-buffered async DMA, the trip count is the TRACED ``ceil(k_len /
block)`` so only the live prefix of the cache is ever read (the XLA
fallback in ops/attention.py has the same property via fori_loop), scores
run on the MXU in fp32, and the online-softmax state never leaves VMEM.
Decode at 128K context is pure HBM bandwidth; this kernel's job is to keep
the DMA engines saturated while the VPU/MXU hide under them.

Layout contract (B = 1): q [Hkv, G*T, D]; k/v [Hkv, S, D] with S a multiple
of ``block``; k_new/v_new [Hkv, T, D]; new_mask [G*T, T] bool. Output
[Hkv, G*T, D] fp32.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG_INF = -1e30  # python float: jnp scalars become captured consts in pallas


def _kernel(klen_ref, q_ref, knew_ref, vnew_ref, nmask_ref, k_hbm, v_hbm,
            o_ref, k_buf, v_buf, sem, *, block: int, scale: float):
    h = pl.program_id(0)
    k_len = klen_ref[0]
    gt, d = q_ref.shape[1], q_ref.shape[2]
    tn = knew_ref.shape[1]
    q = q_ref[0].astype(jnp.float32) * scale          # [GT, D]
    nb = pl.cdiv(k_len, block)

    def k_dma(slot, i):
        return pltpu.make_async_copy(
            k_hbm.at[h, pl.ds(i * block, block)], k_buf.at[slot],
            sem.at[slot, 0])

    def v_dma(slot, i):
        return pltpu.make_async_copy(
            v_hbm.at[h, pl.ds(i * block, block)], v_buf.at[slot],
            sem.at[slot, 1])

    @pl.when(nb > 0)
    def _():
        k_dma(0, 0).start()
        v_dma(0, 0).start()

    cols0 = jax.lax.broadcasted_iota(jnp.int32, (gt, block), 1)

    def body(i, carry):
        m, l, acc = carry
        slot = i % 2

        @pl.when(i + 1 < nb)
        def _():
            k_dma((i + 1) % 2, i + 1).start()
            v_dma((i + 1) % 2, i + 1).start()

        k_dma(slot, i).wait()
        v_dma(slot, i).wait()

        k_blk = k_buf[slot].astype(jnp.float32)       # [block, D]
        v_blk = v_buf[slot].astype(jnp.float32)
        sc = jax.lax.dot_general(
            q, k_blk, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)       # [GT, block]
        valid = cols0 + i * block < k_len
        sc = jnp.where(valid, sc, _NEG_INF)
        m_new = jnp.maximum(m, sc.max(axis=-1, keepdims=True))
        alpha = jnp.exp(m - m_new)
        p = jnp.exp(sc - m_new)
        l = l * alpha + p.sum(axis=-1, keepdims=True)
        acc = acc * alpha + jax.lax.dot_general(
            p, v_blk, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        return m_new, l, acc

    m0 = jnp.full((gt, 1), _NEG_INF, jnp.float32)
    l0 = jnp.zeros((gt, 1), jnp.float32)
    acc0 = jnp.zeros((gt, d), jnp.float32)
    m, l, acc = jax.lax.fori_loop(0, nb, body, (m0, l0, acc0))

    # --- fused new-token block (never touches HBM) ----------------------
    kn = knew_ref[0].astype(jnp.float32)              # [Tn, D]
    vn = vnew_ref[0].astype(jnp.float32)
    sc = jax.lax.dot_general(q, kn, (((1,), (1,)), ((), ())),
                             preferred_element_type=jnp.float32)
    sc = jnp.where(nmask_ref[:, :] != 0, sc, _NEG_INF)
    m_new = jnp.maximum(m, sc.max(axis=-1, keepdims=True))
    alpha = jnp.exp(m - m_new)
    p = jnp.exp(sc - m_new)
    l = l * alpha + p.sum(axis=-1, keepdims=True)
    acc = acc * alpha + jax.lax.dot_general(
        p, vn, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)

    o_ref[0] = acc / jnp.maximum(l, 1e-37)


@functools.partial(jax.jit, static_argnames=("block", "interpret"))
def flash_decode_append(q, k, v, k_new, v_new, k_len, new_mask,
                        block: int = 512, interpret: bool = False):
    """Fused decode attention: q vs [cache prefix of length k_len] + [new
    tokens]. See module docstring for the layout contract.

    q [Hkv, GT, D]; k/v [Hkv, S, D] (S % block == 0); k_new/v_new
    [Hkv, Tn, D]; new_mask [GT, Tn] bool; k_len traced i32. -> [Hkv, GT, D]
    fp32.
    """
    hkv, gt, d = q.shape
    s = k.shape[1]
    tn = k_new.shape[1]
    assert s % block == 0, (s, block)
    scale = 1.0 / math.sqrt(d)

    kernel = functools.partial(_kernel, block=block, scale=scale)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(hkv,),
        in_specs=[
            pl.BlockSpec((1, gt, d), lambda h, *_: (h, 0, 0),
                         memory_space=pltpu.VMEM),          # q
            pl.BlockSpec((1, tn, d), lambda h, *_: (h, 0, 0),
                         memory_space=pltpu.VMEM),          # k_new
            pl.BlockSpec((1, tn, d), lambda h, *_: (h, 0, 0),
                         memory_space=pltpu.VMEM),          # v_new
            pl.BlockSpec(memory_space=pltpu.VMEM),          # new_mask
            pl.BlockSpec(memory_space=pltpu.ANY),           # k (stays HBM)
            pl.BlockSpec(memory_space=pltpu.ANY),           # v (stays HBM)
        ],
        out_specs=pl.BlockSpec((1, gt, d), lambda h, *_: (h, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((2, block, d), k.dtype),
            pltpu.VMEM((2, block, d), v.dtype),
            pltpu.SemaphoreType.DMA((2, 2)),
        ],
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((hkv, gt, d), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
        interpret=interpret,
    )(jnp.asarray(k_len, jnp.int32).reshape(1), q, k_new, v_new,
      new_mask.astype(jnp.int8), k, v)


def append_attention_pallas(q, k_cache, v_cache, k_new, v_new, *, k_len,
                            new_mask=None, block: int = 512,
                            interpret: bool = False):
    """Drop-in for ops.attention.append_attention (B=1, no cache mask):
    q [1,Hq,T,D]; k/v [1,Hkv,S,D]; k_new/v_new [1,Hkv,T,D]."""
    b, hq, t, d = q.shape
    hkv = k_cache.shape[1]
    g = hq // hkv
    assert b == 1
    if new_mask is None:
        rows = jax.lax.broadcasted_iota(jnp.int32, (t, t), 0)
        cols = jax.lax.broadcasted_iota(jnp.int32, (t, t), 1)
        new_mask = cols <= rows
    nmask = jnp.tile(jnp.asarray(new_mask, bool), (g, 1))   # [G*T, T]
    qh = q[0].reshape(hkv, g * t, d)
    out = flash_decode_append(qh, k_cache[0], v_cache[0], k_new[0], v_new[0],
                              k_len, nmask, block=block, interpret=interpret)
    return out.reshape(1, hq, t, d).astype(q.dtype)
