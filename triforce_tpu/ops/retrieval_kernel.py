"""Pallas TPU kernel for the retrieval-cache build's hot pass: fused
chunk-mean key scoring.

The build (reference ``models/cache.py:146-178``) is
    chunk_k = mean(k over chunk)  ->  scores = q . chunk_k
    -> top-k chunks -> gather.
XLA's version (ops/retrieval.py) materialises the [Hkv, C, D] fp32
chunk-mean tensor in HBM (~65 MB/layer at 63.5K) and reads it back for the
score matmul. The identity

    q . mean_{t in chunk}(k_t)  ==  mean_{t in chunk}(q . k_t)

lets the kernel stream the prefill keys ONCE and emit chunk scores
directly: per sequence block, an int8/bf16 q.k dot on the MXU, a mean over
the GQA group, then one [Hkv, block] x [block, block/chunk] matmul against
an in-register block-pooling matrix (built from iota — never touches HBM).
No intermediate tensor exists anywhere.

Top-k over the [Hkv, C] scores and the chunk gather stay in XLA: they touch
kilobytes and megabytes respectively, and ``jax.lax.top_k`` is already
tuned. The kernel replaces only the bandwidth-bound pass.

Layout contract (B = 1, like ops/flash_decode.py): q [Hkv, G, D] (the last
prefill token's rotated query, grouped per KV head); k [Hkv, S, D] with the
static ``prefill`` prefix live (S % block == 0, prefill % chunk == 0).
int8 caches pass k_scale [Hkv, S]. Output: scores [Hkv, C] fp32 with
C = prefill // chunk, matching ops.retrieval.select_chunks' pre-top-k
scores.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(q_ref, *refs, block: int, chunk: int, prefill: int,
            quant: bool):
    if quant:
        qs_ref, k_ref, ks_ref, o_ref = refs
    else:
        (k_ref, o_ref) = refs
        ks_ref = qs_ref = None
    i = pl.program_id(0)
    hkv, g, d = q_ref.shape

    # q . k over this block, batched over KV heads (MXU)
    if quant:
        sc_i = jax.lax.dot_general(
            q_ref[:], k_ref[:], (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.int32)          # [Hkv, G, block]
        sc = (sc_i.astype(jnp.float32) * qs_ref[:][:, :, None]
              * ks_ref[:][:, None, :])
    else:
        sc = jax.lax.dot_general(
            q_ref[:], k_ref[:], (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)
    sc = sc.mean(axis=1)                               # GQA group mean
    # tokens past the live prefill contribute 0 to their chunk mean; the
    # caller only reads the first prefill//chunk score columns anyway
    base = i * block
    cols = jax.lax.broadcasted_iota(jnp.int32, (hkv, block), 1) + base
    sc = jnp.where(cols < prefill, sc, 0.0)
    # chunk pooling as ONE matmul: pool[s, c] = (s // chunk == c) / chunk
    rows = jax.lax.broadcasted_iota(jnp.int32, (block, block // chunk), 0)
    pcols = jax.lax.broadcasted_iota(jnp.int32, (block, block // chunk), 1)
    pool = jnp.where(rows // chunk == pcols, 1.0 / chunk, 0.0)
    o_ref[:] = jax.lax.dot_general(
        sc, pool, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)            # [Hkv, block/chunk]


def pick_block(s: int, hkv: int, d: int, chunk: int,
               quant: bool) -> int | None:
    """Largest divisor of ``s`` whose double-buffered K slab fits
    comfortably in VMEM and whose OUTPUT tile ``block // chunk`` is
    lane-divisible (Mosaic requires output block last dims % 128 unless the
    block spans the whole array — hence ``block % (128 * chunk) == 0``, or a
    single-block grid). Returns None when no admissible block exists (the
    caller falls back to the XLA path)."""
    per = hkv * d * (1 if quant else 2)
    cap = (64 * 1024 * 1024) // (2 * per)
    hi_cap = min(cap, 8192)
    step = 128 * chunk
    hi = (hi_cap // step) * step
    for b in range(hi, step - 1, -step):
        if s % b == 0:
            return b
    if s <= hi_cap and s % chunk == 0:
        return s   # one grid step: output block == whole array, no tiling
    return None


@functools.partial(jax.jit,
                   static_argnames=("chunk", "prefill", "block",
                                    "interpret"))
def chunk_scores_pallas(q, k, *, chunk: int, prefill: int,
                        k_scale=None, block: int | None = None,
                        interpret: bool = False):
    """Fused chunk-score pass: q [Hkv, G, D], k [Hkv, S, D] ->
    [Hkv, prefill // chunk] fp32 (q . chunk_mean(k), GQA-group-averaged)."""
    hkv, g, d = q.shape
    s = k.shape[1]
    assert prefill % chunk == 0 and prefill <= s
    quant = k_scale is not None
    if block is None:
        block = pick_block(s, hkv, d, chunk, quant)
        assert block is not None, (s, chunk, "no admissible DMA block")
    assert s % block == 0 and block % chunk == 0, (s, block, chunk)
    # Mosaic tiling constraint (interpret mode has no such restriction)
    assert interpret or (block // chunk) % 128 == 0 or block == s, \
        (block, chunk)
    nb = s // block
    # only blocks overlapping the live prefill do work; dead blocks would
    # write zeros we never read, so stop the grid at the prefill boundary
    nb_live = -(-prefill // block)

    kernel = functools.partial(_kernel, block=block, chunk=chunk,
                               prefill=prefill, quant=quant)
    in_specs = [
        pl.BlockSpec((hkv, g, d), lambda i: (0, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((hkv, block, d), lambda i: (0, i, 0),
                     memory_space=pltpu.VMEM),
    ]
    args = [q.astype(jnp.float32).astype(k.dtype)
            if not quant else None, k]
    if quant:
        # int8 x int8 on the MXU: quantize q per (head, row); the row scale
        # enters the kernel and multiplies scores BEFORE the group mean
        qf = q.astype(jnp.float32)
        qs = jnp.maximum(jnp.max(jnp.abs(qf), axis=-1) / 127.0, 1e-20)
        q8 = jnp.clip(jnp.round(qf / qs[..., None]), -127, 127
                      ).astype(jnp.int8)
        args[0] = q8
        in_specs.insert(1, pl.BlockSpec((hkv, g), lambda i: (0, 0),
                                        memory_space=pltpu.VMEM))
        args.insert(1, qs.astype(jnp.float32))
        in_specs.append(pl.BlockSpec((hkv, block), lambda i: (0, i),
                                     memory_space=pltpu.VMEM))
        args.append(k_scale.astype(jnp.float32))
    out = pl.pallas_call(
        kernel,
        grid=(nb_live,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((hkv, block // chunk), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((hkv, nb_live * (block // chunk)),
                                       jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(*[a for a in args if a is not None])
    return out[:, :prefill // chunk]
