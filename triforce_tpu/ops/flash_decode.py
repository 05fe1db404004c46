"""Pallas TPU flash-decode kernel: attention of a few query tokens against a
huge KV cache, fused with the in-register new-token block.

This is the hot op of the whole framework — the reference's
``flash_attn_with_kvcache`` (models/modeling_llama.py:240) — re-designed for
TPU. Decode at 128K context is pure HBM bandwidth, so the kernel is shaped
around the DMA stream, not the FLOPs:

  * grid iterates over SEQUENCE blocks; each block fetch is one
    [Hkv, block, D] slab (megabytes per DMA, all heads at once) — big
    enough to be throughput-bound, auto-double-buffered by the Pallas
    pipeline;
  * the traced ``k_len`` enters through scalar prefetch: the index map
    clamps the block index at ``ceil(k_len/block) - 1``, and Pallas elides
    refetches of an unchanged block, so the pipeline reads EXACTLY the live
    prefix of the cache — rollback semantics for free, no wasted bandwidth;
  * online-softmax state (m, l, acc) lives in VMEM scratch across grid
    steps (TPU grids are sequential); the tiny new-token block (the tokens
    being appended this forward, which must attend themselves) is folded in
    at the final step so their KV never round-trips through HBM;
  * scores/accumulation run on the MXU in fp32 via per-head matmuls.

Layout contract (B = 1): q [Hkv, G*T, D]; k/v [Hkv, S, D] with S a multiple
of ``block``; k_new/v_new [Hkv, Tn, D]; bias [G*T, Tn] (0 keep / -1e30
mask). Output [Hkv, G*T, D] fp32.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG_INF = -1e30  # python float: jnp scalars become captured consts in pallas


def _block_scores(q, k, qs, ks, quant: bool):
    """q . k over one sequence block, batched over heads ([Hkv, GT, block]).
    bf16: MXU with f32 accumulation. int8: q arrives pre-quantized (codes +
    per-row scale folded with 1/sqrt(d)), so the MXU runs int8 x int8 ->
    int32 and the scales factor onto the scores — no O(block*D) dequant."""
    if quant:
        sc_i = jax.lax.dot_general(
            q, k, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.int32)
        return (sc_i.astype(jnp.float32) * qs[:, :, None] * ks[:, None, :])
    return jax.lax.dot_general(
        q, k, (((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)


def _block_pv(p, v, vs, quant: bool):
    """p . v over one block. int8: fold the per-token value scale into p,
    re-quantize p per row (O(block) VPU work), and run the pv matmul in
    int8 too."""
    if quant:
        pf = p * vs[:, None, :]
        ps = jnp.max(jnp.abs(pf), axis=-1, keepdims=True) / 127.0
        ps = jnp.maximum(ps, 1e-20)
        p8 = jnp.clip(jnp.round(pf / ps), -127, 127).astype(jnp.int8)
        pv_i = jax.lax.dot_general(
            p8, v, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.int32)
        return pv_i.astype(jnp.float32) * ps
    return jax.lax.dot_general(
        p.astype(v.dtype), v, (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)


def _fold_new_and_finalize(q, qs, kn, vn, bias, m, l, acc, quant: bool):
    """Fold the in-register new-token block into the online-softmax state
    and normalise — the shared finalize of the fused decode kernels."""
    if quant:
        qf = (q.astype(jnp.float32) * qs[:, :, None]).astype(kn.dtype)
    else:
        qf = q
    sc = jax.lax.dot_general(
        qf, kn, (((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)          # [Hkv, GT, Tn]
    sc = sc + bias[None]
    m_new = jnp.maximum(m, sc.max(axis=-1, keepdims=True))
    alpha = jnp.exp(m - m_new)
    p = jnp.exp(sc - m_new)
    l = l * alpha + p.sum(axis=-1, keepdims=True)
    acc = acc * alpha + jax.lax.dot_general(
        p.astype(vn.dtype), vn, (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)
    return acc / jnp.maximum(l, 1e-37)


def _kernel(klen_ref, *rest, block: int, scale: float, quant: bool,
            stacked: bool = False, q_tile: int = 0):
    if stacked:
        # layer index arrives as a second scalar-prefetch ref; only the
        # BlockSpec index maps consume it — the body never reads it
        _layer_ref, q_ref, kn_ref, vn_ref, bias_ref, *refs = rest
    else:
        q_ref, kn_ref, vn_ref, bias_ref, *refs = rest
    if quant:
        (qs_ref, k_ref, v_ref, ks_ref, vs_ref, o_ref, m_sc, l_sc,
         acc_sc) = refs
    else:
        (k_ref, v_ref, o_ref, m_sc, l_sc, acc_sc) = refs
        ks_ref = vs_ref = qs_ref = None
    i = pl.program_id(0)
    k_len = klen_ref[0]
    nb = pl.cdiv(k_len, block)          # live blocks (may be 0)
    hkv, gt, d = q_ref.shape

    @pl.when(i == 0)
    def _():
        m_sc[:] = jnp.full_like(m_sc, _NEG_INF)
        l_sc[:] = jnp.zeros_like(l_sc)
        acc_sc[:] = jnp.zeros_like(acc_sc)

    @pl.when(i < nb)
    def _():
        base = i * block

        def one_tile(qsl, q_t, qs_t, v_blk, v_quant):
            cols = jax.lax.broadcasted_iota(
                jnp.int32, (1, q_t.shape[1], block), 2) + base
            valid = cols < k_len
            sc = _block_scores(q_t, k_ref[:], qs_t,
                               None if not quant else ks_ref[:], quant)
            sc = jnp.where(valid, sc, _NEG_INF)
            m = m_sc[:, qsl]
            m_new = jnp.maximum(m, sc.max(axis=-1, keepdims=True))
            alpha = jnp.exp(m - m_new)
            p = jnp.exp(sc - m_new)
            l_sc[:, qsl] = l_sc[:, qsl] * alpha + p.sum(axis=-1,
                                                        keepdims=True)
            pv = _block_pv(p, v_blk,
                           None if not v_quant else vs_ref[:], v_quant)
            acc_sc[:, qsl] = acc_sc[:, qsl] * alpha + pv
            m_sc[:, qsl] = m_new

        if q_tile and q_tile < gt:
            # WIDE-QUERY path (tree verify, T up to 512): the score/p
            # intermediates are processed in q sub-tiles so their VMEM
            # footprint never forces the DMA block down — small blocks
            # crater fetch bandwidth (measured 512 -> ~40 GB/s vs
            # 2048+ -> ~400+; this was the r4 T>=256 verify cliff).
            # (a once-per-block shared v-dequant was probed and is
            # SLOWER: the held [Hkv, block, D] temp stalls the DMA
            # pipeline — T=256 38.5 -> 51.9 ms; keep per-tile int8 pv)
            def tile_body(tq, _):
                qsl = pl.ds(tq * q_tile, q_tile)
                one_tile(qsl, q_ref[:, qsl],
                         None if not quant else qs_ref[:, qsl],
                         v_ref[:], quant)
                return 0
            jax.lax.fori_loop(0, gt // q_tile, tile_body, 0)
        else:
            one_tile(slice(None), q_ref[:],
                     None if not quant else qs_ref[:], v_ref[:], quant)

    # finalize on the last grid step (nb == 0 finalizes at i == 0)
    @pl.when(i == jnp.maximum(nb - 1, 0))
    def _():
        o_ref[:] = _fold_new_and_finalize(
            q_ref[:], None if not quant else qs_ref[:], kn_ref[:], vn_ref[:],
            bias_ref[:, :], m_sc[:], l_sc[:], acc_sc[:], quant)


def _kernel_partials(klen_ref, *rest, block: int, quant: bool,
                     stacked: bool = False, q_tile: int = 0):
    """Cache-only online-softmax partials: like ``_kernel`` but WITHOUT the
    new-token fold/normalisation — emits (m, l, acc) so a sequence-sharded
    decode can psum-merge per-shard partials over ICI (ops/sp_attention.py).
    The (m, l, acc) outputs double as the accumulators: their blocks stay
    resident in VMEM across the sequential grid and write back once.
    ``q_tile``: wide-query sub-tiling, see ``_kernel``."""
    if stacked:
        _layer_ref, q_ref, *refs = rest
    else:
        q_ref, *refs = rest
    if quant:
        (qs_ref, k_ref, v_ref, ks_ref, vs_ref, m_ref, l_ref, acc_ref) = refs
    else:
        (k_ref, v_ref, m_ref, l_ref, acc_ref) = refs
        ks_ref = vs_ref = qs_ref = None
    i = pl.program_id(0)
    k_len = klen_ref[0]
    nb = pl.cdiv(k_len, block)
    hkv, gt, d = q_ref.shape

    @pl.when(i == 0)
    def _():
        m_ref[:] = jnp.full_like(m_ref, _NEG_INF)
        l_ref[:] = jnp.zeros_like(l_ref)
        acc_ref[:] = jnp.zeros_like(acc_ref)

    @pl.when(i < nb)
    def _():
        base = i * block

        def one_tile(qsl, q_t, qs_t, v_blk, v_quant):
            cols = jax.lax.broadcasted_iota(
                jnp.int32, (1, q_t.shape[1], block), 2) + base
            valid = cols < k_len
            sc = _block_scores(q_t, k_ref[:], qs_t,
                               None if not quant else ks_ref[:], quant)
            sc = jnp.where(valid, sc, _NEG_INF)
            m = m_ref[:, qsl][:, :, None]
            m_new = jnp.maximum(m, sc.max(axis=-1, keepdims=True))
            alpha = jnp.exp(m - m_new)
            p = jnp.exp(sc - m_new)
            l_ref[:, qsl] = l_ref[:, qsl] * alpha[:, :, 0] + p.sum(axis=-1)
            pv = _block_pv(p, v_blk,
                           None if not v_quant else vs_ref[:], v_quant)
            acc_ref[:, qsl] = acc_ref[:, qsl] * alpha + pv
            m_ref[:, qsl] = m_new[:, :, 0]

        if q_tile and q_tile < gt:
            def tile_body(tq, _):
                qsl = pl.ds(tq * q_tile, q_tile)
                one_tile(qsl, q_ref[:, qsl],
                         None if not quant else qs_ref[:, qsl],
                         v_ref[:], quant)
                return 0
            jax.lax.fori_loop(0, gt // q_tile, tile_body, 0)
        else:
            one_tile(slice(None), q_ref[:],
                     None if not quant else qs_ref[:], v_ref[:], quant)


@functools.partial(jax.jit, static_argnames=("block", "interpret"))
def flash_decode_partials(q, k, v, k_len, block: int = 512,
                          interpret: bool = False, k_scale=None,
                          v_scale=None, layer=None):
    """Cache-only partials for sequence-sharded decode: q [Hkv, GT, D] vs
    k/v [Hkv, S, D] (S % block == 0), bounded by traced ``k_len``. Returns
    (m [Hkv, GT], l [Hkv, GT], acc [Hkv, GT, D]) fp32 — mergeable with
    ``ops.attention.merge_partials`` across shards (after a psum/pmax) and
    with the new-token block.

    ``layer`` (traced i32, optional): k/v are the stacked [L, Hkv, S, D]
    cache and blocks DMA straight from layer ``layer`` — the zero-copy
    per-layer path (see ``flash_decode_append``)."""
    stacked = layer is not None
    hkv, gt, d = q.shape
    s = k.shape[2] if stacked else k.shape[1]
    assert s % block == 0, (s, block)
    scale = 1.0 / math.sqrt(d)
    nb_max = s // block

    def clamp(i, klen_ref):
        last = jnp.maximum(pl.cdiv(klen_ref[0], block) - 1, 0)
        return jnp.minimum(i, last)

    if stacked:
        def kv_index(i, kl, ly):
            return (ly[0], 0, clamp(i, kl), 0)

        def sc_index(i, kl, ly):
            return (ly[0], 0, clamp(i, kl))
        kv_shape = (None, hkv, block, d)
        sc_shape = (None, hkv, block)
    else:
        def kv_index(i, kl):
            return (0, clamp(i, kl), 0)

        def sc_index(i, kl):
            return (0, clamp(i, kl))
        kv_shape = (hkv, block, d)
        sc_shape = (hkv, block)

    quant = k_scale is not None
    kernel = functools.partial(_kernel_partials, block=block, quant=quant,
                               stacked=stacked,
                               q_tile=max(_pick_qtile(gt), 0))
    kv_specs = ([pl.BlockSpec((hkv, gt), lambda i, *_: (0, 0),
                              memory_space=pltpu.VMEM)]   # q scales
                if quant else []) + [
        pl.BlockSpec(kv_shape, kv_index, memory_space=pltpu.VMEM),
        pl.BlockSpec(kv_shape, kv_index, memory_space=pltpu.VMEM),
    ]
    if quant:
        kv_specs += [
            pl.BlockSpec(sc_shape, sc_index, memory_space=pltpu.VMEM),
            pl.BlockSpec(sc_shape, sc_index, memory_space=pltpu.VMEM),
        ]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2 if stacked else 1,
        grid=(nb_max,),
        in_specs=[
            pl.BlockSpec((hkv, gt, d), lambda i, *_: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ] + kv_specs,
        out_specs=(
            pl.BlockSpec((hkv, gt), lambda i, *_: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((hkv, gt), lambda i, *_: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((hkv, gt, d), lambda i, *_: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
    )
    q = (q.astype(jnp.float32) * scale).astype(q.dtype)  # pre-scale once
    if quant:
        qf = q.astype(jnp.float32)
        qs = jnp.maximum(jnp.max(jnp.abs(qf), axis=-1) / 127.0, 1e-20)
        q = jnp.clip(jnp.round(qf / qs[..., None]), -127, 127
                     ).astype(jnp.int8)
    args = [jnp.asarray(k_len, jnp.int32).reshape(1)]
    if stacked:
        args.append(jnp.asarray(layer, jnp.int32).reshape(1))
    args.append(q)
    if quant:
        args += [qs.astype(jnp.float32)]
    args += [k, v]
    if quant:
        args += [k_scale.astype(jnp.float32), v_scale.astype(jnp.float32)]
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=(jax.ShapeDtypeStruct((hkv, gt), jnp.float32),
                   jax.ShapeDtypeStruct((hkv, gt), jnp.float32),
                   jax.ShapeDtypeStruct((hkv, gt, d), jnp.float32)),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(*args)


@functools.partial(jax.jit, static_argnames=("block", "interpret"))
def flash_decode_append(q, k, v, k_new, v_new, k_len, new_mask,
                        block: int = 512, interpret: bool = False,
                        k_scale=None, v_scale=None, layer=None):
    """Fused decode attention: q vs [cache prefix of length k_len] + [new
    tokens]. See module docstring for the layout contract.

    q [Hkv, GT, D]; k/v [Hkv, S, D] (S % block == 0); k_new/v_new
    [Hkv, Tn, D]; new_mask [GT, Tn] bool; k_len traced i32. -> [Hkv, GT, D]
    fp32.

    ``layer`` (traced i32, optional): when given, k/v are the WHOLE stacked
    cache [L, Hkv, S, D] (scales [L, Hkv, S]) and the kernel DMAs blocks of
    layer ``layer`` straight out of the stack via a second scalar-prefetch
    coordinate. This is the per-layer zero-copy path: feeding a model's
    lax.scan a per-layer slab (scan xs or a slice) makes XLA materialise an
    HBM->HBM copy of the slab for the pallas_call operand — measured +0.7 ms
    per 0.27 GB layer call, ~2x the whole decode step (probes/_r2_scanxs.py
    vs probes/_r2_kern_iso.py).
    """
    stacked = layer is not None
    hkv, gt, d = q.shape
    s = k.shape[2] if stacked else k.shape[1]
    tn = k_new.shape[1]
    assert s % block == 0, (s, block)
    scale = 1.0 / math.sqrt(d)
    nb_max = s // block

    # Mosaic rejects the 1-lane tail ops a tiny new block produces (decode
    # has tn=1); pad the block to lane width and mask the pad via the bias.
    tn_pad = -(-tn // 128) * 128
    if tn_pad != tn:
        pad = [(0, 0), (0, tn_pad - tn), (0, 0)]
        k_new = jnp.pad(k_new, pad)
        v_new = jnp.pad(v_new, pad)
        new_mask = jnp.pad(new_mask, [(0, 0), (0, tn_pad - tn)])
        tn = tn_pad

    def clamp(i, klen_ref):
        # clamp at the last live block: Pallas elides the refetch of an
        # unchanged block, so dead iterations cost no bandwidth
        last = jnp.maximum(pl.cdiv(klen_ref[0], block) - 1, 0)
        return jnp.minimum(i, last)

    if stacked:
        def kv_index(i, kl, ly):
            return (ly[0], 0, clamp(i, kl), 0)

        def sc_index(i, kl, ly):
            return (ly[0], 0, clamp(i, kl))
        kv_shape = (None, hkv, block, d)   # None squeezes the layer dim
        sc_shape = (None, hkv, block)
    else:
        def kv_index(i, kl):
            return (0, clamp(i, kl), 0)

        def sc_index(i, kl):
            return (0, clamp(i, kl))
        kv_shape = (hkv, block, d)
        sc_shape = (hkv, block)

    quant = k_scale is not None
    q_tile = max(_pick_qtile(gt), 0)
    kernel = functools.partial(_kernel, block=block, scale=scale,
                               quant=quant, stacked=stacked, q_tile=q_tile)
    kv_specs = ([pl.BlockSpec((hkv, gt), lambda i, *_: (0, 0),
                              memory_space=pltpu.VMEM)]   # q scales
                if quant else []) + [
        pl.BlockSpec(kv_shape, kv_index, memory_space=pltpu.VMEM),  # k blk
        pl.BlockSpec(kv_shape, kv_index, memory_space=pltpu.VMEM),  # v blk
    ]
    if quant:
        kv_specs += [
            pl.BlockSpec(sc_shape, sc_index,
                         memory_space=pltpu.VMEM),            # k scales
            pl.BlockSpec(sc_shape, sc_index,
                         memory_space=pltpu.VMEM),            # v scales
        ]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2 if stacked else 1,
        grid=(nb_max,),
        in_specs=[
            pl.BlockSpec((hkv, gt, d), lambda i, *_: (0, 0, 0),
                         memory_space=pltpu.VMEM),            # q
            pl.BlockSpec((hkv, tn, d), lambda i, *_: (0, 0, 0),
                         memory_space=pltpu.VMEM),            # k_new
            pl.BlockSpec((hkv, tn, d), lambda i, *_: (0, 0, 0),
                         memory_space=pltpu.VMEM),            # v_new
            pl.BlockSpec((gt, tn), lambda i, *_: (0, 0),
                         memory_space=pltpu.VMEM),            # bias
        ] + kv_specs,
        out_specs=pl.BlockSpec((hkv, gt, d), lambda i, *_: (0, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((hkv, gt, 1), jnp.float32),   # m
            pltpu.VMEM((hkv, gt, 1), jnp.float32),   # l
            pltpu.VMEM((hkv, gt, d), jnp.float32),   # acc
        ],
    )
    q = (q.astype(jnp.float32) * scale).astype(q.dtype)  # pre-scale once
    args = [jnp.asarray(k_len, jnp.int32).reshape(1)]
    if stacked:
        args.append(jnp.asarray(layer, jnp.int32).reshape(1))
    args += [q, k_new, v_new,
             jnp.where(new_mask, 0.0, _NEG_INF).astype(jnp.float32)]
    if quant:
        # quantize q per (head, row): int8 x int8 hits the MXU; the row
        # scale (with 1/sqrt(d) already folded by the pre-scale above)
        # multiplies the scores
        qf = q.astype(jnp.float32)
        qs = jnp.maximum(jnp.max(jnp.abs(qf), axis=-1) / 127.0, 1e-20)
        q8 = jnp.clip(jnp.round(qf / qs[..., None]), -127, 127
                      ).astype(jnp.int8)
        args[2 if stacked else 1] = q8
        args += [qs.astype(jnp.float32)]
    args += [k, v]
    if quant:
        args += [k_scale.astype(jnp.float32), v_scale.astype(jnp.float32)]
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((hkv, gt, d), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(*args)


def _kernel_batched(klen_ref, *rest, block: int, quant: bool,
                    stacked: bool = False):
    """Row-batched ``_kernel``: grid (B, nb) — row-major, so the sequential
    inner dimension walks one row's sequence blocks while the online-softmax
    scratch is (re)initialised at i == 0 of every row. Each row has its own
    live length (``klen_ref`` is the whole [B] vector via scalar prefetch).
    Refs carry a leading singleton row dim from the (1, ...) block specs.
    ``stacked``: caches are [B, L, ...] and a second prefetch scalar holds
    the (row-shared) layer index — consumed by the index maps; the kernel
    body only needs to skip over its ref."""
    if stacked:
        _ly_ref, rest = rest[0], rest[1:]
    q_ref, kn_ref, vn_ref, bias_ref, *refs = rest
    if quant:
        (qs_ref, k_ref, v_ref, ks_ref, vs_ref, o_ref, m_sc, l_sc,
         acc_sc) = refs
    else:
        (k_ref, v_ref, o_ref, m_sc, l_sc, acc_sc) = refs
        ks_ref = vs_ref = qs_ref = None
    b = pl.program_id(0)
    i = pl.program_id(1)
    k_len = klen_ref[b]
    nb = pl.cdiv(k_len, block)
    hkv, gt, d = q_ref.shape[1:]

    @pl.when(i == 0)
    def _():
        m_sc[:] = jnp.full_like(m_sc, _NEG_INF)
        l_sc[:] = jnp.zeros_like(l_sc)
        acc_sc[:] = jnp.zeros_like(acc_sc)

    @pl.when(i < nb)
    def _():
        base = i * block
        cols = jax.lax.broadcasted_iota(jnp.int32, (1, gt, block), 2) + base
        valid = cols < k_len
        sc = _block_scores(q_ref[0], k_ref[0],
                           None if not quant else qs_ref[0],
                           None if not quant else ks_ref[0], quant)
        sc = jnp.where(valid, sc, _NEG_INF)
        m = m_sc[:]
        m_new = jnp.maximum(m, sc.max(axis=-1, keepdims=True))
        alpha = jnp.exp(m - m_new)
        p = jnp.exp(sc - m_new)
        l_sc[:] = l_sc[:] * alpha + p.sum(axis=-1, keepdims=True)
        pv = _block_pv(p, v_ref[0], None if not quant else vs_ref[0], quant)
        acc_sc[:] = acc_sc[:] * alpha + pv
        m_sc[:] = m_new

    @pl.when(i == jnp.maximum(nb - 1, 0))
    def _():
        o_ref[0] = _fold_new_and_finalize(
            q_ref[0], None if not quant else qs_ref[0], kn_ref[0], vn_ref[0],
            bias_ref[0], m_sc[:], l_sc[:], acc_sc[:], quant)


@functools.partial(jax.jit, static_argnames=("block", "interpret"))
def flash_decode_append_batched(q, k, v, k_new, v_new, k_len, new_mask,
                                block: int = 512, interpret: bool = False,
                                k_scale=None, v_scale=None, layer=None):
    """Row-batched fused decode attention (batched speculation / continuous
    batching): q [B, Hkv, GT, D]; k/v [B, Hkv, S, D] (S % block == 0);
    k_new/v_new [B, Hkv, Tn, D]; new_mask [B, GT, Tn] bool; k_len [B] traced
    i32. -> [B, Hkv, GT, D] fp32. One pallas_call, grid (B, nb): every row
    streams exactly its own live prefix.

    ``layer`` (traced i32, optional): k/v are the WHOLE stacked
    [B, L, Hkv, S, D] caches (scales [B, L, Hkv, S]) and blocks DMA
    straight from layer ``layer`` of each row — zero-copy layer addressing
    for the vmapped model scans (without it the custom_vmap rule had to
    materialise a per-layer slab COPY of every row's cache per call,
    measured as the bulk of the batched step on hardware, r3)."""
    stacked = layer is not None
    bsz, hkv, gt, d = q.shape
    s = k.shape[3] if stacked else k.shape[2]
    tn = k_new.shape[2]
    assert s % block == 0, (s, block)
    scale = 1.0 / math.sqrt(d)
    nb_max = s // block

    tn_pad = -(-tn // 128) * 128
    if tn_pad != tn:
        pad = [(0, 0), (0, 0), (0, tn_pad - tn), (0, 0)]
        k_new = jnp.pad(k_new, pad)
        v_new = jnp.pad(v_new, pad)
        new_mask = jnp.pad(new_mask, [(0, 0), (0, 0), (0, tn_pad - tn)])
        tn = tn_pad

    def clamp(b, i, klen_ref):
        last = jnp.maximum(pl.cdiv(klen_ref[b], block) - 1, 0)
        return jnp.minimum(i, last)

    if stacked:
        def kv_index(b, i, kl, ly):
            return (b, ly[0], 0, clamp(b, i, kl), 0)

        def sc_index(b, i, kl, ly):
            return (b, ly[0], 0, clamp(b, i, kl))
        kv_shape = (1, None, hkv, block, d)
        sc_shape = (1, None, hkv, block)
    else:
        def kv_index(b, i, kl):
            return (b, 0, clamp(b, i, kl), 0)

        def sc_index(b, i, kl):
            return (b, 0, clamp(b, i, kl))
        kv_shape = (1, hkv, block, d)
        sc_shape = (1, hkv, block)

    quant = k_scale is not None
    kernel = functools.partial(_kernel_batched, block=block, quant=quant,
                               stacked=stacked)
    row = lambda b, i, *_: (b, 0, 0, 0)
    row3 = lambda b, i, *_: (b, 0, 0)
    kv_specs = ([pl.BlockSpec((1, hkv, gt), row3, memory_space=pltpu.VMEM)]
                if quant else []) + [
        pl.BlockSpec(kv_shape, kv_index, memory_space=pltpu.VMEM),
        pl.BlockSpec(kv_shape, kv_index, memory_space=pltpu.VMEM),
    ]
    if quant:
        kv_specs += [
            pl.BlockSpec(sc_shape, sc_index, memory_space=pltpu.VMEM),
            pl.BlockSpec(sc_shape, sc_index, memory_space=pltpu.VMEM),
        ]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2 if stacked else 1,
        grid=(bsz, nb_max),
        in_specs=[
            pl.BlockSpec((1, hkv, gt, d), row, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, hkv, tn, d), row, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, hkv, tn, d), row, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, gt, tn), row3, memory_space=pltpu.VMEM),
        ] + kv_specs,
        out_specs=pl.BlockSpec((1, hkv, gt, d), row,
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((hkv, gt, 1), jnp.float32),
            pltpu.VMEM((hkv, gt, 1), jnp.float32),
            pltpu.VMEM((hkv, gt, d), jnp.float32),
        ],
    )
    q = (q.astype(jnp.float32) * scale).astype(q.dtype)
    args = [jnp.asarray(k_len, jnp.int32).reshape(bsz)]
    if stacked:
        args += [jnp.asarray(layer, jnp.int32).reshape(1)]
    args += [q, k_new, v_new,
             jnp.where(new_mask, 0.0, _NEG_INF).astype(jnp.float32)]
    if quant:
        qf = q.astype(jnp.float32)
        qs = jnp.maximum(jnp.max(jnp.abs(qf), axis=-1) / 127.0, 1e-20)
        q8 = jnp.clip(jnp.round(qf / qs[..., None]), -127, 127
                      ).astype(jnp.int8)
        args[2 if stacked else 1] = q8
        args += [qs.astype(jnp.float32)]
    args += [k, v]
    if quant:
        args += [k_scale.astype(jnp.float32), v_scale.astype(jnp.float32)]
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((bsz, hkv, gt, d), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(*args)


def _pick_qtile(gt: int) -> int:
    """Query sub-tile for the wide-query kernel path (gt > 128): largest
    power-of-two divisor of gt that is <= 128, or 0 when gt needs no
    tiling / has no clean tile (the caller then falls back to XLA)."""
    if gt <= 128:
        return 0
    for qt in (128, 64, 32):
        if gt % qt == 0:
            return qt
    return -1   # no clean tile: not kernel-eligible


def _pick_block(s: int, hkv: int, d: int, gt: int, tn: int,
                quant: bool = False, q_tile: int = 0) -> int:
    """Largest candidate block dividing the cache length whose
    double-buffered K+V slabs AND the per-step [Hkv, QT, block] score
    intermediates fit the VMEM left after the resident tensors (q, new KV,
    bias, fp32 accumulators, output): bigger DMAs amortize per-iteration
    pipeline overhead (measured on v5e: 512 -> 40 GB/s, 4000 -> ~400 GB/s).
    For decode shapes (gt <= 64) the score term is noise; for WIDE queries
    (tree verify, gt up to 512) the kernel processes scores in ``q_tile``
    sub-tiles precisely so this term cannot force the DMA block down (the
    r4 T>=256 verify cliff was block 512's collapsed fetch bandwidth)."""
    itemsize = 1 if quant else 2
    resident = hkv * gt * d * (2 + 4 + 4 + 4) + 2 * hkv * tn * d * 2 \
        + gt * tn * 4
    budget = 56 * 1024 * 1024 - resident
    qt = q_tile if q_tile and q_tile > 0 else gt
    # per-block-unit bytes: double-buffered K+V fetches + the live score
    # tile (fp32 scores + exp(p); the quantized path adds an int8 p8 copy)
    per = (2 * 2 * hkv * d * itemsize
           + hkv * qt * (4 + 2 + (1 if quant else 0)))
    cap = max(budget, 0) // per
    # largest divisor of s under the VMEM cap; quantized fetches include
    # [Hkv, block] scale planes whose last dim must be lane-divisible (x128)
    step = 128 if quant else 8
    hi = (min(cap, 4096) // step) * step
    for b in range(hi, 255, -step):
        if s % b == 0:
            return b
    return 256


def append_attention_pallas(q, k_cache, v_cache, k_new, v_new, *, k_len,
                            new_mask=None, block=None,
                            interpret: bool = False, k_scale=None,
                            v_scale=None, layer=None):
    """Drop-in for ops.attention.append_attention (B=1, no cache mask):
    q [1,Hq,T,D]; k/v [1,Hkv,S,D]; k_new/v_new [1,Hkv,T,D] (always bf16 —
    the NEW tokens are in registers; only the cache may be int8).

    With ``layer`` (traced i32): k/v are the whole stacked cache
    [L,1,Hkv,S,D] (scales [L,1,Hkv,S]) and the kernel reads layer ``layer``
    in place — no per-layer slab copy (the zero-copy scan path)."""
    b, hq, t, d = q.shape
    stacked = layer is not None
    hkv = k_cache.shape[2] if stacked else k_cache.shape[1]
    s = k_cache.shape[3] if stacked else k_cache.shape[2]
    g = hq // hkv
    assert b == 1
    if block is None:
        tn_pad = -(-t // 128) * 128
        block = _pick_block(s, hkv, d, g * t, tn_pad,
                            quant=k_scale is not None,
                            q_tile=_pick_qtile(g * t))
    if new_mask is None:
        rows = jax.lax.broadcasted_iota(jnp.int32, (t, t), 0)
        cols = jax.lax.broadcasted_iota(jnp.int32, (t, t), 1)
        new_mask = cols <= rows
    nmask = jnp.tile(jnp.asarray(new_mask, bool), (g, 1))   # [G*T, T]
    qh = q[0].reshape(hkv, g * t, d)
    if stacked:
        L = k_cache.shape[0]
        out = flash_decode_append(
            qh, k_cache.reshape(L, hkv, s, d), v_cache.reshape(L, hkv, s, d),
            k_new[0], v_new[0], k_len, nmask, block=block,
            interpret=interpret,
            k_scale=None if k_scale is None else k_scale.reshape(L, hkv, s),
            v_scale=None if v_scale is None else v_scale.reshape(L, hkv, s),
            layer=layer)
    else:
        out = flash_decode_append(
            qh, k_cache[0], v_cache[0], k_new[0], v_new[0], k_len, nmask,
            block=block, interpret=interpret,
            k_scale=None if k_scale is None else k_scale[0],
            v_scale=None if v_scale is None else v_scale[0])
    return out.reshape(1, hq, t, d).astype(q.dtype)
