"""Attention ops over static-shape caches.

Replaces ``flash_attn_with_kvcache`` (reference models/modeling_llama.py:240,
models/tensor_op.py:166) with online-softmax attention in pure XLA, split
into PARTIALS (m, l, acc) that can be merged:

  cache part — blockwise over the big read-only KV cache, bounded by a traced
               ``k_len`` so masked-out blocks are never touched;
  new part   — the T tokens being appended this call, straight from
               registers (they are never read back from HBM).

The split is what lets model forwards keep the multi-GB cache OUT of any
loop-carried/scan-produced buffer (XLA double-buffers those — 2x 64 GB at
7B-128K scale); it is also the combinator for sequence-sharded flash decode
(per-shard partials + psum merge, SURVEY.md §5.7). A hand-written Pallas
flash-decode kernel (ops/flash_decode.py) is a drop-in for the cache part on
real TPU.

Convention: q is [B, Hq, T, D]; cached K/V are [B, Hkv, S, D]; GQA is handled
by grouping q heads (no materialised ``repeat_kv`` — the reference
materialises it, modeling_llama_68m.py:183-184).
"""

from __future__ import annotations

import contextlib
import math
from typing import Tuple

import jax
import jax.numpy as jnp

_NEG_INF = -1e30   # python float: a module-level jnp scalar would
# initialise the XLA backend at import, breaking jax.distributed
# bring-up (must run before any backend use) on multi-host

# trace-time escape hatch: forwards inside this context never dispatch to
# the Pallas kernel (tests / diagnosis). Batched (vmapped) forwards no
# longer need it — the kernel has a custom_vmap rule that lowers a vmapped
# B=1 call onto the row-batched grid kernel (see _pallas_cv below).
_PALLAS_DISABLED = [False]


@contextlib.contextmanager
def pallas_disabled():
    _PALLAS_DISABLED[0] = True
    try:
        yield
    finally:
        _PALLAS_DISABLED[0] = False

Partials = Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]  # m, l, acc


def _update(qg, m, l, acc, k_blk, v_blk, valid):
    """One online-softmax accumulation step over a key block.
    qg [B,Hkv,G,T,D] pre-scaled, in MODEL dtype; k/v [B,Hkv,S_blk,D];
    valid [T,S_blk].

    Matmul OPERANDS stay in the model dtype (bf16 on TPU) with fp32
    ACCUMULATION — an fp32-operand matmul runs the MXU at a fraction of
    bf16 rate, which was ~3x of the round-1 prefill gap. Softmax state
    (m, l, acc) is fp32 throughout, like flash-attn.
    """
    sc = jnp.einsum("bhgtd,bhsd->bhgts", qg, k_blk.astype(qg.dtype),
                    preferred_element_type=jnp.float32)
    sc = jnp.where(valid[None, None, None], sc, _NEG_INF)
    m_new = jnp.maximum(m, sc.max(axis=-1))
    alpha = jnp.exp(m - m_new)
    p = jnp.exp(sc - m_new[..., None])
    l = l * alpha + p.sum(axis=-1)
    acc = acc * alpha[..., None] + jnp.einsum(
        "bhgts,bhsd->bhgtd", p.astype(qg.dtype), v_blk.astype(qg.dtype),
        preferred_element_type=jnp.float32)
    return m_new, l, acc


def attention_partials(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                       *, k_len=None, mask_fn=None, block: int = 2048,
                       k_scale=None, v_scale=None) -> Partials:
    """Online-softmax partials of q against a (read-only) key/value buffer.

    ``k_len`` (traced i32) masks cols >= k_len and skips whole blocks beyond
    it; ``mask_fn(rows, cols) -> bool`` adds arbitrary extra masking (tree
    ancestors etc.). Blocks are fetched with ``dynamic_slice`` — never by
    reshaping k/v into a scan input, which would materialise a relayouted
    copy of the whole cache.
    """
    b, hq, t, d = q.shape
    hkv, s = k.shape[1], k.shape[2]
    g = hq // hkv
    scale = 1.0 / math.sqrt(d)
    qg = ((q.reshape(b, hkv, g, t, d).astype(jnp.float32)) * scale
          ).astype(q.dtype)

    def valid_at(cols):
        tt, w = cols.shape
        out = jnp.ones((tt, w), bool)
        if k_len is not None:
            out = cols < k_len
        if mask_fn is not None:
            rows = jax.lax.broadcasted_iota(jnp.int32, (tt, w), 0)
            out = out & mask_fn(rows, cols)
        return out

    quant = k_scale is not None

    def deq(blk, sc):
        if sc is None:
            return blk
        return blk.astype(jnp.float32) * sc[..., None].astype(jnp.float32)

    m0 = jnp.full((b, hkv, g, t), _NEG_INF, jnp.float32)
    l0 = jnp.zeros((b, hkv, g, t), jnp.float32)
    acc0 = jnp.zeros((b, hkv, g, t, d), jnp.float32)

    if s <= block:
        cols = jax.lax.broadcasted_iota(jnp.int32, (t, s), 1)
        return _update(qg, m0, l0, acc0, deq(k, k_scale), deq(v, v_scale),
                       valid_at(cols))

    nb = s // block            # full blocks; ragged tail handled statically
    tail = s - nb * block
    cols0 = jax.lax.broadcasted_iota(jnp.int32, (t, block), 1)

    def body(i, c):
        m, l, acc = c
        start = i * block
        k_blk = jax.lax.dynamic_slice_in_dim(k, start, block, axis=2)
        v_blk = jax.lax.dynamic_slice_in_dim(v, start, block, axis=2)
        if quant:
            k_blk = deq(k_blk, jax.lax.dynamic_slice_in_dim(
                k_scale, start, block, axis=2))
            v_blk = deq(v_blk, jax.lax.dynamic_slice_in_dim(
                v_scale, start, block, axis=2))
        return _update(qg, m, l, acc, k_blk, v_blk, valid_at(cols0 + start))

    if k_len is None:
        nb_run = nb
    else:
        nb_run = jnp.minimum(
            (k_len.astype(jnp.int32) + block - 1) // block, nb)
    m, l, acc = jax.lax.fori_loop(0, nb_run, body, (m0, l0, acc0))

    if tail:
        cols = jax.lax.broadcasted_iota(jnp.int32, (t, tail), 1) + nb * block
        k_t, v_t = k[:, :, nb * block:], v[:, :, nb * block:]
        if quant:
            k_t = deq(k_t, k_scale[:, :, nb * block:])
            v_t = deq(v_t, v_scale[:, :, nb * block:])
        m, l, acc = _update(qg, m, l, acc, k_t, v_t, valid_at(cols))
    return m, l, acc


def new_block_partials(q: jnp.ndarray, k_new: jnp.ndarray,
                       v_new: jnp.ndarray, new_mask) -> Partials:
    """Partials of q against the in-register new-token block.
    new_mask: [T, T_new] bool (True = attend); typically lower-triangular
    (append causal) or a tree ancestor matrix."""
    b, hq, t, d = q.shape
    hkv = k_new.shape[1]
    g = hq // hkv
    scale = 1.0 / math.sqrt(d)
    qg = ((q.reshape(b, hkv, g, t, d).astype(jnp.float32)) * scale
          ).astype(q.dtype)
    m0 = jnp.full((b, hkv, g, t), _NEG_INF, jnp.float32)
    l0 = jnp.zeros((b, hkv, g, t), jnp.float32)
    acc0 = jnp.zeros((b, hkv, g, t, d), jnp.float32)
    return _update(qg, m0, l0, acc0, k_new, v_new, jnp.asarray(new_mask))


def merge_partials(a: Partials, b: Partials) -> Partials:
    """Associative combine of online-softmax partials — the same op that
    ``psum``s per-shard partials in sequence-sharded decode."""
    m1, l1, acc1 = a
    m2, l2, acc2 = b
    m = jnp.maximum(m1, m2)
    a1 = jnp.exp(m1 - m)
    a2 = jnp.exp(m2 - m)
    return m, l1 * a1 + l2 * a2, acc1 * a1[..., None] + acc2 * a2[..., None]


def finalize(p: Partials, out_dtype) -> jnp.ndarray:
    m, l, acc = p
    b, hkv, g, t, d = acc.shape
    out = acc / jnp.maximum(l, 1e-37)[..., None]
    return out.reshape(b, hkv * g, t, d).astype(out_dtype)


def append_attention(q, k_cache, v_cache, k_new, v_new, *, k_len,
                     cache_mask_fn=None, new_mask=None, block: int = 2048,
                     k_scale=None, v_scale=None) -> jnp.ndarray:
    """Attention of T new tokens against [valid cache prefix] + [themselves].

    The cache is strictly read-only here; the caller commits (k_new, v_new)
    to the cache with one top-level dynamic_update_slice afterwards. This is
    the load-bearing memory contract: the multi-GB cache is only ever
    touched by (a) read-only block fetches and (b) one in-place DUS on a
    donated buffer — no loop-carried aliases for XLA to double-buffer.
    """
    t = q.shape[2]
    tn = k_new.shape[2]
    if new_mask is None:
        rows = jax.lax.broadcasted_iota(jnp.int32, (t, tn), 0)
        cols = jax.lax.broadcasted_iota(jnp.int32, (t, tn), 1)
        new_mask = cols <= rows
    pc = attention_partials(q, k_cache, v_cache, k_len=k_len,
                            mask_fn=cache_mask_fn, block=block,
                            k_scale=k_scale, v_scale=v_scale)
    pn = new_block_partials(q, k_new, v_new, new_mask)
    out_dtype = q.dtype
    return finalize(merge_partials(pc, pn), out_dtype)


def _cv_rule(quant, axis_size, in_batched, *args):
    """custom_vmap rule shared by the quant/non-quant kernel wrappers:
    a vmapped B=1 flash-decode call becomes ONE row-batched pallas_call
    (grid (B, nb), per-row live lengths) instead of falling back to XLA.
    custom_vmap moves every batched axis to the front, so per-row tensors
    arrive as [B, 1, Hq, T, D] etc.; unbatched args (typically the shared
    causal mask) are broadcast."""
    from .flash_decode import flash_decode_append_batched, _pick_block

    def ensure(x, bat):
        return x if bat else jnp.broadcast_to(x[None],
                                              (axis_size,) + x.shape)

    args = [ensure(x, bat) for x, bat in zip(args, in_batched)]
    if quant:
        q, k_cache, v_cache, k_new, v_new, k_len, new_mask, ks, vs = args
    else:
        q, k_cache, v_cache, k_new, v_new, k_len, new_mask = args
        ks = vs = None
    bsz, _, hq, t, d = q.shape
    hkv = k_cache.shape[2]
    g = hq // hkv
    s = k_cache.shape[3]
    tn = k_new.shape[3]
    tn_pad = -(-tn // 128) * 128
    block = _pick_block(s, hkv, d, g * t, tn_pad, quant=quant)
    qh = q.reshape(bsz, hq, t, d).reshape(bsz, hkv, g * t, d)
    nmask = jnp.tile(new_mask.reshape(bsz, t, tn), (1, g, 1))  # [B, G*T, Tn]
    out = flash_decode_append_batched(
        qh, k_cache.reshape(bsz, hkv, s, d), v_cache.reshape(bsz, hkv, s, d),
        k_new.reshape(bsz, hkv, tn, d), v_new.reshape(bsz, hkv, tn, d),
        k_len.reshape(bsz), nmask, block=block,
        k_scale=None if ks is None else ks.reshape(bsz, hkv, s),
        v_scale=None if vs is None else vs.reshape(bsz, hkv, s))
    out = out.reshape(bsz, 1, hq, t, d).astype(q.dtype)
    return out, True


@jax.custom_batching.custom_vmap
def _pallas_cv(q, k_cache, v_cache, k_new, v_new, k_len, new_mask):
    from .flash_decode import append_attention_pallas
    return append_attention_pallas(q, k_cache, v_cache, k_new, v_new,
                                   k_len=k_len, new_mask=new_mask)


@_pallas_cv.def_vmap
def _pallas_cv_vmap(axis_size, in_batched, *args):
    return _cv_rule(False, axis_size, in_batched, *args)


@jax.custom_batching.custom_vmap
def _pallas_cv_quant(q, k_cache, v_cache, k_new, v_new, k_len, new_mask,
                     k_scale, v_scale):
    from .flash_decode import append_attention_pallas
    return append_attention_pallas(q, k_cache, v_cache, k_new, v_new,
                                   k_len=k_len, new_mask=new_mask,
                                   k_scale=k_scale, v_scale=v_scale)


@_pallas_cv_quant.def_vmap
def _pallas_cv_quant_vmap(axis_size, in_batched, *args):
    return _cv_rule(True, axis_size, in_batched, *args)


# Stacked-cache (zero-copy per-layer) wrappers: k/v arrive as the WHOLE
# [L,1,Hkv,S,D] cache plus a traced layer index; the kernel DMAs blocks of
# that layer straight from the stack (no per-layer slab materialisation —
# probes/_r2_scanxs.py measured the slab copy at ~2x the kernel's own
# bandwidth cost). Under vmap the rule feeds the row-batched kernel the
# stacked [B, L, ...] caches directly (grid (B, nb), layer via scalar
# prefetch) — r3: the earlier slice-the-layer delegation materialised a
# per-layer slab COPY of every row's cache per call, which dominated the
# measured batched step on hardware.

def _cv_rule_stacked(quant, axis_size, in_batched, *args):
    from .flash_decode import flash_decode_append_batched, _pick_block
    if quant:
        (q, k_st, v_st, k_new, v_new, k_len, new_mask, layer, ks_st,
         vs_st) = args
        (qb, kb, vb, knb, vnb, klb, nmb, lyb, ksb, vsb) = in_batched
    else:
        q, k_st, v_st, k_new, v_new, k_len, new_mask, layer = args
        qb, kb, vb, knb, vnb, klb, nmb, lyb = in_batched
        ks_st = vs_st = None
    ly = layer[0] if lyb else layer  # rows share the layer index (scan)

    def ensure(x, bat):
        if x is None:
            return None
        return x if bat else jnp.broadcast_to(x[None],
                                              (axis_size,) + x.shape)

    # per-row leaves -> [B, ...]; the stacked caches keep their layer axis:
    # [B, L, 1, Hkv, S, D] -> [B, L, Hkv, S, D]
    q = ensure(q, qb)
    k_st, v_st = ensure(k_st, kb), ensure(v_st, vb)
    k_new, v_new = ensure(k_new, knb), ensure(v_new, vnb)
    k_len = ensure(k_len, klb)
    new_mask = ensure(new_mask, nmb)
    bsz, _, hq, t, d = q.shape
    hkv, s = k_st.shape[3], k_st.shape[4]
    g = hq // hkv
    tn = k_new.shape[3]
    tn_pad = -(-tn // 128) * 128
    block = _pick_block(s, hkv, d, g * t, tn_pad, quant=quant)
    qh = q.reshape(bsz, hq, t, d).reshape(bsz, hkv, g * t, d)
    nmask = jnp.tile(new_mask.reshape(bsz, t, tn), (1, g, 1))
    out = flash_decode_append_batched(
        qh, k_st.reshape(bsz, -1, hkv, s, d), v_st.reshape(bsz, -1, hkv, s, d),
        k_new.reshape(bsz, hkv, tn, d), v_new.reshape(bsz, hkv, tn, d),
        k_len.reshape(bsz), nmask, block=block,
        k_scale=None if ks_st is None
        else ensure(ks_st, ksb).reshape(bsz, -1, hkv, s),
        v_scale=None if vs_st is None
        else ensure(vs_st, vsb).reshape(bsz, -1, hkv, s),
        layer=ly)
    out = out.reshape(bsz, 1, hq, t, d).astype(q.dtype)
    return out, True


@jax.custom_batching.custom_vmap
def _pallas_cv_stacked(q, k_st, v_st, k_new, v_new, k_len, new_mask, layer):
    from .flash_decode import append_attention_pallas
    return append_attention_pallas(q, k_st, v_st, k_new, v_new,
                                   k_len=k_len, new_mask=new_mask,
                                   layer=layer)


@_pallas_cv_stacked.def_vmap
def _pallas_cv_stacked_vmap(axis_size, in_batched, *args):
    return _cv_rule_stacked(False, axis_size, in_batched, *args)


@jax.custom_batching.custom_vmap
def _pallas_cv_quant_stacked(q, k_st, v_st, k_new, v_new, k_len, new_mask,
                             layer, k_scale, v_scale):
    from .flash_decode import append_attention_pallas
    return append_attention_pallas(q, k_st, v_st, k_new, v_new,
                                   k_len=k_len, new_mask=new_mask,
                                   layer=layer, k_scale=k_scale,
                                   v_scale=v_scale)


@_pallas_cv_quant_stacked.def_vmap
def _pallas_cv_quant_stacked_vmap(axis_size, in_batched, *args):
    return _cv_rule_stacked(True, axis_size, in_batched, *args)


def pallas_decode_eligible(b: int, s: int, gt: int,
                           warn_context: str = "") -> bool:
    """THE flash-decode kernel admission gate (single source of truth —
    review r3 found three drifting copies): B=1 per call, cache length
    512-aligned and >= 2048, per-head query rows gt <= 128 OR a wide-query
    shape the kernel can q-TILE (gt <= 512 with a clean 128/64/32 tile —
    the in-kernel sub-tiling keeps the DMA block large, which removed the
    r4 T>=256 verify cliff: measured T=256 97.9 -> ~20 ms, T=512 117.7 ->
    ~25 ms vs the XLA partials path, probes/_r5_cliff.py), TPU backend,
    not disabled. When ``warn_context`` is set and a decode-shaped call
    misses ONLY the alignment/batch conditions, warn once per trace
    instead of silently degrading (~10x decode bandwidth at stake)."""
    import os
    from .flash_decode import _pick_qtile
    enabled = (jax.default_backend() == "tpu" and not _PALLAS_DISABLED[0]
               and not os.environ.get("TRIFORCE_NO_PALLAS"))
    gt_ok = gt <= 128 or (gt <= 512 and _pick_qtile(gt) > 0)
    ok = (enabled and b == 1 and s % 512 == 0 and s >= 2048 and gt_ok)
    if (not ok and enabled and warn_context and gt <= 128 and s >= 2048
            and (s % 512 != 0 or b != 1)):
        import warnings
        warnings.warn(
            f"flash-decode kernel skipped in {warn_context} (cache len {s} "
            f"% 512 != 0 or batch {b} != 1); falling back to the XLA path",
            stacklevel=3)
    return ok


def append_attention_auto(q, k_cache, v_cache, k_new, v_new, *, k_len,
                          cache_mask_fn=None, new_mask=None,
                          block: int = 2048, k_scale=None,
                          v_scale=None, layer=None) -> jnp.ndarray:
    """Dispatch to the Pallas flash-decode kernel when eligible (TPU backend,
    B=1, no extra cache mask, cache length a multiple of the DMA block),
    else the portable XLA path. ``TRIFORCE_NO_PALLAS=1`` disables the
    kernel.

    ``layer`` (traced i32, optional): k_cache/v_cache are the WHOLE stacked
    [L,B,Hkv,S,D] cache (scales [L,B,Hkv,S]) and the kernel reads layer
    ``layer`` in place. Model layer scans MUST use this instead of slicing
    per-layer slabs: a sliced slab operand costs an HBM->HBM copy of the
    slab per call — measured ~2x the kernel's own time at 64K
    (probes/_r2_scanxs.py vs probes/_r2_kern_iso.py)."""
    import os
    stacked = layer is not None
    if stacked:
        batch, hkv, s = k_cache.shape[1], k_cache.shape[2], k_cache.shape[3]
    else:
        batch, hkv, s = k_cache.shape[0], k_cache.shape[1], k_cache.shape[2]
    gt = q.shape[1] * q.shape[2] // hkv  # per-head rows G*T
    use_pallas = (cache_mask_fn is None
                  and pallas_decode_eligible(
                      max(q.shape[0], batch), s, gt,
                      warn_context="append_attention_auto"
                      if cache_mask_fn is None else ""))
    if use_pallas:
        # go through the custom_vmap wrappers: called plain they ARE
        # append_attention_pallas; called under jax.vmap (batched
        # speculation) they lower onto the row-batched kernel
        t, tn = q.shape[2], k_new.shape[2]
        if new_mask is None:
            rows = jax.lax.broadcasted_iota(jnp.int32, (t, tn), 0)
            cols = jax.lax.broadcasted_iota(jnp.int32, (t, tn), 1)
            new_mask = cols <= rows
        nm = jnp.asarray(new_mask, bool)
        kl = jnp.asarray(k_len, jnp.int32)
        if stacked:
            ly = jnp.asarray(layer, jnp.int32)
            if k_scale is None:
                return _pallas_cv_stacked(q, k_cache, v_cache, k_new,
                                          v_new, kl, nm, ly)
            return _pallas_cv_quant_stacked(q, k_cache, v_cache, k_new,
                                            v_new, kl, nm, ly, k_scale,
                                            v_scale)
        if k_scale is None:
            return _pallas_cv(q, k_cache, v_cache, k_new, v_new, kl, nm)
        return _pallas_cv_quant(q, k_cache, v_cache, k_new, v_new, kl, nm,
                                k_scale, v_scale)
    if stacked:
        # portable fallback: slice the layer slab (one copy — exactly what
        # the pre-stacked code paid) and run the XLA partials path
        ly = jnp.asarray(layer, jnp.int32)
        k_cache = jnp.take(k_cache, ly, axis=0)
        v_cache = jnp.take(v_cache, ly, axis=0)
        if k_scale is not None:
            k_scale = jnp.take(k_scale, ly, axis=0)
            v_scale = jnp.take(v_scale, ly, axis=0)
    return append_attention(q, k_cache, v_cache, k_new, v_new, k_len=k_len,
                            cache_mask_fn=cache_mask_fn, new_mask=new_mask,
                            block=block, k_scale=k_scale, v_scale=v_scale)


# ---------------------------------------------------------------------------
# Whole-buffer variants (tests / small paths)
# ---------------------------------------------------------------------------

def masked_attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                     mask: jnp.ndarray) -> jnp.ndarray:
    """q [B,Hq,T,D], k/v [B,Hkv,S,D], mask [T,S] bool (True = attend).
    fp32 softmax (flash-attn also accumulates in fp32), output in q.dtype."""
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


def blockwise_attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                        mask_fn, block: int = 2048,
                        k_len=None) -> jnp.ndarray:
    """Full attention over one buffer via partials (portable fallback +
    CPU-test surface)."""
    p = attention_partials(q, k, v, k_len=k_len, mask_fn=mask_fn,
                           block=block)
    return finalize(p, q.dtype)


def append_mask(t: int, s_max: int, seq_len: jnp.ndarray) -> jnp.ndarray:
    """Causal mask for T tokens appended at slot ``seq_len`` of an S_max-slot
    cache: query i attends slots [0, seq_len + i]."""
    rows = jax.lax.broadcasted_iota(jnp.int32, (t, s_max), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (t, s_max), 1)
    return cols <= seq_len + rows


def spec_mask(t: int, real_budget: int, budget: int) -> jnp.ndarray:
    """Mask for middle-model speculative verify over the retrieval cache:
    budget slots always visible, scratch slot j visible to query i iff j <= i
    (end-aligned causal within the gamma+1 scratch region)."""
    rows = jax.lax.broadcasted_iota(jnp.int32, (t, real_budget), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (t, real_budget), 1)
    return (cols < budget) | (cols - budget <= rows)


def causal_from(base):
    """Mask factory: query row i attends key slots [0, base + i]."""
    def fn(rows, cols):
        return cols <= base + rows
    return fn


def budget_causal(budget: int):
    """Mask factory for the retrieval cache: see ``spec_mask``."""
    def fn(rows, cols):
        return (cols < budget) | (cols - budget <= rows)
    return fn
