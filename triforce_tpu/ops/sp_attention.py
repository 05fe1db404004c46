"""Sharded append attention: the KV cache partitioned over the mesh
(heads over ``tp``, optionally sequence over ``sp``), combined with
per-shard online-softmax partials and a psum merge over ICI.

This is the TPU-native replacement for the reference's CPU-offloading tier
(SURVEY.md §2.4, §5.7): where the reference streams 64 GB of KV over PCIe
layer by layer (cache.py:268-383, TP_llama.py:218-228), a pod slice holds
the cache in HBM sharded over ``sp`` — each chip computes flash-decode
partials (m, l, acc) over its local sequence shard (the Pallas kernel runs
INSIDE shard_map on local shapes, so it needs no GSPMD partitioning rule),
and one ``pmax``/``psum`` pair merges them exactly (ops/attention.py
partials are associative). Communication per decode forward: two small
collectives of [B, Hkv, G, T(+D)] floats — O(heads * head_dim), independent
of context length.

The same wrapper also carries plain tensor parallelism (``shard_seq=False``:
heads sharded, cache sequence replicated, no collective) so every mesh'd
forward routes attention through one code path.
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
try:
    from jax import shard_map            # jax >= 0.8
except ImportError:                      # pragma: no cover
    from jax.experimental.shard_map import shard_map

from .attention import (attention_partials, new_block_partials,
                        merge_partials, finalize)


def _pallas_ok(b: int, s_loc: int, gt: int) -> bool:
    # one shared admission gate (attention.pallas_decode_eligible)
    from .attention import pallas_decode_eligible
    return pallas_decode_eligible(b, s_loc, gt,
                                  warn_context="sharded attention")


def _cache_partials_local(q, k, v, k_len, ks, vs, mask_fn=None,
                          layer=None):
    """Online-softmax partials over one device's local cache shard, through
    the Pallas flash-decode kernel when the local shapes are eligible.
    Returns the [B, Hkv, G, T(,D)] layout of ``attention_partials``.

    ``layer`` (traced i32, optional): k/v are the WHOLE stacked
    [L, B, Hkv, S_loc, D] local cache and the kernel DMAs blocks of layer
    ``layer`` in place — the zero-copy addressing the meshless path uses
    (append_attention_auto); without it every scan step materialises its
    slab as an HBM->HBM copy (~2x the kernel's own cost at 64K,
    probes/_r2_scanxs.py)."""
    stacked = layer is not None
    b, hq, t, d = q.shape
    if stacked:
        hkv, s_loc = k.shape[2], k.shape[3]
    else:
        hkv, s_loc = k.shape[1], k.shape[2]
    g = hq // hkv
    if mask_fn is None and _pallas_ok(b, s_loc, g * t):
        from .flash_decode import (flash_decode_partials, _pick_block,
                                   _pick_qtile)
        block = _pick_block(s_loc, hkv, d, g * t, 0, quant=ks is not None,
                            q_tile=_pick_qtile(g * t))
        qh = q[0].reshape(hkv, g * t, d)
        m, l, acc = flash_decode_partials(
            qh, k[:, 0] if stacked else k[0],
            v[:, 0] if stacked else v[0], k_len, block=block,
            k_scale=None if ks is None else (ks[:, 0] if stacked else ks[0]),
            v_scale=None if vs is None else (vs[:, 0] if stacked else vs[0]),
            layer=layer)
        return (m.reshape(1, hkv, g, t), l.reshape(1, hkv, g, t),
                acc.reshape(1, hkv, g, t, d))
    if stacked:
        # portable fallback (CPU dryrun / kernel-ineligible shapes): slice
        # the LOCAL layer slab — on the kernel path above no slab is ever
        # materialised
        ly = jnp.asarray(layer, jnp.int32)
        k = jnp.take(k, ly, axis=0)
        v = jnp.take(v, ly, axis=0)
        ks = None if ks is None else jnp.take(ks, ly, axis=0)
        vs = None if vs is None else jnp.take(vs, ly, axis=0)
    return attention_partials(q, k, v, k_len=k_len, mask_fn=mask_fn,
                              k_scale=ks, v_scale=vs)


def merge_partials_psum(p, axis_name: str):
    """Exact cross-shard merge of per-shard partials: one pmax + one psum
    pair over ICI (associative, order-independent)."""
    m, l, acc = p
    m_g = jax.lax.pmax(m, axis_name)
    scale = jnp.exp(m - m_g)
    l_g = jax.lax.psum(l * scale, axis_name)
    acc_g = jax.lax.psum(acc * scale[..., None], axis_name)
    return m_g, l_g, acc_g


def append_attention_sharded(mesh: Mesh, q, k_cache, v_cache, k_new, v_new,
                             *, k_len, new_mask=None, k_scale=None,
                             v_scale=None, shard_seq: bool = True,
                             cache_mask_fn=None, layer=None):
    """Attention of T new tokens vs a mesh-sharded cache + themselves.

    q/k_new/v_new: [B, H(q|kv), T, D], heads sharded over ``tp``, replicated
    over ``sp``. k_cache/v_cache: [B, Hkv, S, D], heads over ``tp`` and —
    when ``shard_seq`` — sequence over ``sp``; with ``shard_seq=False`` the
    cache sequence is replicated over ``sp`` and no collective is issued
    (pure head parallelism, e.g. the retrieval cache). Scale planes
    [B, Hkv, S] shard alongside. ``k_len`` is the GLOBAL live-prefix bound;
    each shard clamps it into its local frame. The new-token block is merged
    AFTER the cross-shard psum on every device (replicated compute, no extra
    comm); the (k_new, v_new) cache commit is left to the caller.
    """
    t = q.shape[2]
    tn = k_new.shape[2]
    if new_mask is None:
        rows = jax.lax.broadcasted_iota(jnp.int32, (t, tn), 0)
        cols = jax.lax.broadcasted_iota(jnp.int32, (t, tn), 1)
        new_mask = cols <= rows
    new_mask = jnp.asarray(new_mask, bool)
    stacked = layer is not None
    s = k_cache.shape[3] if stacked else k_cache.shape[2]
    sp = mesh.shape["sp"]
    if shard_seq:
        assert s % sp == 0, (s, sp)
    shard_len = s // sp if shard_seq else s
    quant = k_scale is not None

    def inner(q, k_shard, v_shard, k_new, v_new, new_mask, k_len, *rest):
        if stacked:
            ly, rest = rest[0], rest[1:]
        else:
            ly = None
        ks, vs = rest if quant else (None, None)
        mask_fn = cache_mask_fn
        if shard_seq:
            idx = jax.lax.axis_index("sp")
            local_start = idx * shard_len
            local_len = jnp.clip(k_len - local_start, 0, shard_len)
            if cache_mask_fn is not None:
                # translate local column frame back to global coordinates
                def mask_fn(rows, cols, _off=local_start):
                    return cache_mask_fn(rows, cols + _off)
        else:
            local_len = k_len
        p = _cache_partials_local(q, k_shard, v_shard, local_len, ks, vs,
                                  mask_fn=mask_fn, layer=ly)
        if shard_seq:
            p = merge_partials_psum(p, "sp")
        pn = new_block_partials(q, k_new, v_new, new_mask)
        return finalize(merge_partials(p, pn), q.dtype)

    seq = "sp" if shard_seq else None
    # the B axis is replicated here (the single-sequence step runs B=1);
    # batched rows shard over "dp" OUTSIDE via jax.vmap(spmd_axis_name="dp")
    # — the batching rule prepends dp to every spec (batched_spec.py), so
    # "dp" must stay free in these specs
    spec_rep = P(None, "tp", None, None)
    # stacked caches carry a leading layer axis (replicated)
    spec_kv = P(None, None, "tp", seq, None) if stacked \
        else P(None, "tp", seq, None)
    spec_sc = P(None, None, "tp", seq) if stacked else P(None, "tp", seq)
    in_specs = [spec_rep, spec_kv, spec_kv, spec_rep, spec_rep,
                P(None, None), P()]
    args = [q, k_cache, v_cache, k_new, v_new, new_mask,
            jnp.asarray(k_len, jnp.int32)]
    if stacked:
        in_specs += [P()]
        args += [jnp.asarray(layer, jnp.int32)]
    if quant:
        in_specs += [spec_sc, spec_sc]
        args += [k_scale, v_scale]
    # check_vma off: under batched_spec's vmap(spmd_axis_name="dp") the
    # varying-manual-axes analysis flags {tp,dp}-varying vs {tp}-varying
    # mixes that are in fact independent per row (same workaround as the
    # dp-only outer shard_map in batched_spec.py); out_specs are explicit
    f = shard_map(inner, mesh=mesh, in_specs=tuple(in_specs),
                  out_specs=spec_rep, check_vma=False)
    return f(*args)


def sp_append_attention(mesh: Mesh, q, k_cache, v_cache, k_new, v_new, *,
                        k_len, new_mask=None):
    """Back-compat alias: sequence-sharded append attention."""
    return append_attention_sharded(mesh, q, k_cache, v_cache, k_new, v_new,
                                    k_len=k_len, new_mask=new_mask,
                                    shard_seq=True)
