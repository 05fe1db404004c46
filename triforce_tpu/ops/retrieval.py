"""Retrieval-cache construction: chunk-mean key scoring -> top-k chunk
selection -> per-KV-head gather into the budget region.

TPU-native re-design of the reference's eager build
(``/root/reference/models/cache.py:146-178``): one fused jittable function per
layer, called from inside the target forward on the last prefill token (the
reference hooks the same place: models/modeling_llama.py:232-238). A fused
Pallas score kernel exists (``ops/retrieval_kernel.py``) but measured a wash
vs this XLA path in context (5.45 vs 5.33 ms/layer, NOTES_ROUND2.md), so the
XLA path is the default; the build's real cost was the chunk gather, fixed
here by the flat 2-D row-gather in ``gather_chunks`` (178 -> 4 ms/layer).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def chunk_scores_xla(q: jnp.ndarray, k_prefill: jnp.ndarray,
                     chunk_size: int) -> jnp.ndarray:
    """Portable chunk scoring: q . chunk_mean(k), GQA-group-averaged.

    q [B, Hq, 1, D]; k_prefill [B, Hkv, P, D] (P % chunk_size == 0) ->
    [B, Hkv, P // chunk_size] fp32.
    """
    b, hkv, p, d = k_prefill.shape
    hq = q.shape[1]
    g = hq // hkv
    chunks = p // chunk_size

    chunk_k = k_prefill.reshape(b, hkv, chunks, chunk_size, d).mean(
        axis=3, dtype=jnp.float32)                       # [B,Hkv,C,D]
    qg = q.reshape(b, hkv, g, d).astype(jnp.float32)     # [B,Hkv,G,D]
    return jnp.einsum("bhgd,bhcd->bhgc", qg, chunk_k).mean(axis=2)


def chunk_scores(q: jnp.ndarray, k_layer: jnp.ndarray, prefill: int,
                 chunk_size: int, k_scale=None) -> jnp.ndarray:
    """Chunk scores over the live prefill, auto-dispatched: the fused Pallas
    streaming kernel (ops/retrieval_kernel.py — one pass over the keys, no
    chunk-mean or dequant intermediates) when eligible, else the XLA path.

    q [B, Hq, 1, D]; k_layer [B, Hkv, S, D] (full cache slab; int8 codes +
    k_scale [B, Hkv, S] when quantized) -> [B, Hkv, prefill // chunk_size].
    """
    import os
    from .attention import _PALLAS_DISABLED
    from .retrieval_kernel import pick_block
    b, hkv, s, d = k_layer.shape
    g = q.shape[1] // hkv
    block = pick_block(s, hkv, d, chunk_size, k_scale is not None)
    use_pallas = (
        b == 1 and block is not None and prefill % chunk_size == 0
        and jax.default_backend() == "tpu"
        and not _PALLAS_DISABLED[0]
        and not os.environ.get("TRIFORCE_NO_PALLAS"))
    if use_pallas:
        from .retrieval_kernel import chunk_scores_pallas
        sc = chunk_scores_pallas(
            q[0].reshape(hkv, g, d), k_layer[0], chunk=chunk_size,
            prefill=prefill, block=block,
            k_scale=None if k_scale is None else k_scale[0])
        return sc[None]
    k_prefill = k_layer[:, :, :prefill]
    if k_scale is not None:
        k_prefill = (k_prefill.astype(jnp.float32)
                     * k_scale[:, :, :prefill, None])
    return chunk_scores_xla(q, k_prefill, chunk_size)


def select_chunks(scores: jnp.ndarray, select_sets: int) -> jnp.ndarray:
    """Pick ``select_sets`` chunks from per-head scores, always keeping
    chunk 0 (attention sink) first.

    scores: [B, Hkv, C] fp32 -> [B, Hkv, select_sets] int32 chunk indices.

    reference: cache.py:154-162. With GQA (Hq > Hkv) scores are averaged over
    each KV head's query group (the reference only runs MHA models where
    Hq == Hkv, so this is an extension, not a deviation).
    """
    b, hkv, _ = scores.shape
    # top-k over chunks 1.. (chunk 0 pinned; reference: cache.py:159-162)
    _, top_rest = jax.lax.top_k(scores[:, :, 1:], select_sets - 1)
    top_rest = top_rest + 1
    first = jnp.zeros((b, hkv, 1), dtype=top_rest.dtype)
    return jnp.concatenate([first, top_rest], axis=-1)


def gather_chunks(cache_layer: jnp.ndarray, chunk_idx: jnp.ndarray,
                  chunk_size: int) -> jnp.ndarray:
    """Gather selected chunks per KV head.

    cache_layer: [B, Hkv, P, D]; chunk_idx: [B, Hkv, S_sets] ->
    [B, Hkv, S_sets * chunk_size, D]. reference: cache.py:163-175.
    """
    b, hkv, p, d = cache_layer.shape
    chunks = p // chunk_size
    s_sets = chunk_idx.shape[-1]
    # One flat 2D row gather ([B*Hkv*C, chunk*D] rows): measured 6-40x
    # faster on TPU than the 5D take_along_axis form, whose XLA gather
    # lowers catastrophically (178 ms/layer -> 4 ms at 63.5K/budget-4K).
    rows = cache_layer.reshape(b * hkv * chunks, chunk_size * d)
    base = jnp.arange(b * hkv, dtype=chunk_idx.dtype)[:, None] * chunks
    flat = (chunk_idx.reshape(b * hkv, s_sets) + base).reshape(-1)
    return rows[flat].reshape(b, hkv, s_sets * chunk_size, d)


def gather_chunk_scales(scale_layer: jnp.ndarray, chunk_idx: jnp.ndarray,
                        chunk_size: int) -> jnp.ndarray:
    """Gather selected chunks of a per-token scale plane [B, Hkv, P]."""
    b, hkv, p = scale_layer.shape
    chunks = p // chunk_size
    s_sets = chunk_idx.shape[-1]
    rows = scale_layer.reshape(b * hkv * chunks, chunk_size)
    base = jnp.arange(b * hkv, dtype=chunk_idx.dtype)[:, None] * chunks
    flat = (chunk_idx.reshape(b * hkv, s_sets) + base).reshape(-1)
    return rows[flat].reshape(b, hkv, s_sets * chunk_size)


def build_layer(q: jnp.ndarray, k_layer: jnp.ndarray, v_layer: jnp.ndarray,
                prefill: int, chunk_size: int, budget: int,
                k_scale=None, v_scale=None):
    """Build one layer's retrieval budget region.

    q [B,Hq,1,D]; k_layer/v_layer [B,Hkv,S_max,D] (full cache slabs; int8
    codes + per-token scales when quantized — chunk scoring dequantizes on
    the fly, the gather moves codes AND scales so the retrieval cache stays
    int8). Returns (k_sel, v_sel[, ks_sel, vs_sel]) to be written at
    retrieval slots [0, budget). ``prefill`` is static.
    """
    select_sets = budget // chunk_size
    k_prefill = k_layer[:, :, :prefill]
    v_prefill = v_layer[:, :, :prefill]
    scores = chunk_scores(q, k_layer, prefill, chunk_size, k_scale=k_scale)
    idx = select_chunks(scores, select_sets)
    k_sel = gather_chunks(k_prefill, idx, chunk_size)
    v_sel = gather_chunks(v_prefill, idx, chunk_size)
    if k_scale is None:
        return k_sel, v_sel
    ks_sel = gather_chunk_scales(k_scale[:, :, :prefill], idx, chunk_size)
    vs_sel = gather_chunk_scales(v_scale[:, :, :prefill], idx, chunk_size)
    return k_sel, v_sel, ks_sel, vs_sel
