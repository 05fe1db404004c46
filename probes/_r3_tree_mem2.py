"""Bisect which op makes XLA assign the token-major cache layout
{4,2,0,3,1} inside the tree program (forcing 2x 4.12 GB entry-conversion
copies of the donated caches). Compile-only: each variant monkeypatches a
suspect to a no-op, lowers the tree _gen at prefill 130048, and prints the
top HBM temps.

Run: python probes/_r3_tree_mem2.py   (ONE TPU job at a time!)
"""
import re
import sys

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

from triforce_tpu import config as C
from triforce_tpu import cache as cache_mod
from triforce_tpu.models import llama
from triforce_tpu.tree import planner, spectree


def build_and_measure(label):
    cfg = C.BENCH_7B_PROXY
    pvec = planner.modeled_acceptance_vector(0.8, 4)
    T, choice = planner.plan_tree(pvec, 512, 24)
    gm = planner.build_grow_map(T, choice, 512, 24)
    params = jax.eval_shape(
        lambda k: llama.quantize_weights(
            llama.init_params(k, cfg, dtype=jnp.bfloat16)),
        jax.random.PRNGKey(0))
    eng = spectree.TreeEngine(
        cfg, gm, params, prefill=130048,
        max_cache_len=130048 + 4 * (128 + 2 * gm.size),
        budget=12288, chunk_size=8, dtype=jnp.bfloat16, kv_quant=True,
        weight_quant=False, ssl=4)
    state = jax.eval_shape(eng.init_state, jax.random.PRNGKey(1))
    try:
        compiled = eng._gen.lower(128, params, state).compile()
        ma = compiled.memory_analysis()
        print(f"[bisect] {label}: OK temp={ma.temp_size_in_bytes / 2**30:.2f}"
              f" GiB arg={ma.argument_size_in_bytes / 2**30:.2f} GiB",
              flush=True)
    except Exception as e:  # OOM reports carry the allocation table
        msg = str(e)
        m = re.search(r"Used ([0-9.]+)G of", msg)
        copies = re.findall(r"Size: ([0-9.]+)G\n.*\n.*\n?.*XLA label: (copy[^\s]*) = copy\(([^)]*)\)", msg)
        print(f"[bisect] {label}: OOM used={m.group(1) if m else '?'}G; "
              f"big copies: {copies[:4]}", flush=True)


def main():
    print(f"[bisect] backend={jax.default_backend()}", flush=True)

    build_and_measure("baseline")

    # variant: compaction without the cross-layer seq gather
    real_gather = spectree.gather_kv_incremental
    spectree.gather_kv_incremental = (
        lambda kv, idx, n, off, ma_, max_span: kv.replace(
            seq_len=off + n.astype(jnp.int32)))
    build_and_measure("no_gather_kv_incremental")
    spectree.gather_kv_incremental = real_gather

    # variant: no retrieval tail refresh
    real_refresh = spectree.retrieval_tail_refresh
    spectree.retrieval_tail_refresh = lambda rkv, *a, **k: rkv
    build_and_measure("no_tail_refresh")
    spectree.retrieval_tail_refresh = real_refresh

    # variant: both off
    spectree.gather_kv_incremental = (
        lambda kv, idx, n, off, ma_, max_span: kv.replace(
            seq_len=off + n.astype(jnp.int32)))
    spectree.retrieval_tail_refresh = lambda rkv, *a, **k: rkv
    build_and_measure("neither")
    spectree.gather_kv_incremental = real_gather
    spectree.retrieval_tail_refresh = real_refresh




def alt_flat(kv, accept_idx, n_accept, offset, max_accept, max_span):
    """Flat 2-D row-gather variant (the r2 retrieval-gather medicine)."""
    offset = offset.astype(jnp.int32)
    sel0 = jnp.arange(max_accept) < n_accept
    idx = jnp.clip(accept_idx[:max_accept], 0, max_span - 1)

    def one(cache):
        lead = cache.shape[0] * cache.shape[1] * cache.shape[2]
        tail = 1 if cache.ndim == 4 else cache.shape[4]
        block = jax.lax.dynamic_slice_in_dim(cache, offset, max_span, axis=3)
        rows = block.reshape(lead, max_span, tail)
        gathered = rows[:, idx].reshape(block.shape[:3] + (max_accept,)
                                        + block.shape[4:])
        sel = sel0.reshape((1,) * 3 + (max_accept,)
                           + (1,) * (cache.ndim - 4))
        blend = jnp.where(sel, gathered, block[:, :, :, :max_accept])
        return jax.lax.dynamic_update_slice_in_dim(cache, blend, offset,
                                                   axis=3)

    extra = {}
    if kv.quantized:
        extra = {"k_scale": one(kv.k_scale), "v_scale": one(kv.v_scale)}
    return kv.replace(k=one(kv.k), v=one(kv.v),
                      seq_len=offset + n_accept.astype(jnp.int32), **extra)


def alt_barrier(kv, accept_idx, n_accept, offset, max_accept, max_span):
    """Original gather + optimization_barrier before the write-back."""
    import triforce_tpu.cache as cm
    offset = offset.astype(jnp.int32)
    sel0 = jnp.arange(max_accept) < n_accept
    idx = jnp.clip(accept_idx[:max_accept], 0, max_span - 1)

    def one(cache):
        sel = sel0.reshape((1,) * 3 + (max_accept,)
                           + (1,) * (cache.ndim - 4))
        block = jax.lax.dynamic_slice_in_dim(cache, offset, max_span, axis=3)
        gathered = jnp.take(block, idx, axis=3)
        blend = jnp.where(sel, gathered, block[:, :, :, :max_accept])
        blend = jax.lax.optimization_barrier(blend)
        return jax.lax.dynamic_update_slice_in_dim(cache, blend, offset,
                                                   axis=3)

    extra = {}
    if kv.quantized:
        extra = {"k_scale": one(kv.k_scale), "v_scale": one(kv.v_scale)}
    return kv.replace(k=one(kv.k), v=one(kv.v),
                      seq_len=offset + n_accept.astype(jnp.int32), **extra)


def main2():
    spectree.gather_kv_incremental = alt_flat
    build_and_measure("flat2d_gather")
    spectree.gather_kv_incremental = alt_barrier
    build_and_measure("barrier_gather")


if __name__ == "__main__":
    main2()
