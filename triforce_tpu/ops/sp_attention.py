"""Sequence-parallel decode attention: the KV cache sharded along the
sequence axis across the mesh's ``sp`` axis, combined with per-shard
online-softmax partials and a psum merge over ICI.

This is the TPU-native replacement for the reference's CPU-offloading tier
(SURVEY.md §2.4, §5.7): where the reference streams 64 GB of KV over PCIe
layer by layer (cache.py:268-383, TP_llama.py:218-228), a pod slice holds
the cache in HBM sharded over ``sp`` — each chip computes flash-decode
partials (m, l, acc) over its local sequence shard, and one
``pmax``/``psum`` pair merges them exactly (ops/attention.py partials are
associative). Communication per token: two small collectives of
[B, Hkv, G, T(+D)] floats — O(heads * head_dim), independent of context
length.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax.experimental.shard_map import shard_map

from .attention import attention_partials, new_block_partials, _NEG_INF


def _local_partials(q, k_shard, v_shard, k_len, shard_len, axis_name):
    """Partials over this device's sequence shard, with the GLOBAL k_len
    bound translated into the local frame."""
    idx = jax.lax.axis_index(axis_name)
    local_start = idx * shard_len
    local_len = jnp.clip(k_len - local_start, 0, shard_len)
    return attention_partials(q, k_shard, v_shard, k_len=local_len)


def _merge_over_axis(p, axis_name):
    m, l, acc = p
    m_g = jax.lax.pmax(m, axis_name)
    scale = jnp.exp(m - m_g)
    l_g = jax.lax.psum(l * scale, axis_name)
    acc_g = jax.lax.psum(acc * scale[..., None], axis_name)
    return m_g, l_g, acc_g


def sp_append_attention(mesh: Mesh, q, k_cache, v_cache, k_new, v_new, *,
                        k_len, new_mask=None):
    """Attention of T new tokens vs a sequence-sharded cache + themselves.

    q/k_new/v_new replicated over ``sp`` (heads may be sharded over ``tp``);
    k_cache/v_cache sharded [B, Hkv, S/sp, D] on the ``sp`` axis. The
    new-token block is merged AFTER the cross-shard psum on every device
    (replicated compute, no extra comm). Returns attention output plus the
    (k_new, v_new) commit left to the caller.
    """
    t = q.shape[2]
    tn = k_new.shape[2]
    if new_mask is None:
        rows = jax.lax.broadcasted_iota(jnp.int32, (t, tn), 0)
        cols = jax.lax.broadcasted_iota(jnp.int32, (t, tn), 1)
        new_mask = cols <= rows
    s = k_cache.shape[2]
    sp = mesh.shape["sp"]
    assert s % sp == 0
    shard_len = s // sp

    def inner(q, k_shard, v_shard, k_new, v_new, k_len):
        p = _local_partials(q, k_shard, v_shard, k_len, shard_len, "sp")
        m, l, acc = _merge_over_axis(p, "sp")
        pn = new_block_partials(q, k_new, v_new, new_mask)
        mn, ln, accn = pn
        m2 = jnp.maximum(m, mn)
        a1 = jnp.exp(m - m2)
        a2 = jnp.exp(mn - m2)
        l2 = l * a1 + ln * a2
        acc2 = acc * a1[..., None] + accn * a2[..., None]
        out = acc2 / jnp.maximum(l2, 1e-37)[..., None]
        b, hkv, g, t, d = out.shape
        return out.reshape(b, hkv * g, t, d).astype(q.dtype)

    spec_rep = P(None, "tp", None, None)
    spec_kv = P(None, "tp", "sp", None)
    f = shard_map(inner, mesh=mesh,
                  in_specs=(spec_rep, spec_kv, spec_kv, spec_rep, spec_rep,
                            P()),
                  out_specs=spec_rep, check_rep=False)
    return f(q, k_cache, v_cache, k_new, v_new,
             jnp.asarray(k_len, jnp.int32))
