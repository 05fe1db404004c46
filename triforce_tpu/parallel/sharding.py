"""Sharding specs for params, caches and decode state.

Maps the reference's hand-rolled tensor parallelism to GSPMD annotations:
  - Q/K/V/gate/up column-split, O/down row-split
    (reference models/TP_layers.py:126-147) -> shard the matching matmul
    axis over ``tp``; XLA inserts the two per-layer all-reduces the reference
    issues by hand (tensor_op.py:179,359) as psums over ICI.
  - KV caches sharded over the kv-head axis (reference cache.py:278
    ``num_kv_heads // world_size``) and optionally the sequence axis over
    ``sp`` — the TPU-native replacement for CPU offloading: a 64 GB 128K
    cache lives across the pod slice instead of behind PCIe
    (SURVEY.md §2.4, §5.7).
"""

from __future__ import annotations

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..config import ModelConfig


def param_shardings(mesh: Mesh, cfg: ModelConfig,
                    weight_quant: bool = False):
    """NamedSharding pytree matching ``llama.init_params`` structure
    (plus the int8 per-channel scale leaves when ``weight_quant``).

    Any dim that does not divide by the tp size falls back to replicated
    (e.g. a vocab that is not a multiple of the mesh)."""
    tp = mesh.shape["tp"]

    def s(dims, *spec):
        spec = tuple(ax if (ax is None or dims[i] % tp == 0) else None
                     for i, ax in enumerate(spec))
        return NamedSharding(mesh, P(*spec))

    h, inter = cfg.hidden_size, cfg.intermediate_size
    hq = cfg.num_heads * cfg.head_dim
    hkv = cfg.num_kv_heads * cfg.head_dim
    L, v = cfg.num_layers, cfg.vocab_size

    layers = {
        "wq": s((L, h, hq), None, None, "tp"),    # column-parallel
        "wk": s((L, h, hkv), None, None, "tp"),
        "wv": s((L, h, hkv), None, None, "tp"),
        "wo": s((L, hq, h), None, "tp", None),    # row-parallel
        "w_gate": s((L, h, inter), None, None, "tp"),
        "w_up": s((L, h, inter), None, None, "tp"),
        "w_down": s((L, inter, h), None, "tp", None),
        "ln_attn": s((L, h), None, None),
        "ln_mlp": s((L, h), None, None),
    }
    out = {
        "embed": s((v, h), None, None),
        "layers": layers,
        "final_norm": s((h,), None),
        "lm_head": s((h, v), None, "tp"),   # vocab-split; logits gathered
    }
    if weight_quant:
        # int8 scale planes shard like their weight's OUTPUT axis
        layers.update({
            "wq_scale": s((L, hq), None, "tp"),
            "wk_scale": s((L, hkv), None, "tp"),
            "wv_scale": s((L, hkv), None, "tp"),
            "wo_scale": s((L, h), None, None),      # row-parallel: out repl.
            "w_gate_scale": s((L, inter), None, "tp"),
            "w_up_scale": s((L, inter), None, "tp"),
            "w_down_scale": s((L, h), None, None),
        })
        out["lm_head_scale"] = s((v,), "tp")
    return out


def kv_shardings(mesh: Mesh, cfg: ModelConfig, shard_seq: bool = False):
    """Sharding for a [L, B, H_kv, S, D] cache: heads over tp, optionally
    sequence over sp. Requires num_kv_heads % tp_size == 0 (GQA models with
    few KV heads should put the surplus on sp instead)."""
    tp = mesh.shape["tp"]
    assert cfg.num_kv_heads % tp == 0, (
        f"num_kv_heads {cfg.num_kv_heads} not divisible by tp={tp}; "
        "use sp for sequence sharding instead")
    seq = "sp" if shard_seq else None
    # B is 1 in the single-sequence engine — replicated; batched rows get
    # the dp axis prepended by batched_state_shardings instead
    return NamedSharding(mesh, P(None, None, "tp", seq, None))


def scale_shardings(mesh: Mesh, cfg: ModelConfig, shard_seq: bool = False):
    """Sharding for an int8 cache's [L, B, H_kv, S] scale planes: same axes
    as the codes minus head_dim."""
    tp = mesh.shape["tp"]
    assert cfg.num_kv_heads % tp == 0
    seq = "sp" if shard_seq else None
    return NamedSharding(mesh, P(None, None, "tp", seq))


def state_shardings(mesh: Mesh, target_cfg: ModelConfig, draft_cfg,
                    shard_seq: bool = False, quant: bool = False):
    """Shardings for a TriForceState pytree (see engine.TriForceState)."""
    from ..engine import TriForceState  # circular-safe local import
    from ..cache import KVCache, RetrievalCache, StreamingCache

    full = kv_shardings(mesh, target_cfg, shard_seq=shard_seq)
    # retrieval cache: small (budget+gamma+1) — shard heads only
    rkv = kv_shardings(mesh, target_cfg, shard_seq=False)
    rep = NamedSharding(mesh, P())
    # the 68M drafter cache is replicated whether or not a drafter exists
    # (the reference replicates its drafter on every rank too:
    # TP_llama.py draft runs on all ranks)
    dkv_s = rep
    scalar = rep
    kv_extra = {}
    rkv_extra = {}
    if quant:
        kv_extra = {"k_scale": scale_shardings(mesh, target_cfg, shard_seq),
                    "v_scale": scale_shardings(mesh, target_cfg, shard_seq)}
        rs = scale_shardings(mesh, target_cfg, False)
        rkv_extra = {"k_scale": rs, "v_scale": rs}
    return TriForceState(
        kv=KVCache(k=full, v=full, seq_len=scalar, **kv_extra),
        rkv=RetrievalCache(k=rkv, v=rkv, **rkv_extra),
        dkv=StreamingCache(k=dkv_s, v=dkv_s, seq_len=scalar),
        next_token=scalar, key=scalar)


def batched_state_shardings(mesh: Mesh, target_cfg: ModelConfig, draft_cfg,
                            shard_seq: bool = False, quant: bool = False):
    """Shardings for a ROW-STACKED TriForceState (leading axis = row,
    sharded over ``dp``; every other axis as in :func:`state_shardings`).
    Used by batched_spec's dp x tp composition: the vmapped step assigns
    the row axis to "dp" via ``spmd_axis_name``, and the at-rest state must
    match."""
    base = state_shardings(mesh, target_cfg, draft_cfg,
                           shard_seq=shard_seq, quant=quant)
    return jax.tree.map(
        lambda ns: NamedSharding(mesh, P(*(("dp",) + tuple(ns.spec)))),
        base)


def shard_params(params, mesh: Mesh, cfg: ModelConfig):
    quant = "lm_head_scale" in params
    return jax.device_put(params, param_shardings(mesh, cfg,
                                                  weight_quant=quant))
