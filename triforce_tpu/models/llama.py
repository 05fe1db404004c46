"""Functional Llama forward passes over explicit cache pytrees.

One tower replaces BOTH reference towers (the nn.Module on-chip tower
``models/modeling_llama.py`` / ``models/modeling_llama_68m.py`` and the
functional TP tower ``models/TP_llama.py`` / ``models/tensor_op.py``): params
are a pytree of stacked per-layer arrays, the layer loop is a ``lax.scan``
(one compiled body for all layers), and the same code runs single-chip or
sharded — GSPMD inserts the collectives the reference issues by hand
(``tensor_op.py:179,359``).

MEMORY CONTRACT (the TPU-native answer to the reference's in-place CUDA
caches): the multi-GB KV cache is read-only inside the layer scan — each
layer's slab arrives as a scan xs slice, attention fetches blocks from it,
and the freshly projected K/V for the T new tokens are emitted as tiny scan
ys. ONE top-level ``dynamic_update_slice`` then commits the [L, B, H, T, D]
new-KV stack into the donated cache buffer, which XLA runs in place. Caches
must never be produced by a scan or carried through a loop: XLA
double-buffers such values (2x 64 GB at 7B-128K scale).

Forward modes (all static-shape, all jittable):
  forward_append      — prefill chunks / AR decode / full-cache target verify
                        (reference ``model_run``, graph_infer.py:29-40),
                        optionally building the retrieval cache on a 1-token
                        forward (reference modeling_llama.py:232-238), or
                        verifying a speculation tree with a static tree mask
  forward_spec        — middle-model verify over the retrieval cache
                        (reference ``model_verify``, spec=True path)
  forward_tree_spec   — middle-model grow step over the tree retrieval cache
  draft_forward       — drafter prefill into the StreamingLLM cache
  draft_forward_spec  — drafter speculation at a gamma offset with un-rotated
                        key storage + whole-window re-rotation
                        (reference modeling_llama_68m.py:151-178)
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from ..config import ModelConfig, SpecConfig
from ..cache import (KVCache, RetrievalCache, StreamingCache,
                     quantize_tokens)
from ..ops.attention import (append_attention, append_attention_auto,
                             attention_partials, new_block_partials,
                             merge_partials, finalize)
from ..ops.sp_attention import append_attention_sharded
from ..ops import retrieval as retrieval_ops
from . import rope


# ---------------------------------------------------------------------------
# Parameters
# ---------------------------------------------------------------------------

def init_params(key: jax.Array, cfg: ModelConfig, dtype=jnp.bfloat16):
    """Random-init params pytree with stacked [L, ...] per-layer weights."""
    k = jax.random.split(key, 12)
    h, i, L = cfg.hidden_size, cfg.intermediate_size, cfg.num_layers
    hq = cfg.num_heads * cfg.head_dim
    hkv = cfg.num_kv_heads * cfg.head_dim
    s = 0.02

    def rnd(kk, shape, scale=s):
        return (jax.random.normal(kk, shape, jnp.float32) * scale).astype(dtype)

    params = {
        "embed": rnd(k[0], (cfg.vocab_size, h)),
        "layers": {
            "wq": rnd(k[1], (L, h, hq)),
            "wk": rnd(k[2], (L, h, hkv)),
            "wv": rnd(k[3], (L, h, hkv)),
            "wo": rnd(k[4], (L, hq, h)),
            "w_gate": rnd(k[5], (L, h, i)),
            "w_up": rnd(k[6], (L, h, i)),
            "w_down": rnd(k[7], (L, i, h)),
            "ln_attn": jnp.ones((L, h), dtype),
            "ln_mlp": jnp.ones((L, h), dtype),
        },
        "final_norm": jnp.ones((h,), dtype),
        "lm_head": rnd(k[8], (h, cfg.vocab_size)),
    }
    if cfg.tie_word_embeddings:
        params["lm_head"] = params["embed"].T
    return params


def _rms_norm(x: jnp.ndarray, w: jnp.ndarray, eps: float) -> jnp.ndarray:
    # fp32 internals, like the reference (modeling_llama.py:138-143)
    xf = x.astype(jnp.float32)
    var = jnp.mean(xf * xf, axis=-1, keepdims=True)
    return (w * (xf * jax.lax.rsqrt(var + eps)).astype(x.dtype))


def _wmm(x, subs, lp, name, pet=None, aq=False):
    """Weight matmul with optional INT8 weight-only quantization: int8 codes
    stream from HBM (half the bytes — decode is bandwidth-bound), convert to
    the activation dtype in the matmul fusion, and the per-output-channel
    scale multiplies the OUTPUT (mixed int8 x bf16 dots do not hit the MXU,
    so quantization lives entirely in the weight load). A weight that was
    pre-converted by :func:`dequant_weights` keeps its ``_scale`` plane —
    scale presence, not weight dtype, selects the scaled path, so both forms
    produce bit-identical outputs.

    ``aq=True`` + int8 weights: dynamic per-token ACTIVATION quantization —
    the dot runs int8 x int8 on the MXU (double throughput, half the weight
    bytes, NO per-matmul int8->bf16 weight materialisation, which round 3
    measured at ~5 ms per weight set in W~78-wide tree grow forwards,
    BENCH_LOCAL round3_tree_bf16_ablation). Activation rounding shifts the
    output slightly, so this path is reserved for PROPOSAL forwards (tree
    grow): the outer exact rejection test absorbs any proposal shift
    (losslessness untouched); verify forwards keep the exact path."""
    w = lp[name]
    scale = lp.get(name + "_scale") if isinstance(lp, dict) else None
    if w.dtype == jnp.int8 and aq:
        xf = x.astype(jnp.float32)
        s_x = jnp.maximum(jnp.max(jnp.abs(xf), axis=-1, keepdims=True),
                          1e-6) / 127.0
        x8 = jnp.clip(jnp.round(xf / s_x), -127, 127).astype(jnp.int8)
        out = jnp.einsum(subs, x8, w,
                         preferred_element_type=jnp.int32)
        out = out.astype(jnp.float32) * s_x        # [.., t, 1] broadcast
        if scale is not None:
            out = out * scale
        return out.astype(pet if pet is not None else x.dtype)
    if w.dtype == jnp.int8:
        w = w.astype(x.dtype)
    out = jnp.einsum(subs, x, w, preferred_element_type=pet)
    if scale is not None:
        out = out * scale.astype(out.dtype)
    return out


def _mlp(x, lp, aq=False):
    gate = _wmm(x, "bth,hi->bti", lp, "w_gate", aq=aq)
    up = _wmm(x, "bth,hi->bti", lp, "w_up", aq=aq)
    return _wmm(jax.nn.silu(gate) * up, "bti,ih->bth", lp, "w_down", aq=aq)


def _qkv(x, lp, cfg: ModelConfig, aq=False):
    b, t, _ = x.shape
    q = _wmm(x, "bth,hd->btd", lp, "wq", aq=aq).reshape(
        b, t, cfg.num_heads, cfg.head_dim).transpose(0, 2, 1, 3)
    k = _wmm(x, "bth,hd->btd", lp, "wk", aq=aq).reshape(
        b, t, cfg.num_kv_heads, cfg.head_dim).transpose(0, 2, 1, 3)
    v = _wmm(x, "bth,hd->btd", lp, "wv", aq=aq).reshape(
        b, t, cfg.num_kv_heads, cfg.head_dim).transpose(0, 2, 1, 3)
    return q, k, v  # [B, H, T, D]


def _attn_out(ctx, lp, aq=False):
    b, hq, t, d = ctx.shape
    flat = ctx.transpose(0, 2, 1, 3).reshape(b, t, hq * d)
    return _wmm(flat, "btd,dh->bth", lp, "wo", aq=aq)


def _logits(cfg: ModelConfig, params, x, aq=False) -> jnp.ndarray:
    x = _rms_norm(x, params["final_norm"], cfg.rms_norm_eps)
    # matmul in model dtype with fp32 accumulation, then cast — exactly the
    # reference's `lm_head(h).float()` (modeling_llama.py:408-409); f32
    # OPERANDS would be a 4x-slower multi-pass on the bf16-native MXU
    return _wmm(x, "bth,hv->btv", params, "lm_head",
                pet=jnp.float32, aq=aq)


def quantize_weights(params):
    """Symmetric per-output-channel INT8 quantization of every matmul weight
    (layers + lm_head; embed and norms stay in model dtype). Beyond-reference
    (the reference serves fp16 weights); halves the weight stream that floors
    autoregressive decode. Scales are fp32 [.., out]."""
    def q(w):
        wf = w.astype(jnp.float32)
        s = jnp.maximum(jnp.max(jnp.abs(wf), axis=-2) / 127.0, 1e-8)
        codes = jnp.clip(jnp.round(wf / s[..., None, :]), -127, 127)
        return codes.astype(jnp.int8), s

    layers = dict(params["layers"])
    for name in ("wq", "wk", "wv", "wo", "w_gate", "w_up", "w_down"):
        codes, s = q(layers[name])
        layers[name] = codes
        layers[name + "_scale"] = s
    new = dict(params)
    new["layers"] = layers
    lm, ls = q(params["lm_head"])
    new["lm_head"] = lm
    new["lm_head_scale"] = ls
    return new


def dequant_weights(params, dtype=jnp.bfloat16):
    """EXACT int8->bf16 pre-conversion of quantized matmul weights (codes
    convert losslessly; the per-channel ``_scale`` planes stay and are still
    applied on matmul outputs by ``_wmm``), so forwards over the result are
    bit-identical to the fused-convert int8 path.

    Why: in WIDE forwards (tree grow levels at W~78, tree verify at
    T=tree_size, prefill chunks) XLA materialises the int8->bf16 convert per
    matmul — measured at ~5 ms per full weight set on v5e, which made int8
    weights 24% SLOWER than bf16 at reference tree scale
    (BENCH_LOCAL round3_tree_bf16_ablation). Calling this once per
    generation (inside the jitted program, so the copy lives only for the
    dispatch) converts each weight exactly once; every level then streams
    plain bf16. Narrow decode forwards (T <= gamma+2) keep the fused int8
    path — there the halved HBM stream wins."""
    def conv(w):
        return w.astype(dtype) if w.dtype == jnp.int8 else w
    new = dict(params)
    new["layers"] = {k: conv(v) for k, v in params["layers"].items()}
    new["lm_head"] = conv(params["lm_head"])
    return new


def _commit(cache_k, cache_v, new_k, new_v, start):
    """The single in-place write: new [L, B, H, T, D] stacks into the donated
    [L, B, H, S, D] cache buffers at slot ``start``."""
    zero = jnp.zeros((), jnp.int32)
    idx = (zero, zero, zero, start.astype(jnp.int32), zero)
    return (jax.lax.dynamic_update_slice(cache_k, new_k, idx),
            jax.lax.dynamic_update_slice(cache_v, new_v, idx))


def _commit_cache(cache, new_k, new_v, start, **replace):
    """Commit new KV stacks to a (possibly int8-quantized) cache pytree."""
    if cache.quantized:
        k8, ks = quantize_tokens(new_k)
        v8, vs = quantize_tokens(new_v)
        ck, cv = _commit(cache.k, cache.v, k8, v8, start)
        zero = jnp.zeros((), jnp.int32)
        idx = (zero, zero, zero, start.astype(jnp.int32))
        cks = jax.lax.dynamic_update_slice(cache.k_scale, ks, idx)
        cvs = jax.lax.dynamic_update_slice(cache.v_scale, vs, idx)
        return cache.replace(k=ck, v=cv, k_scale=cks, v_scale=cvs, **replace)
    ck, cv = _commit(cache.k, cache.v, new_k, new_v, start)
    return cache.replace(k=ck, v=cv, **replace)


def _cache_xs(cache):
    """Scan xs tuple for a cache's per-layer slabs (+ scale slabs if
    quantized)."""
    if cache.quantized:
        return (cache.k, cache.v, cache.k_scale, cache.v_scale)
    return (cache.k, cache.v)


def _unpack_xs(xs, quant):
    if quant:
        lp, k_all, v_all, ks_all, vs_all = xs
    else:
        lp, k_all, v_all = xs
        ks_all = vs_all = None
    return lp, k_all, v_all, ks_all, vs_all


# ---------------------------------------------------------------------------
# Target-model forwards
# ---------------------------------------------------------------------------

def forward_append(cfg: ModelConfig, params, input_ids: jnp.ndarray,
                   kv: KVCache, *,
                   positions: Optional[jnp.ndarray] = None,
                   build_rkv: Optional[RetrievalCache] = None,
                   prefill: int = 0, chunk_size: int = 8, budget: int = 0,
                   tree_mask=None, need_logits: bool = True,
                   mesh=None, shard_seq: bool = False, commit: bool = True,
                   ) -> Tuple[jnp.ndarray, KVCache, Optional[RetrievalCache]]:
    """Append ``T`` tokens to the full cache and attend causally over it.

    When ``build_rkv`` is given (T must be 1), also constructs every layer's
    retrieval budget region from this token's query — fused into the same
    forward exactly like the reference's in-attention hook
    (modeling_llama.py:232-238). ``prefill``/``chunk_size``/``budget`` static.

    When ``tree_mask`` (static [T, T] bool ancestor matrix) is given, the T
    appended tokens are a speculation tree: token i attends the committed
    prefix plus its tree ancestors (reference SpecTree verify,
    utils/SpecTree_TP.py:168-173); ``positions`` must then be the per-node
    depths offset by ``seq_len``.

    ``need_logits=False`` skips the lm_head projection (prefill chunks whose
    logits nobody reads — T x hidden x vocab matmuls saved per chunk).
    """
    b, t = input_ids.shape
    building = build_rkv is not None
    if building:
        assert t == 1, "retrieval build requires a 1-token forward"

    cos, sin = rope.cos_sin_tables(cfg)
    if positions is None:
        positions = kv.seq_len + jnp.arange(t)  # modeling_llama.py:345-349
    seq_len0 = kv.seq_len
    new_mask = jnp.asarray(tree_mask, bool) if tree_mask is not None else None
    slot_pos = jnp.arange(kv.max_len)

    x = jnp.take(params["embed"], input_ids, axis=0)
    quant = kv.quantized
    assert not (quant and cfg.rope_on_slots), \
        "un-rotated-key (drafter) caches are not quantized"
    # Zero-copy layer addressing: scan over a layer INDEX and let the
    # attention op read the stacked cache in place — meshless via
    # append_attention_auto, sharded via append_attention_sharded's stacked
    # path (the layer index rides into shard_map; the Pallas kernel DMAs
    # blocks of that layer from the local shard). Scanning the cache as xs
    # instead hands the kernel a sliced slab operand, which XLA materialises
    # as an HBM->HBM copy — measured at ~2x the kernel's own cost per layer
    # at 64K (probes/_r2_scanxs.py). rope_on_slots (drafter) still needs the
    # materialised slab (whole-window re-rotation).
    stacked = not cfg.rope_on_slots

    def body(x, xs):
        if stacked:
            lp, li = xs
            k_all = v_all = ks_all = vs_all = None
        else:
            lp, k_all, v_all, ks_all, vs_all = _unpack_xs(xs, quant)
        h = _rms_norm(x, lp["ln_attn"], cfg.rms_norm_eps)
        q, k_new, v_new = _qkv(h, lp, cfg)
        q = rope.apply_rope(q, cos, sin, positions)
        k_att = rope.apply_rope(k_new, cos, sin, positions)
        if cfg.rope_on_slots:
            k_cache = rope.apply_rope(k_all, cos, sin, slot_pos)
            k_store = k_new  # keys stored un-rotated
        else:
            k_cache = k_all
            k_store = k_att  # rotated keys stored (modeling_llama.py:221-230)
        if mesh is not None:
            # sharded cache (tp heads, sp sequence): the Pallas kernel runs
            # on the LOCAL shard inside shard_map; partials psum-merge over
            # ICI (the reference's whole offloading tier, SURVEY.md §5.7).
            # stacked: the whole [L,...] cache + layer index go in, so the
            # sharded path keeps the meshless zero-copy addressing
            if stacked:
                ctx = append_attention_sharded(
                    mesh, q, kv.k, kv.v, k_att, v_new, k_len=seq_len0,
                    new_mask=new_mask, k_scale=kv.k_scale,
                    v_scale=kv.v_scale, shard_seq=shard_seq, layer=li)
            else:
                ctx = append_attention_sharded(
                    mesh, q, k_cache, v_all, k_att, v_new, k_len=seq_len0,
                    new_mask=new_mask, k_scale=ks_all, v_scale=vs_all,
                    shard_seq=shard_seq)
        elif stacked:
            ctx = append_attention_auto(q, kv.k, kv.v, k_att, v_new,
                                        k_len=seq_len0, new_mask=new_mask,
                                        k_scale=kv.k_scale,
                                        v_scale=kv.v_scale, layer=li)
        else:
            ctx = append_attention_auto(q, k_cache, v_all, k_att, v_new,
                                        k_len=seq_len0, new_mask=new_mask,
                                        k_scale=ks_all, v_scale=vs_all)
        x = x + _attn_out(ctx, lp)
        h = _rms_norm(x, lp["ln_mlp"], cfg.rms_norm_eps)
        x = x + _mlp(h, lp)
        ys = (k_store, v_new, q) if building else (k_store, v_new)
        return x, ys

    if stacked:
        xs_in = (params["layers"], jnp.arange(cfg.num_layers))
    else:
        xs_in = (params["layers"],) + _cache_xs(kv)
    x, ys = jax.lax.scan(body, x, xs_in)
    if building:
        new_k, new_v, qs = ys
    else:
        new_k, new_v = ys

    if not commit:
        # deferred-commit mode (batched speculation): return the raw
        # [L, B, H, T, D] new-KV stacks in the cache slot; the CALLER
        # commits them outside its vmap with per-row chained
        # dynamic_update_slice. Under vmap the in-step commit lowers to a
        # scatter on a buffer the attention custom call also reads, and
        # XLA copy-insertion materialises the whole multi-GB cache per
        # step (measured: the outer step half went 3.8 -> ~38 ms at B=4,
        # probes/_r4_batched_decomp3.py).
        assert not building
        return _logits(cfg, params, x) if need_logits else None, \
            (new_k, new_v), None

    kv_out = _commit_cache(kv, new_k, new_v, seq_len0,
                           seq_len=kv.seq_len + t)
    logits = _logits(cfg, params, x) if need_logits else None

    rkv_out = None
    if building:
        # Second, READ-ONLY scan over the committed cache stack: slicing the
        # cache as scan xs keeps it out of any loop carry (memory contract).
        def build_body(_, xs):
            q_l = xs[-1]
            k_l, v_l, ks_l, vs_l = (xs[0], xs[1],
                                    xs[2] if quant else None,
                                    xs[3] if quant else None)
            sel = retrieval_ops.build_layer(
                q_l, k_l, v_l, prefill, chunk_size, budget,
                k_scale=ks_l, v_scale=vs_l)
            return None, sel

        _, sels = jax.lax.scan(build_body, None,
                               _cache_xs(kv_out) + (qs,))
        zero = jnp.zeros((), jnp.int32)
        idx = (zero, zero, zero, zero, zero)
        rk = jax.lax.dynamic_update_slice(build_rkv.k, sels[0], idx)
        rv = jax.lax.dynamic_update_slice(build_rkv.v, sels[1], idx)
        extra = {}
        if quant:
            idx4 = (zero, zero, zero, zero)
            extra = {"k_scale": jax.lax.dynamic_update_slice(
                         build_rkv.k_scale, sels[2], idx4),
                     "v_scale": jax.lax.dynamic_update_slice(
                         build_rkv.v_scale, sels[3], idx4)}
        rkv_out = build_rkv.replace(k=rk, v=rv, **extra)
    return logits, kv_out, rkv_out


def forward_spec(cfg: ModelConfig, params, input_ids: jnp.ndarray,
                 rkv: RetrievalCache, kv_seq_len: jnp.ndarray,
                 budget: int, commit: bool = True, mesh=None,
                 act_quant: bool = False,
                 ) -> Tuple[jnp.ndarray, RetrievalCache]:
    """Middle-model verify: the gamma+1 tokens attend the budget region plus
    themselves (causally), and their KV lands in the scratch slots.
    reference: model_verify (graph_infer.py:61-67) -> spec=True attention
    (modeling_llama.py:226-227) + RetrievalCache.update (cache.py:184-189).
    Positions are absolute: ``kv_seq_len + arange(gamma + 1)``
    (decoding.py:180).
    """
    b, t = input_ids.shape
    cos, sin = rope.cos_sin_tables(cfg)
    positions = kv_seq_len + jnp.arange(t)
    scratch0 = jnp.asarray(budget, jnp.int32)  # real_budget - (gamma+1)
    # dead-row gate (serving): kv_seq_len == 0 marks a retired/blank slot
    # (SpecScheduler clears it), so its retrieval-budget read collapses to
    # ZERO columns — under vmap this is a per-row traced length the Pallas
    # kernel honors, turning idle-slot decode from a full budget stream
    # into a no-op. Live rows always have kv_seq_len >= their prefill.
    k_len = jnp.where(jnp.asarray(kv_seq_len, jnp.int32) > 0,
                      jnp.asarray(budget, jnp.int32), 0)

    x = jnp.take(params["embed"], input_ids, axis=0)

    # zero-copy layer addressing, meshless AND sharded (see forward_append)
    def body(x, xs):
        lp, li = xs
        h = _rms_norm(x, lp["ln_attn"], cfg.rms_norm_eps)
        q, k_new, v_new = _qkv(h, lp, cfg, aq=act_quant)
        q = rope.apply_rope(q, cos, sin, positions)
        k_new = rope.apply_rope(k_new, cos, sin, positions)
        if mesh is not None:
            # retrieval cache: heads over tp, sequence replicated — same
            # wrapper, no cross-shard collective (shard_seq=False)
            ctx = append_attention_sharded(
                mesh, q, rkv.k, rkv.v, k_new, v_new, k_len=k_len,
                k_scale=rkv.k_scale, v_scale=rkv.v_scale, shard_seq=False,
                layer=li)
        else:
            ctx = append_attention_auto(q, rkv.k, rkv.v, k_new, v_new,
                                        k_len=k_len, k_scale=rkv.k_scale,
                                        v_scale=rkv.v_scale, layer=li)
        x = x + _attn_out(ctx, lp, aq=act_quant)
        h = _rms_norm(x, lp["ln_mlp"], cfg.rms_norm_eps)
        x = x + _mlp(h, lp, aq=act_quant)
        return x, (k_new, v_new)

    xs_in = (params["layers"], jnp.arange(cfg.num_layers))
    x, (nk, nv) = jax.lax.scan(body, x, xs_in)
    if not commit:
        # full-width spec forwards recompute every scratch row from their
        # own inputs and the new-block attention covers them — persisting
        # the scratch is a dead write, and dropping it lets callers keep
        # rkv OUT of their loop carries (XLA double-buffers carried caches)
        return _logits(cfg, params, x, aq=act_quant), rkv
    return _logits(cfg, params, x, aq=act_quant), \
        _commit_cache(rkv, nk, nv, scratch0)


def forward_tree_spec(cfg: ModelConfig, params, input_ids: jnp.ndarray,
                      rkv: RetrievalCache, kv_seq_len: jnp.ndarray,
                      budget: int, depths, ancestor_mask, slot_start,
                      kv: Optional[KVCache] = None, ssl: int = 0,
                      mesh=None, shard_seq: bool = False,
                      staged_len: Optional[int] = None,
                      act_quant: bool = False,
                      ) -> Tuple[jnp.ndarray, RetrievalCache,
                                 Optional[KVCache]]:
    """Middle-model forward of one speculation-tree frontier over the tree
    retrieval cache.

    ``input_ids`` [1, T] are the frontier tokens (all of one grow level);
    their KV lands at STATIC scratch slots ``budget + slot_start .. + T``
    (the reference scatters by storage_ids, cache.py:456-463 — here level
    slots are consecutive in BFS order so the scatter is one static-offset
    write). ``depths`` is the static [T] node-depth vector (positions are
    ``kv_seq_len + depth``, SpecTree_TP.py:134); ``ancestor_mask`` the
    static [T, tree_size] ancestor rows of these nodes: a query sees the
    whole budget region, its already-written tree ancestors, and itself
    (tensor_op.py:230-272, TP_Attention_Tree_Retrieval).

    ``ssl`` (self-speculation layers): the first ``ssl`` layers attend the
    FULL cache (prefix + their tree ancestors) instead of the retrieval
    cache, and write their tree-node KV at full-cache slots
    ``kv_seq_len + slot_start ..`` — the reference's hybrid
    ``layer_compute_ssl`` path (TP_llama_tree.py:405-425,
    cache.py:320-331 ssl_update). Requires ``kv``; the outer verify later
    overwrites the same slots with identical values, so commit semantics
    are unchanged. Quantized caches supported throughout.
    """
    b, t = input_ids.shape
    cos, sin = rope.cos_sin_tables(cfg)
    positions = kv_seq_len + jnp.asarray(depths, jnp.int32)
    amask = jnp.asarray(ancestor_mask, bool)
    # static bound of the staged-tree window read by the fast meshless
    # path; defaults to slot_start when slot_start is a python int (the
    # unrolled-levels caller)
    if staged_len is None:
        assert isinstance(slot_start, int), \
            "traced slot_start requires an explicit static staged_len"
        staged_len = slot_start
    slot_start = jnp.asarray(slot_start, jnp.int32)  # may be TRACED (the
    # fori-over-levels grow drives every level through ONE compiled body)
    write0 = budget + slot_start
    k_len = budget + slot_start
    quant = rkv.quantized
    assert ssl == 0 or kv is not None, "ssl layers need the full cache"
    L = cfg.num_layers

    # cache part: budget region free, written tree slots per ancestor rows
    def mask_from(base):
        def fn(rows, cols):
            rel = cols - base
            in_tree = rel >= 0
            anc = amask[rows, jnp.clip(rel, 0, amask.shape[1] - 1)]
            return jnp.where(in_tree, anc, True)
        return fn

    # new part: frontier nodes are same-level — only self-attention
    new_mask = jnp.eye(t, dtype=bool)

    x = jnp.take(params["embed"], input_ids, axis=0)

    def make_body(base, bound, use_quant, seq_sharded=False):
        # sharded grow body: monolithic masked attention inside shard_map
        # (the decomposed fast form below would slice the staged tree block
        # across sp shard boundaries)
        def body(x, xs):
            lp, k_all, v_all, ks_all, vs_all = _unpack_xs(xs, use_quant)
            h = _rms_norm(x, lp["ln_attn"], cfg.rms_norm_eps)
            q, k_new, v_new = _qkv(h, lp, cfg, aq=act_quant)
            q = rope.apply_rope(q, cos, sin, positions)
            k_new = rope.apply_rope(k_new, cos, sin, positions)
            ctx = append_attention_sharded(
                mesh, q, k_all, v_all, k_new, v_new, k_len=bound,
                cache_mask_fn=mask_from(base), new_mask=new_mask,
                k_scale=ks_all, v_scale=vs_all, shard_seq=seq_sharded)
            x = x + _attn_out(ctx, lp, aq=act_quant)
            h = _rms_norm(x, lp["ln_mlp"], cfg.rms_norm_eps)
            x = x + _mlp(h, lp, aq=act_quant)
            return x, (k_new, v_new)
        return body

    def make_body_fast(cache, prefix_len, staged_start):
        # meshless grow body: fully-visible prefix (zero-copy stacked
        # partials, Pallas-eligible — grow level widths are <= 128) +
        # ancestor-masked staged tree block + same-level self block
        # (_tree_grow_attention); xs carry ABSOLUTE layer indices
        def body(x, xs):
            lp, li = xs
            h = _rms_norm(x, lp["ln_attn"], cfg.rms_norm_eps)
            q, k_new, v_new = _qkv(h, lp, cfg, aq=act_quant)
            q = rope.apply_rope(q, cos, sin, positions)
            k_new = rope.apply_rope(k_new, cos, sin, positions)
            ctx = _tree_grow_attention(cfg, q, cache, li, prefix_len,
                                       staged_start, slot_start, staged_len,
                                       amask, k_new, v_new, new_mask)
            x = x + _attn_out(ctx, lp, aq=act_quant)
            h = _rms_norm(x, lp["ln_mlp"], cfg.rms_norm_eps)
            x = x + _mlp(h, lp, aq=act_quant)
            return x, (k_new, v_new)
        return body

    def slice_layers(tree, lo, hi):
        return jax.tree.map(lambda a: a[lo:hi], tree)

    kv_out = kv
    if ssl > 0:
        # ssl layers: full-cache hybrid attention; committed tree nodes sit
        # at [kv_seq_len, kv_seq_len + slot_start)
        fq = kv.quantized
        if mesh is None:
            xs_ssl = (slice_layers(params["layers"], 0, ssl),
                      jnp.arange(ssl))
            x, (nk, nv) = jax.lax.scan(
                make_body_fast(kv, kv_seq_len, kv_seq_len), x, xs_ssl)
        else:
            xs_ssl = (slice_layers(params["layers"], 0, ssl),) + tuple(
                a[:ssl] for a in _cache_xs(kv))
            x, (nk, nv) = jax.lax.scan(
                make_body(kv_seq_len, kv_seq_len + slot_start, fq,
                          seq_sharded=shard_seq), x, xs_ssl)
        kv_out = _commit_partial(kv, nk, nv, kv_seq_len + slot_start,
                                 layer0=0)
    if ssl < L:
        if mesh is None:
            xs_r = (slice_layers(params["layers"], ssl, L),
                    jnp.arange(ssl, L))
            x, (nk, nv) = jax.lax.scan(
                make_body_fast(rkv, jnp.asarray(budget, jnp.int32),
                               jnp.asarray(budget, jnp.int32)), x, xs_r)
        else:
            xs_r = (slice_layers(params["layers"], ssl, L),) + tuple(
                a[ssl:] for a in _cache_xs(rkv))
            x, (nk, nv) = jax.lax.scan(make_body(budget, k_len, quant), x,
                                       xs_r)
        rkv = _commit_partial(rkv, nk, nv, write0, layer0=ssl)
    return _logits(cfg, params, x, aq=act_quant), rkv, kv_out



def _tree_grow_attention(cfg, q, cache, li, prefix_len, staged_start,
                         slot_start, staged_len: int, amask, k_new, v_new,
                         new_mask):
    """Meshless grow-level attention, decomposed (round 3):

      prefix   — slots [0, prefix_len): FULLY visible, so no mask_fn —
                 zero-copy stacked partials through the Pallas flash-decode
                 kernel when eligible (the masked monolithic form forced
                 the XLA partials path over the whole multi-GB buffer);
      staged   — a STATIC-size window [staged_start, +staged_len) over the
                 tree region; a column is visible iff already committed
                 (col < slot_start, which may be traced) and an ancestor
                 per the mask columns;
      self     — the frontier block (same-level nodes see only themselves).

    Exact same visibility set as the previous cache_mask_fn form
    (mask_from in the sharded branch), associatively merged partials.
    """
    from ..ops.attention import pallas_decode_eligible
    quant = cache.quantized
    b, hq, t, d = q.shape
    L, _, hkv, s = cache.k.shape[:4]
    g = hq // hkv
    gt = g * t

    use_pallas = pallas_decode_eligible(b, s, gt,
                                        warn_context="tree grow prefix")
    if use_pallas:
        from ..ops.flash_decode import (flash_decode_partials, _pick_block,
                                        _pick_qtile)
        block = _pick_block(s, hkv, d, gt, 0, quant=quant,
                            q_tile=_pick_qtile(gt))
        qh = q[0].reshape(hkv, gt, d)
        m, l, acc = flash_decode_partials(
            qh, cache.k[:, 0], cache.v[:, 0], prefix_len, block=block,
            k_scale=cache.k_scale[:, 0] if quant else None,
            v_scale=cache.v_scale[:, 0] if quant else None,
            layer=li)
        p = (m.reshape(b, hkv, g, t), l.reshape(b, hkv, g, t),
             acc.reshape(b, hkv, g, t, d))
    else:
        ly = jnp.asarray(li, jnp.int32)
        k_l = jnp.take(cache.k, ly, axis=0)
        v_l = jnp.take(cache.v, ly, axis=0)
        p = attention_partials(
            q, k_l, v_l, k_len=prefix_len,
            k_scale=jnp.take(cache.k_scale, ly, axis=0) if quant else None,
            v_scale=jnp.take(cache.v_scale, ly, axis=0) if quant else None)

    if staged_len > 0:
        # staged block of STATIC size staged_len starting at the tree
        # region's base; columns are visible iff they are committed
        # (col < slot_start, traced) AND tree ancestors (static mask cols)
        zero = jnp.zeros((), jnp.int32)
        st = jnp.asarray(staged_start, jnp.int32)
        idx = (jnp.asarray(li, jnp.int32), zero, zero, st, zero)
        ks = jax.lax.dynamic_slice(cache.k, idx, (1, b, hkv, staged_len, d))[0]
        vs = jax.lax.dynamic_slice(cache.v, idx, (1, b, hkv, staged_len, d))[0]
        if quant:
            idx4 = idx[:4]
            kss = jax.lax.dynamic_slice(cache.k_scale, idx4,
                                        (1, b, hkv, staged_len))[0]
            vss = jax.lax.dynamic_slice(cache.v_scale, idx4,
                                        (1, b, hkv, staged_len))[0]
            ks = (ks.astype(jnp.float32) * kss[..., None]).astype(q.dtype)
            vs = (vs.astype(jnp.float32) * vss[..., None]).astype(q.dtype)
        cols = jax.lax.broadcasted_iota(jnp.int32, (t, staged_len), 1)
        staged_mask = amask[:, :staged_len] & (cols < slot_start)
        p_staged = new_block_partials(q, ks, vs, staged_mask)
        p = merge_partials(p, p_staged)

    p_self = new_block_partials(q, k_new, v_new, new_mask)
    return finalize(merge_partials(p, p_self), q.dtype)


def _commit_partial(cache, new_k, new_v, start, layer0: int):
    """Commit an [Lsub, B, H, T, D] new-KV stack into layers
    [layer0, layer0 + Lsub) of a (possibly quantized) cache at slot
    ``start``."""
    zero = jnp.zeros((), jnp.int32)
    l0 = jnp.asarray(layer0, jnp.int32)
    idx = (l0, zero, zero, start.astype(jnp.int32), zero)
    if cache.quantized:
        k8, ks = quantize_tokens(new_k)
        v8, vs = quantize_tokens(new_v)
        ck = jax.lax.dynamic_update_slice(cache.k, k8, idx)
        cv = jax.lax.dynamic_update_slice(cache.v, v8, idx)
        idx4 = (l0, zero, zero, start.astype(jnp.int32))
        return cache.replace(
            k=ck, v=cv,
            k_scale=jax.lax.dynamic_update_slice(cache.k_scale, ks, idx4),
            v_scale=jax.lax.dynamic_update_slice(cache.v_scale, vs, idx4))
    return cache.replace(
        k=jax.lax.dynamic_update_slice(cache.k, new_k.astype(cache.k.dtype),
                                       idx),
        v=jax.lax.dynamic_update_slice(cache.v, new_v.astype(cache.v.dtype),
                                       idx))


# ---------------------------------------------------------------------------
# Drafter forwards (StreamingLLM semantics)
# ---------------------------------------------------------------------------

def draft_forward(cfg: ModelConfig, params, input_ids: jnp.ndarray,
                  dkv: StreamingCache) -> Tuple[jnp.ndarray, StreamingCache]:
    """Drafter prefill chunk: append at ``seq_len`` with slot positions.

    Keys stored un-rotated; the visible window is re-rotated with slot
    indices as positions each forward (modeling_llama_68m.py:164-178).
    Caller must run ``streaming_evict_prefill`` first (graph_infer.py:47).
    """
    assert cfg.rope_on_slots
    b, t = input_ids.shape
    cos, sin = rope.cos_sin_tables(cfg, max_len=dkv.real_budget)
    positions = dkv.seq_len + jnp.arange(t)  # slot == position here
    seq_len0 = dkv.seq_len
    slot_pos = jnp.arange(dkv.real_budget)

    x = jnp.take(params["embed"], input_ids, axis=0)

    def body(x, xs):
        lp, k_all, v_all = xs
        h = _rms_norm(x, lp["ln_attn"], cfg.rms_norm_eps)
        q, k_new, v_new = _qkv(h, lp, cfg)
        q = rope.apply_rope(q, cos, sin, positions)
        k_cache = rope.apply_rope(k_all, cos, sin, slot_pos)
        k_att = rope.apply_rope(k_new, cos, sin, positions)
        ctx = append_attention(q, k_cache, v_all, k_att, v_new,
                               k_len=seq_len0)
        x = x + _attn_out(ctx, lp)
        h = _rms_norm(x, lp["ln_mlp"], cfg.rms_norm_eps)
        x = x + _mlp(h, lp)
        return x, (k_new, v_new)

    x, (nk, nv) = jax.lax.scan(body, x, (params["layers"], dkv.k, dkv.v))
    ck, cv = _commit(dkv.k, dkv.v, nk, nv, seq_len0)
    return _logits(cfg, params, x), dkv.replace(
        k=ck, v=cv, seq_len=dkv.seq_len + t)


def draft_forward_spec(cfg: ModelConfig, params, input_ids: jnp.ndarray,
                       dkv: StreamingCache, spec: SpecConfig,
                       commit: bool = True,
                       ) -> Tuple[jnp.ndarray, StreamingCache]:
    """Drafter speculation step: T tokens written at the FIXED spec slots
    ``start + recent + i`` with query positions equal to those slot indices
    and keys re-rotated over the whole window.
    reference: modeling_llama_68m.py:151-162 + cache.py:237-245.

    The reference runs this at q_len = gamma_offset + 1 with one CUDA graph
    per offset (graph_infer.py:143-152); here T is fixed (= gamma + 1 in the
    inner loop, gamma + 3 for the replay) and causal masking makes the junk
    suffix inert — ONE compiled program replaces gamma + 3 graphs.
    """
    assert cfg.rope_on_slots
    b, t = input_ids.shape
    start, recent = spec.draft_start_size, spec.draft_recent_size
    spec0 = start + recent  # == real_budget - gamma - 3, cache.py:239
    cos, sin = rope.cos_sin_tables(cfg, max_len=dkv.real_budget)
    positions = spec0 + jnp.arange(t)
    slot_pos = jnp.arange(dkv.real_budget)
    spec0_arr = jnp.asarray(spec0, jnp.int32)

    x = jnp.take(params["embed"], input_ids, axis=0)

    def body(x, xs):
        lp, k_all, v_all = xs
        h = _rms_norm(x, lp["ln_attn"], cfg.rms_norm_eps)
        q, k_new, v_new = _qkv(h, lp, cfg)
        q = rope.apply_rope(q, cos, sin, positions)
        k_cache = rope.apply_rope(k_all, cos, sin, slot_pos)
        k_att = rope.apply_rope(k_new, cos, sin, positions)
        ctx = append_attention(q, k_cache, v_all, k_att, v_new,
                               k_len=spec0_arr)
        x = x + _attn_out(ctx, lp)
        h = _rms_norm(x, lp["ln_mlp"], cfg.rms_norm_eps)
        x = x + _mlp(h, lp)
        return x, (k_new, v_new)

    x, (nk, nv) = jax.lax.scan(body, x, (params["layers"], dkv.k, dkv.v))
    if not commit:
        return _logits(cfg, params, x), dkv
    ck, cv = _commit(dkv.k, dkv.v, nk, nv, spec0_arr)
    return _logits(cfg, params, x), dkv.replace(k=ck, v=cv)
