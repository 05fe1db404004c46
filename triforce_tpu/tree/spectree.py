"""Sequoia-style tree speculation on the retrieval-cache middle model.

TPU-native re-design of the reference's SpecTree
(``/root/reference/utils/SpecTree_TP.py`` + ``test/offloading_seqouia.py``):
the whole round — grow the token tree level by level through the middle model
(target weights over the tree retrieval cache), verify ALL tree nodes in one
full-cache target forward with the tree attention mask, walk the tree with
multi-child rejection sampling + residual updates, compact the accepted path
into the KV cache, refresh the retrieval tail — is ONE jitted XLA executable
per step. The grow map (tree shape, masks, depths, successor table) is static
compile-time data; child sampling is replicated Gumbel-top-k with shared PRNG
keys, which deletes the reference's rank-0 sample + 5 broadcasts + 4 barriers
per round (SpecTree_TP.py:205-224, offloading_seqouia.py:29-39).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from ..config import ModelConfig, SpecConfig
from ..cache import (KVCache, RetrievalCache, init_kv, init_tree_retrieval,
                     gather_kv_incremental, retrieval_tail_refresh)
from ..models import llama
from ..ops import sampling
from .planner import GrowMap

JUNK_TOKEN = 100
_NEG_INF = -1e30   # python float: a module-level jnp scalar would
# initialise the XLA backend at import, breaking jax.distributed
# bring-up (must run before any backend use) on multi-host


@struct.dataclass
class TreeState:
    kv: KVCache
    rkv: RetrievalCache   # budget + tree_size slots
    next_token: jax.Array  # [1]
    key: jax.Array


@struct.dataclass
class TreeStepStats:
    tokens: jax.Array      # [max_path + 1] emitted, junk-padded
    n_emitted: jax.Array
    n_nodes: jax.Array     # accepted path length incl. root
    terminal: jax.Array    # bool: EOS hit or zero residual
    eos: jax.Array


class TreeEngine:
    """Compiled programs for tree-speculative decoding of one target model.

    reference analogue: SpecTree + DistributedLlama_tree
    (SpecTree_TP.py:31-88, TP_llama_tree.py:405-425)."""

    def __init__(self, cfg: ModelConfig, grow_map: GrowMap, params, *,
                 prefill: int, max_cache_len: int, budget: int = 4096,
                 chunk_size: int = 8, temperature: float = 0.6,
                 top_p: float = 0.9, eos_ids=(0, 2), dtype=jnp.bfloat16,
                 prefill_chunk: int = 128, donate: bool = True,
                 kv_quant: bool = False, weight_quant: bool = False,
                 ssl: int = 0, mesh=None, shard_seq: bool = False):
        assert prefill % chunk_size == 0 and budget % chunk_size == 0
        assert 0 <= ssl <= cfg.num_layers
        self.cfg = cfg
        self.gm = grow_map
        self.prefill = prefill
        # DMA-friendly cache padding, same policy as Engine: the flash
        # kernel wants divisor-rich lengths (int8 scale planes need x128
        # lanes -> pad to 4096; bf16 does best around block 4000 on
        # 512-aligned lengths). Per-shard lengths must stay block-aligned.
        on_tpu = jax.default_backend() == "tpu"
        pad_unit = (4096 if kv_quant else 512) if on_tpu else 1
        if mesh is not None and shard_seq:
            pad_unit *= mesh.shape["sp"]
        # ssl hybrid grow commits PADDED-width level blocks into the full
        # cache at kv_seq_len + slot_start: reserve the padded grow width W
        # past the tree region so the last levels' fixed-width writes never
        # clamp back over committed KV (same hazard the rkv pad fixes)
        self._grow_pad = _padded_levels(grow_map)[0]
        max_cache_len += grow_map.size + self._grow_pad
        max_cache_len = -(-max_cache_len // pad_unit) * pad_unit
        self.max_cache_len = max_cache_len
        # tree retrieval cache: pad by W for the same clamp hazard, THEN
        # round the total to the Pallas alignment — an unaligned length
        # silently forfeits the kernel fast-prefix grow path (review r3)
        rkv_pad = self._grow_pad
        if on_tpu:
            rkv_pad += (-(budget + grow_map.size + rkv_pad)) % 512
        self._rkv_pad = rkv_pad
        self.budget = budget
        self.chunk_size = chunk_size
        self.temperature = temperature
        self.top_p = top_p
        self.dtype = dtype
        self.prefill_chunk = prefill_chunk
        self.kv_quant = kv_quant
        # ssl ("self-speculation layers"): during GROW, layers < ssl attend
        # the FULL cache instead of the tree retrieval cache — the
        # reference's hybrid attention (TP_llama_tree.py:405-425)
        self.ssl = ssl
        self.mesh = mesh
        self.shard_seq = shard_seq
        self.weight_quant = weight_quant
        if weight_quant:
            # int8 weight-only quantization (same policy as Engine): the
            # grow levels are weight-stream-bound like the middle loop
            params = llama.quantize_weights(params)
        if mesh is not None:
            from ..parallel import sharding as shard_mod
            params = shard_mod.shard_params(params, mesh, cfg)
        self.params = params

        def _dn(*idx):
            return idx if donate else ()

        def _prefill_t(params, ids, kv):
            return llama.forward_append(cfg, params, ids, kv, mesh=mesh,
                                        shard_seq=shard_seq)[:2]
        self._prefill_t = jax.jit(_prefill_t, donate_argnums=_dn(2))

        def _prefill_scan(params, chunks, kv):
            # all full chunks in ONE dispatch (a host loop pays a dispatch
            # round trip per chunk — ~60 ms each through a remote tunnel).
            # Wide chunks re-materialise the int8->bf16 weight convert per
            # matmul: dequantize ONCE before the scan (exact, see
            # llama.dequant_weights)
            params = llama.dequant_weights(params, dtype)

            def sbody(kv, ids):
                _, kv, _ = llama.forward_append(cfg, params, ids, kv,
                                                need_logits=False, mesh=mesh,
                                                shard_seq=shard_seq)
                return kv, None
            kv, _ = jax.lax.scan(sbody, kv, chunks)
            return kv
        self._prefill_scan = jax.jit(_prefill_scan, donate_argnums=_dn(2))

        def _build(params, ids, kv, rkv):
            return llama.forward_append(
                cfg, params, ids, kv, build_rkv=rkv, prefill=prefill,
                chunk_size=chunk_size, budget=budget, mesh=mesh,
                shard_seq=shard_seq)
        self._build = jax.jit(_build, donate_argnums=_dn(2, 3))

        aq = weight_quant   # grow levels run int8 x int8 on the MXU
        # (llama._wmm aq path) — no per-matmul int8->bf16 weight convert
        # and no dequant-hoist double residency (VERDICT r3 item 2); the
        # tree VERIFY keeps the exact weight-only path.

        def _step_prog(params, state):
            return _tree_step(cfg, grow_map, budget, prefill, temperature,
                              top_p, tuple(eos_ids), ssl, mesh, shard_seq,
                              params, state, act_quant=aq)
        self._step = jax.jit(_step_prog, donate_argnums=_dn(1))

        max_path = int(grow_map.depth.max()) + 1

        def _gen(max_len, params, state):
            """Whole tree generation as one dispatch (lax.while_loop)."""
            buf = jnp.full((max_len + max_path + 1,), JUNK_TOKEN, jnp.int32)
            buf = buf.at[0].set(state.next_token[0])

            def cond(c):
                state, buf, n, counters, stop = c
                return (n < max_len + 1) & ~stop

            def body(c):
                state, buf, n, counters, stop = c
                state, stats = _tree_step(cfg, grow_map, budget, prefill,
                                          temperature, top_p,
                                          tuple(eos_ids), ssl, mesh,
                                          shard_seq, params, state,
                                          act_quant=aq)
                buf = jax.lax.dynamic_update_slice(buf, stats.tokens, (n,))
                n = n + stats.n_emitted
                counters = counters + jnp.stack(
                    [jnp.int32(1), stats.n_nodes])
                return state, buf, n, counters, stats.terminal

            return jax.lax.while_loop(
                cond, body, (state, buf, jnp.int32(1),
                             jnp.zeros((2,), jnp.int32), jnp.bool_(False)))

        self._gen = jax.jit(_gen, static_argnums=(0,), donate_argnums=_dn(2))

        def _gen_forced(max_len, alpha, params, state):
            """Forced-acceptance generation (one dispatch; alpha TRACED so
            every alpha shares one compiled program)."""
            buf = jnp.full((max_len + max_path + 1,), JUNK_TOKEN, jnp.int32)
            buf = buf.at[0].set(state.next_token[0])

            def cond(c):
                state, buf, n, counters, stop = c
                return (n < max_len + 1) & ~stop

            def body(c):
                state, buf, n, counters, stop = c
                state, stats = _tree_step(cfg, grow_map, budget, prefill,
                                          temperature, top_p,
                                          tuple(eos_ids), ssl, mesh,
                                          shard_seq, params, state,
                                          force_accept=alpha, act_quant=aq)
                buf = jax.lax.dynamic_update_slice(buf, stats.tokens, (n,))
                n = n + stats.n_emitted
                counters = counters + jnp.stack(
                    [jnp.int32(1), stats.n_nodes])
                # forced runs never stop on the synthetic terminal flag:
                # the coin walk can zero the residual by chance, which
                # would end the throughput measurement early
                return state, buf, n, counters, jnp.bool_(False)

            return jax.lax.while_loop(
                cond, body, (state, buf, jnp.int32(1),
                             jnp.zeros((2,), jnp.int32), jnp.bool_(False)))

        self._gen_forced = jax.jit(_gen_forced, static_argnums=(0,),
                                   donate_argnums=_dn(3))

    def generate(self, state: TreeState, max_len: int):
        """Returns (state, token_buf, n, counters=[steps, nodes], stop)."""
        return self._gen(max_len, self.params, state)

    def generate_forced(self, state: TreeState, max_len: int, alpha: float):
        """Controlled-acceptance tree generation (see _tree_step): every
        per-child accept test is a coin at rate ``alpha``; all real compute
        runs. Returns the same tuple as :meth:`generate`."""
        return self._gen_forced(max_len, jnp.float32(alpha), self.params,
                                state)

    def init_state(self, key: jax.Array) -> TreeState:
        kv = init_kv(self.cfg, self.max_cache_len, dtype=self.dtype,
                     quant=self.kv_quant)
        # pad the tree region by the padded grow width (fixed-width level
        # writes must never clamp back over committed tree slots) and to
        # the kernel's 512-alignment (see __init__)
        rkv = init_tree_retrieval(self.cfg, self.budget, self.gm.size,
                                  dtype=self.dtype, quant=self.kv_quant,
                                  pad=self._rkv_pad)
        state = TreeState(kv=kv, rkv=rkv,
                          next_token=jnp.zeros((1,), jnp.int32), key=key)
        if self.mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P
            from ..parallel import sharding as shard_mod
            full = shard_mod.kv_shardings(self.mesh, self.cfg,
                                          shard_seq=self.shard_seq)
            rshard = shard_mod.kv_shardings(self.mesh, self.cfg,
                                            shard_seq=False)
            rep = NamedSharding(self.mesh, P())
            kv_extra = rkv_extra = {}
            if self.kv_quant:
                kv_extra = {"k_scale": shard_mod.scale_shardings(
                                self.mesh, self.cfg, self.shard_seq),
                            "v_scale": shard_mod.scale_shardings(
                                self.mesh, self.cfg, self.shard_seq)}
                rs = shard_mod.scale_shardings(self.mesh, self.cfg, False)
                rkv_extra = {"k_scale": rs, "v_scale": rs}
            sh = TreeState(
                kv=KVCache(k=full, v=full, seq_len=rep, **kv_extra),
                rkv=RetrievalCache(k=rshard, v=rshard, **rkv_extra),
                next_token=rep, key=rep)
            state = jax.device_put(state, sh)
        return state

    def prefill_target(self, state: TreeState, input_ids) -> TreeState:
        """Chunked prefill + retrieval build + root sample
        (SpecTree_TP.py:91-100)."""
        assert input_ids.shape[1] == self.prefill
        kv, rkv = state.kv, state.rkv
        body, c = input_ids[:, :-1], self.prefill_chunk
        n_full = body.shape[1] // c
        if n_full:
            chunks = body[:, :n_full * c].reshape(1, n_full, c).transpose(
                1, 0, 2)
            kv = self._prefill_scan(self.params, chunks, kv)
        rem = body.shape[1] - n_full * c
        if rem:
            _, kv = self._prefill_t(self.params, body[:, -rem:], kv)
        logits, kv, rkv = self._build(self.params, input_ids[:, -1:], kv, rkv)
        probs = sampling.norm_logits(logits[:, -1], self.temperature, -1,
                                     self.top_p)
        key, ks = jax.random.split(state.key)
        next_token = sampling.sample(ks, probs).astype(jnp.int32)
        return state.replace(kv=kv, rkv=rkv, next_token=next_token, key=key)

    def step(self, state: TreeState) -> Tuple[TreeState, TreeStepStats]:
        return self._step(self.params, state)


def _padded_levels(gm: GrowMap):
    """Pad every grow level to ONE static width so the whole grow phase is
    a single compiled ``fori_loop`` body (r3: 23 distinct unrolled level
    programs made the tree executable too large to serialize — 6.6 GB of
    compiler metadata — and grow is weight-stream-bound, so padding the
    level width costs ~nothing on TPU). Returns numpy tables
    (W, K, roots [n,R], widths [n], starts [n], tok_root [n,W],
    tok_rank [n,W], depth_rows [n,W], mask_rows [n,W,size])."""
    n = gm.num_levels
    W = max(int(sum(b)) for b in gm.branches)
    R = max(len(r) for r in gm.roots)
    K = max(max(int(x) for x in b) for b in gm.branches if len(b))
    roots = np.zeros((n, R), np.int32)
    widths = np.zeros((n,), np.int32)
    starts = np.zeros((n,), np.int32)
    tok_root = np.zeros((n, W), np.int32)
    tok_rank = np.zeros((n, W), np.int32)
    depth_rows = np.zeros((n, W), np.int32)
    mask_rows = np.zeros((n, W, gm.size), bool)
    start = 1
    for lvl, (rts, brs) in enumerate(zip(gm.roots, gm.branches)):
        w = int(sum(brs))
        widths[lvl], starts[lvl] = w, start
        roots[lvl, :len(rts)] = np.asarray(rts, np.int32)
        j = 0
        for ri, br in enumerate(brs):
            for rk in range(int(br)):
                tok_root[lvl, j], tok_rank[lvl, j] = ri, rk
                j += 1
        depth_rows[lvl, :w] = gm.depth[start:start + w]
        mask_rows[lvl, :w] = gm.mask[start:start + w]
        start += w
    return W, K, roots, widths, starts, tok_root, tok_rank, depth_rows, \
        mask_rows


def _grow(cfg: ModelConfig, gm: GrowMap, budget: int, temp: float,
          ssl: int, mesh, shard_seq, params, state: TreeState,
          act_quant: bool = False):
    """Build the token tree through the middle model
    (reference construct_grow_map / collective_grow_static,
    SpecTree_TP.py:103-144). Layers < ssl attend the full cache (hybrid
    attention, TP_llama_tree.py:405-425) and stage their tree-node KV in
    it.

    All levels run through ONE ``fori_loop`` body at a padded static width
    (``_padded_levels``): per level, per-root Gumbel-top-k samples children
    WITHOUT replacement from softmax(draft_logits / T) — replicated, keyed,
    no broadcast (reference: offloading_seqouia.py:29-39 rank-0 + bcast) —
    then one middle forward of the padded frontier. Padded slots carry junk
    tokens whose KV lands in scratch that later REAL levels overwrite and
    whose attention columns stay masked (col < slot_start)."""
    vocab = cfg.vocab_size
    size = gm.size
    kv_seq_len = state.kv.seq_len
    key = state.key
    kv = state.kv

    W, K, roots, widths, starts, tok_root, tok_rank, depth_rows, mask_rows \
        = _padded_levels(gm)
    n_levels = len(widths)
    roots_c = jnp.asarray(roots)
    widths_c = jnp.asarray(widths)
    starts_c = jnp.asarray(starts)
    tok_root_c = jnp.asarray(tok_root)
    tok_rank_c = jnp.asarray(tok_rank)
    depth_c = jnp.asarray(depth_rows)
    mask_c = jnp.asarray(mask_rows)

    # buffers padded by W: the LAST level's padded write overhangs [size,
    # size + W) and is sliced off
    verify_tokens = jnp.full((size + W,), JUNK_TOKEN, jnp.int32)
    verify_tokens = verify_tokens.at[0].set(state.next_token[0])
    draft_logits = jnp.zeros((size + W, vocab), jnp.float32)

    logits, rkv, kv = llama.forward_tree_spec(
        cfg, params, state.next_token[None], state.rkv, kv_seq_len, budget,
        depths=gm.depth[0:1], ancestor_mask=gm.mask[0:1], slot_start=0,
        kv=kv, ssl=ssl, mesh=mesh, shard_seq=shard_seq,
        act_quant=act_quant)
    draft_logits = draft_logits.at[0].set(logits[0, 0].astype(jnp.float32))

    def body(lvl, c):
        verify_tokens, draft_logits, rkv, kv, key = c
        key, kg = jax.random.split(key)
        root_logits = draft_logits[roots_c[lvl]] / temp        # [R, V]
        g = jax.random.gumbel(kg, root_logits.shape, jnp.float32)
        # K argmax passes, NOT lax.top_k: top_k sorts the whole vocab on
        # TPU (~half the measured grow-level cost at [78, 32000])
        cand = sampling.topk_small(root_logits + g, K)         # [R, K]
        toks = cand[tok_root_c[lvl], tok_rank_c[lvl]]          # [W]
        live = jnp.arange(W) < widths_c[lvl]
        toks = jnp.where(live, toks.astype(jnp.int32),
                         jnp.int32(JUNK_TOKEN))
        start = starts_c[lvl]
        verify_tokens = jax.lax.dynamic_update_slice(verify_tokens, toks,
                                                     (start,))
        logits, rkv, kv = llama.forward_tree_spec(
            cfg, params, toks[None], rkv, kv_seq_len, budget,
            depths=depth_c[lvl], ancestor_mask=mask_c[lvl],
            slot_start=start, kv=kv, ssl=ssl, mesh=mesh,
            shard_seq=shard_seq, staged_len=size, act_quant=act_quant)
        draft_logits = jax.lax.dynamic_update_slice(
            draft_logits, logits[0].astype(jnp.float32),
            (start, jnp.int32(0)))
        return verify_tokens, draft_logits, rkv, kv, key

    verify_tokens, draft_logits, rkv, kv, key = jax.lax.fori_loop(
        0, n_levels, body,
        (verify_tokens, draft_logits, rkv, kv, key))

    return verify_tokens[:size], draft_logits[:size], rkv, kv, key


def _tree_step(cfg: ModelConfig, gm: GrowMap, budget: int, prefill: int,
               temp: float, top_p: float, eos_ids, ssl, mesh, shard_seq,
               params, state: TreeState, force_accept=None,
               act_quant: bool = False):
    """One full tree round: grow -> verify -> accept walk -> commit.
    reference: SpecTree.construct_grow_map + verify (SpecTree_TP.py:103-236).

    ``force_accept`` (traced scalar or None): controlled-acceptance
    validation — every per-child accept test in the walk becomes a coin
    flip at that rate while ALL real compute runs (grow levels, full-cache
    tree verify, residual updates, path compaction, tail refresh). Same
    methodology as ``Engine.generate_forced``: random weights cannot
    express trained-model acceptance, so this measures end-to-end tree
    throughput at a chosen per-test rate. Output is NOT lossless.
    """
    verify_tokens, draft_logits, rkv, kv_grown, key = _grow(
        cfg, gm, budget, temp, ssl, mesh, shard_seq, params, state,
        act_quant=act_quant)
    state = state.replace(kv=kv_grown)
    seq0 = state.kv.seq_len
    depth_c = jnp.asarray(gm.depth, jnp.int32)
    succ_c = jnp.asarray(gm.successors, jnp.int32)
    max_c = gm.max_children
    max_path = int(gm.depth.max()) + 1

    # --- ONE full-cache verify over all tree nodes (SpecTree_TP.py:168-175)
    logits_t, kv, _ = llama.forward_append(
        cfg, params, verify_tokens[None], state.kv,
        positions=seq0 + depth_c, tree_mask=gm.mask, mesh=mesh,
        shard_seq=shard_seq)
    p_all = sampling.norm_logits(logits_t[0], temp, -1, top_p)  # [size, V]

    # --- accept walk with residual updates (SpecTree_TP.py:147-165,177-203)
    def child_loop(p, dl, cur, key):
        kids = succ_c[cur]

        def body(j, c):
            p, dl, chosen, key = c
            child = kids[j]
            live = (child >= 0) & (chosen < 0)
            tok = verify_tokens[jnp.maximum(child, 0)]
            q = jax.nn.softmax(dl / temp)
            key, kr = jax.random.split(key)
            r = jax.random.uniform(kr)
            if force_accept is None:
                ok = live & (p[tok] > r * q[tok])
            else:
                ok = live & (r < force_accept)
            rej = live & ~ok
            chosen = jnp.where(ok, child, chosen)
            p = jnp.where(rej, sampling.max_fn(p - q), p)
            dl = jnp.where(rej, dl.at[tok].set(_NEG_INF), dl)
            return p, dl, chosen, key

        return jax.lax.fori_loop(
            0, max_c, body, (p, dl, jnp.int32(-1), key))

    def cond(c):
        return ~c[4]

    def walk(c):
        cur, n_nodes, accept_idx, key, done, eos_hit, final_p = c
        p, dl, chosen, key = child_loop(p_all[cur], draft_logits[cur], cur,
                                        key)
        accepted = chosen >= 0
        tok_ch = verify_tokens[jnp.maximum(chosen, 0)]
        eos = accepted & jnp.any(tok_ch == jnp.asarray(eos_ids, jnp.int32))
        accept_idx = accept_idx.at[n_nodes].set(
            jnp.where(accepted, chosen, accept_idx[n_nodes]))
        n_nodes = n_nodes + accepted.astype(jnp.int32)
        done = ~accepted | eos
        final_p = jnp.where(accepted, final_p, p)
        return (jnp.where(accepted, chosen, cur), n_nodes, accept_idx, key,
                done, eos_hit | eos, final_p)

    init = (jnp.int32(0), jnp.int32(1), jnp.zeros((max_path,), jnp.int32),
            key, jnp.bool_(False), jnp.bool_(False),
            jnp.zeros((cfg.vocab_size,), jnp.float32))
    cur, n_nodes, accept_idx, key, _, eos_hit, final_p = jax.lax.while_loop(
        cond, walk, init)

    # residual / bonus sample (SpecTree_TP.py:197-203)
    zero_res = jnp.sum(final_p) <= 0
    no_final = eos_hit | zero_res        # walk ended: nothing to sample
    key, ks = jax.random.split(key)
    next_tok = jnp.where(no_final, jnp.int32(JUNK_TOKEN),
                         sampling.sample(ks, final_p).astype(jnp.int32))
    # the residual/bonus sample can itself be EOS — it is still emitted
    # (the reference emits, then breaks), but the loop must stop on it
    res_eos = ~no_final & jnp.any(
        next_tok == jnp.asarray(eos_ids, jnp.int32))
    eos_hit = eos_hit | res_eos
    terminal = no_final | res_eos

    # --- commit: compact accepted path + retrieval tail refresh ----------
    kv = gather_kv_incremental(kv, accept_idx, n_nodes, seq0, max_path,
                               max_span=gm.size)
    spec_like = SpecConfig(budget=budget, chunk_size=1)
    rkv = retrieval_tail_refresh(rkv, kv, spec_like, prefill, seq0,
                                 max_new=max_path)

    # --- emitted tokens: accepted children then the sampled token --------
    pos = jnp.arange(max_path + 1)
    acc_toks = verify_tokens[accept_idx[jnp.minimum(pos + 1, max_path - 1)]]
    emitted = jnp.where(
        pos < n_nodes - 1, acc_toks,
        jnp.where((pos == n_nodes - 1) & ~no_final, next_tok, JUNK_TOKEN))
    n_emitted = n_nodes - 1 + (~no_final).astype(jnp.int32)

    new_state = state.replace(kv=kv, rkv=rkv, next_token=next_tok[None],
                              key=key)
    stats = TreeStepStats(tokens=emitted, n_emitted=n_emitted,
                          n_nodes=n_nodes, terminal=terminal, eos=eos_hit)
    return new_state, stats



def tree_decode(engine: TreeEngine, input_ids, max_len: int = 256,
                seed: int = 0):
    """Host driver (reference loop: offloading_seqouia.py:148-208)."""
    import time
    from ..decoding import DecodeResult

    state = engine.init_state(jax.random.PRNGKey(seed))
    state = engine.prefill_target(state, input_ids)
    first = int(state.next_token[0])  # readback: prefill complete
    t0 = time.perf_counter()
    state, buf, n, counters, _ = engine.generate(state, max_len)
    n = int(n)
    counters = np.asarray(counters)
    t1 = time.perf_counter()
    out = np.asarray(buf)[:n].tolist()
    assert out[0] == first
    steps, nodes = int(counters[0]), int(counters[1])
    gen = n - 1
    return DecodeResult(tokens=out, tokens_per_sec=gen / max(t1 - t0, 1e-9),
                        acceptance_rate=nodes / max(steps * engine.gm.size, 1),
                        avg_tokens_per_step=gen / max(steps, 1),
                        steps=steps, wall_s=t1 - t0)
