"""Execution engine: jit-compiled static-shape decode programs.

TPU-native replacement for the reference's CUDA-graph layer
(``/root/reference/utils/graph_infer.py``). Where the reference captures
gamma+3 drafter graphs + 1 verify graph and replays them from a host loop
with ``.item()`` round-trips per token (decoding.py:183-193), here the WHOLE
hierarchy round — drafter<->middle speculation loop, full-cache target
verify, exact rejection sampling, cache rollback, retrieval tail refresh and
drafter window compaction — is ONE jitted XLA executable
(``Engine.triforce_step``). Sampling is key-threaded on device, so there are
zero host<->device synchronisations inside a step and zero cross-host
broadcasts (replicated program + shared key replaces the reference's rank-0
broadcast/barrier per token, decoding.py:230-239).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from flax import struct

from .config import ModelConfig, SpecConfig
from .cache import (KVCache, RetrievalCache, StreamingCache, init_kv,
                    init_retrieval, init_streaming, streaming_evict_prefill,
                    streaming_evict_for_spec, retrieval_tail_refresh)
from .models import llama
from .ops import sampling

JUNK_TOKEN = 100  # reference pads spec buffers with token id 100


def _as_eos_tuple(eos_token_id) -> tuple:
    """Normalize an EOS spec to a static tuple of ids. The reference's tree
    path stops on BOTH token 0 and 2 (utils/SpecTree_TP.py:181) while its
    flat path uses one id (utils/decoding.py:107-121); accepting a tuple
    everywhere removes that asymmetry."""
    if isinstance(eos_token_id, (tuple, list)):
        return tuple(int(e) for e in eos_token_id)
    return (int(eos_token_id),)


def _is_eos(tok, eos_ids: tuple):
    """Elementwise membership of ``tok`` in the static EOS id tuple."""
    m = tok == eos_ids[0]
    for e in eos_ids[1:]:
        m = m | (tok == e)
    return m


@struct.dataclass
class TriForceState:
    """All mutable decode state, threaded through jitted steps."""
    kv: KVCache            # target full cache
    rkv: RetrievalCache    # target retrieval cache
    dkv: StreamingCache    # drafter StreamingLLM cache
    next_token: jax.Array  # [B] last sampled token (not yet in kv)
    key: jax.Array         # PRNG key


@struct.dataclass
class StepStats:
    """Per-step outputs (device scalars; host accumulates)."""
    tokens: jax.Array         # [gamma + 2] emitted tokens, junk-padded
    n_emitted: jax.Array      # count_acc + resampled + bonus
    gamma2: jax.Array         # middle tokens proposed to the target
    accepted: jax.Array       # outer accepts
    resampled: jax.Array      # 1 if outer rejection resampled
    bonus: jax.Array          # 1 if all-accepted bonus sampled
    eos: jax.Array            # bool: EOS emitted this step
    mid_draft: jax.Array      # drafter proposals in the middle loop
    mid_accept: jax.Array     # drafter proposals the middle accepted
    mid_verify: jax.Array     # middle (retrieval-cache) verify forwards run
    # (incl. dead fixed-trip rounds — those stream WEIGHTS only: their
    # retrieval-cache read is gated to zero columns, see _middle_spec)
    mid_live: jax.Array       # middle verifies that streamed the rkv
    # (live trips: n0 < gamma at trip start — for exact byte accounting)


class Engine:
    """Holds params + compiled programs for one (target, drafter) pair.

    reference analogue: GraphInferenceEngine (graph_infer.py:129-194).
    """

    def __init__(self, target_cfg: ModelConfig, spec: SpecConfig,
                 target_params, *, draft_cfg: Optional[ModelConfig] = None,
                 draft_params=None, prefill: int, max_cache_len: int,
                 eos_token_id: int = 2, dtype=jnp.bfloat16,
                 prefill_chunk: int = 512, draft_prefill_chunk: int = 64,
                 batch: int = 1, donate: bool = True,
                 kv_quant: bool = False, weight_quant: bool = False,
                 mesh=None, shard_seq: bool = False, cache_pad: int = None):
        assert prefill % spec.chunk_size == 0
        # align caches to the Pallas DMA blocks (flash_decode._pick_block):
        # the quantized path needs lane-divisible (x128) blocks that divide
        # the cache length -> pad to 4096; bf16 does best at block 4000 on
        # 512-aligned lengths (measured: 4000 ~ 396 GB/s on v5e).
        # ``cache_pad`` overrides (memory-tight many-row pools: a 512-pad
        # length like 16896 = 2^9*3*11 still has a 2112-row 128-multiple
        # divisor, so the quantized kernel keeps a fat DMA block while the
        # cache stays ~17% smaller per row than the 4096-pad)
        on_tpu = jax.default_backend() == "tpu"
        self.cache_pad = cache_pad or (
            (4096 if kv_quant else 512) if on_tpu else 1)
        self.rkv_pad = 512 if on_tpu else 1
        # sequence-sharded caches must divide over sp AND keep each LOCAL
        # shard DMA-block-aligned, so the pad unit is cache_pad * sp
        pad_unit = self.cache_pad
        if mesh is not None and shard_seq:
            pad_unit *= mesh.shape["sp"]
        max_cache_len = -(-max_cache_len // pad_unit) * pad_unit
        self.target_cfg = target_cfg
        self.draft_cfg = draft_cfg
        self.spec = spec
        self.prefill = prefill
        self.max_cache_len = max_cache_len
        # int OR tuple of ids (static): every EOS test ORs over the tuple,
        # matching TreeEngine (the reference checks 0 AND 2 in tree mode)
        eos_token_id = _as_eos_tuple(eos_token_id)
        self.eos_token_id = eos_token_id
        self.dtype = dtype
        self.prefill_chunk = prefill_chunk
        # eviction keeps recent - chunk tokens, so the chunk cannot exceed
        # the recent window (reference uses 64 vs recent 250,
        # graph_infer.py:47)
        self.draft_prefill_chunk = min(draft_prefill_chunk,
                                       spec.draft_recent_size)
        self.batch = batch
        self.kv_quant = kv_quant
        # mesh: every full-cache / retrieval attention routes through
        # shard_map (ops/sp_attention.py) — heads over tp, and (shard_seq)
        # the full cache's sequence axis over sp. The drafter stays
        # replicated (the reference replicates its 68M drafter on every rank
        # too, TP_llama.py draft path).
        self.mesh = mesh
        self.shard_seq = shard_seq
        self.weight_quant = weight_quant
        if weight_quant:
            # int8 weight-only quantization, per-channel scales applied on
            # matmul outputs (llama._wmm). The TARGET matters most, but at
            # middle_chain=k the drafter streams its weights k times per
            # step (~1.2 ms at k=6, bf16 68M-proxy) — quantize it too; the
            # drafter is only a proposal distribution, so losslessness is
            # untouched
            target_params = llama.quantize_weights(target_params)
            if draft_params is not None:
                draft_params = llama.quantize_weights(draft_params)
        if mesh is not None:
            from .parallel import sharding as shard_mod
            from jax.sharding import NamedSharding, PartitionSpec
            target_params = shard_mod.shard_params(target_params, mesh,
                                                   target_cfg)
            if draft_params is not None:
                draft_params = jax.device_put(
                    draft_params, NamedSharding(mesh, PartitionSpec()))
        self.t_params = target_params
        self.d_params = draft_params

        def _dn(*idx):
            return idx if donate else ()
        self._donate = donate

        cfg, sp = target_cfg, spec

        # --- prefill chunk (target): append T tokens, return logits -------
        def _prefill_t(params, ids, kv):
            return llama.forward_append(cfg, params, ids, kv, mesh=mesh,
                                        shard_seq=shard_seq)[:2]
        self._prefill_t = jax.jit(_prefill_t, donate_argnums=_dn(2))

        # --- last prefill token: append + build retrieval cache -----------
        def _build(params, ids, kv, rkv):
            logits, kv, rkv = llama.forward_append(
                cfg, params, ids, kv, build_rkv=rkv, prefill=self.prefill,
                chunk_size=sp.chunk_size, budget=sp.budget, mesh=mesh,
                shard_seq=shard_seq)
            return logits, kv, rkv
        self._build = jax.jit(_build, donate_argnums=_dn(2, 3))

        # --- AR decode step (baseline) -------------------------------------
        def _ar_step(params, kv, token, key):
            logits, kv, _ = llama.forward_append(cfg, params,
                                                 token[:, None], kv,
                                                 mesh=mesh,
                                                 shard_seq=shard_seq)
            probs = sampling.norm_logits(logits[:, -1], sp.temperature,
                                         sp.top_k, sp.top_p)
            key, k2 = jax.random.split(key)
            return sampling.sample(k2, probs), kv, key
        self._ar_step = jax.jit(_ar_step, donate_argnums=_dn(1))

        # --- drafter prefill chunk ------------------------------------------
        if draft_cfg is not None:
            dcfg = draft_cfg

            def _prefill_d_scan(params, chunks, dkv):
                def sbody(dkv, ids):
                    dkv = streaming_evict_prefill(dkv, sp,
                                                  self.draft_prefill_chunk)
                    _, dkv = llama.draft_forward(dcfg, params, ids, dkv)
                    return dkv, None
                dkv, _ = jax.lax.scan(sbody, dkv, chunks)
                return dkv
            self._prefill_d_scan = jax.jit(_prefill_d_scan,
                                           donate_argnums=_dn(2))
            # ragged-remainder forward: ONE stable jit object (re-traces per
            # new remainder shape, but compiled executables are cached — a
            # fresh jax.jit per call would recompile every invocation)
            self._prefill_d_rem = jax.jit(
                functools.partial(llama.draft_forward, dcfg),
                donate_argnums=_dn(2))

        self._triforce_step = jax.jit(
            functools.partial(_triforce_step, cfg, draft_cfg, sp,
                              self.prefill, eos_token_id, mesh, shard_seq),
            donate_argnums=_dn(2))
        self._retrieval_spec_step = jax.jit(
            functools.partial(_retrieval_spec_step, cfg, sp, self.prefill,
                              eos_token_id, mesh, shard_seq),
            donate_argnums=_dn(1))

        # --- whole-prefill scan: one XLA program for all full chunks -------
        def _prefill_scan(params, chunks, kv):
            # wide prefill chunks re-materialise the int8->bf16 weight
            # convert per matmul; one exact pre-conversion serves the whole
            # scan (llama.dequant_weights). Decode programs keep the fused
            # int8 path — narrow forwards are weight-READ-bound
            params = llama.dequant_weights(params, dtype)

            def sbody(kv, ids):
                _, kv, _ = llama.forward_append(cfg, params, ids, kv,
                                                need_logits=False,
                                                mesh=mesh,
                                                shard_seq=shard_seq)
                return kv, None
            kv, _ = jax.lax.scan(sbody, kv, chunks)
            return kv
        self._prefill_scan = jax.jit(_prefill_scan, donate_argnums=_dn(2))

        # --- whole-generation loops: ONE dispatch per generation -----------
        # (the host-side per-step loop pays a tunnel/dispatch round trip per
        # step; the device-side lax.while_loop pays zero — the CUDA-graph
        # idea taken to its limit)
        def _gen(step_fn, max_len, stop_on_eos, slack, *args):
            state = args[-1]
            buf = jnp.full((max_len + slack,), JUNK_TOKEN, jnp.int32)
            buf = buf.at[0].set(state.next_token[0])
            counters0 = jnp.zeros((9,), jnp.int32)

            def cond(c):
                state, buf, n, counters, stop = c
                return (n < max_len + 1) & ~stop

            def body(c):
                state, buf, n, counters, stop = c
                state, stats = step_fn(*args[:-1], state)
                buf = jax.lax.dynamic_update_slice(buf, stats.tokens, (n,))
                n = n + stats.n_emitted
                counters = counters + jnp.stack([
                    jnp.int32(1), stats.accepted, stats.gamma2,
                    stats.resampled, stats.bonus, stats.mid_draft,
                    stats.mid_accept, stats.mid_verify, stats.mid_live])
                stop = stats.eos if stop_on_eos else jnp.bool_(False)
                return state, buf, n, counters, stop

            return jax.lax.while_loop(
                cond, body,
                (state, buf, jnp.int32(1), counters0, jnp.bool_(False)))

        def _gen_triforce(max_len, stop_on_eos, t_params, d_params, state):
            return _gen(functools.partial(_triforce_step, cfg, draft_cfg, sp,
                                          self.prefill, eos_token_id, mesh,
                                          shard_seq),
                        max_len, stop_on_eos, sp.gamma + 2,
                        t_params, d_params, state)

        def _gen_retrieval(max_len, stop_on_eos, t_params, state):
            return _gen(functools.partial(_retrieval_spec_step, cfg, sp,
                                          self.prefill, eos_token_id, mesh,
                                          shard_seq),
                        max_len, stop_on_eos, sp.gamma + 2,
                        t_params, state)

        def _gen_ar(max_len, params, kv, token, key):
            buf = jnp.full((max_len,), JUNK_TOKEN, jnp.int32)

            def body(i, c):
                kv, token, key, buf = c
                logits, kv, _ = llama.forward_append(cfg, params,
                                                     token[:, None], kv,
                                                     mesh=mesh,
                                                     shard_seq=shard_seq)
                probs = sampling.norm_logits(logits[:, -1], sp.temperature,
                                             sp.top_k, sp.top_p)
                key, k2 = jax.random.split(key)
                token = sampling.sample(k2, probs)
                return kv, token, key, buf.at[i].set(token[0])

            kv, token, key, buf = jax.lax.fori_loop(
                0, max_len, body, (kv, token, key, buf))
            return kv, token, key, buf

        self._gen_triforce = jax.jit(
            _gen_triforce, static_argnums=(0, 1), donate_argnums=_dn(4))
        self._gen_retrieval = jax.jit(
            _gen_retrieval, static_argnums=(0, 1), donate_argnums=_dn(3))
        self._gen_ar = jax.jit(_gen_ar, static_argnums=(0,),
                               donate_argnums=_dn(2))
        self._gen_helper = _gen
        self._forced_progs = {}

    # ------------------------------------------------------------------
    # state construction / prefill drivers (host loops over jitted chunks)
    # ------------------------------------------------------------------

    def init_state(self, key: jax.Array) -> TriForceState:
        kv = init_kv(self.target_cfg, self.max_cache_len, self.batch,
                     self.dtype, quant=self.kv_quant)
        rkv = init_retrieval(self.target_cfg, self.spec, self.batch,
                             self.dtype, pad_to=self.rkv_pad,
                             quant=self.kv_quant)
        if self.draft_cfg is not None:
            dkv = init_streaming(self.draft_cfg, self.spec, self.batch,
                                 self.dtype)
        else:  # placeholder so the pytree structure is stable
            dkv = StreamingCache(k=jnp.zeros((0,), self.dtype),
                                 v=jnp.zeros((0,), self.dtype),
                                 seq_len=jnp.zeros((), jnp.int32))
        state = TriForceState(kv=kv, rkv=rkv, dkv=dkv,
                              next_token=jnp.zeros((self.batch,), jnp.int32),
                              key=key)
        if self.mesh is not None:
            from .parallel import sharding as shard_mod
            st_sh = shard_mod.state_shardings(
                self.mesh, self.target_cfg, self.draft_cfg,
                shard_seq=self.shard_seq, quant=self.kv_quant)
            state = jax.device_put(state, st_sh)
        return state

    def prefill_target(self, state: TriForceState,
                       input_ids: jnp.ndarray) -> TriForceState:
        """Chunked prefill of all but the last token, then a 1-token forward
        that also builds the retrieval cache.
        reference: decoding.py:48-49 + graph_infer.py:31-37.
        """
        p = input_ids.shape[1]
        assert p == self.prefill
        kv, rkv = state.kv, state.rkv
        body, c = input_ids[:, :-1], self.prefill_chunk
        n_full = body.shape[1] // c
        if n_full:
            chunks = body[:, :n_full * c].reshape(1, n_full, c).transpose(
                1, 0, 2)
            kv = self._prefill_scan(self.t_params, chunks, kv)
        rem = body.shape[1] - n_full * c
        if rem:
            _, kv = self._prefill_t(self.t_params, body[:, -rem:], kv)
        logits, kv, rkv = self._build(self.t_params, input_ids[:, -1:], kv,
                                      rkv)
        probs = sampling.norm_logits(logits[:, -1], self.spec.temperature,
                                     self.spec.top_k, self.spec.top_p)
        key, k2 = jax.random.split(state.key)
        next_token = sampling.sample(k2, probs)
        return state.replace(kv=kv, rkv=rkv, next_token=next_token, key=key)

    def prefill_target_partial(self, state: TriForceState,
                               input_ids: jnp.ndarray, pos: int,
                               max_chunks: int):
        """Advance a chunked target prefill by up to ``max_chunks`` full
        chunks from token offset ``pos`` (one fused scan dispatch), running
        the ragged remainder and the final build-token forward when the
        prompt is exhausted. Returns ``(state, new_pos, done)``.

        This is the serving scheduler's admission slice: interleaving these
        slices with decode segments keeps live slots decoding while a long
        prompt streams in (SpecScheduler). Chaining slices to completion is
        numerically identical to :meth:`prefill_target` (the same chunk
        boundaries feed the same programs)."""
        p = input_ids.shape[1]
        assert p == self.prefill
        c = self.prefill_chunk
        body = input_ids[:, :-1]
        kv = state.kv
        n = min(max_chunks, (body.shape[1] - pos) // c)
        if n > 0:
            chunks = body[:, pos:pos + n * c].reshape(1, n, c).transpose(
                1, 0, 2)
            kv = self._prefill_scan(self.t_params, chunks, kv)
            pos += n * c
        if n < max_chunks and pos < body.shape[1]:
            # ragged remainder fits in the same slice budget
            _, kv = self._prefill_t(self.t_params, body[:, pos:], kv)
            pos = body.shape[1]
        if pos < body.shape[1]:
            return state.replace(kv=kv), pos, False
        logits, kv, rkv = self._build(self.t_params, input_ids[:, -1:], kv,
                                      state.rkv)
        probs = sampling.norm_logits(logits[:, -1], self.spec.temperature,
                                     self.spec.top_k, self.spec.top_p)
        key, k2 = jax.random.split(state.key)
        next_token = sampling.sample(k2, probs)
        return state.replace(kv=kv, rkv=rkv, next_token=next_token,
                             key=key), p, True

    def prefill_draft(self, state: TriForceState, input_ids: jnp.ndarray,
                      mode: str = "full") -> TriForceState:
        """Drafter prefill with StreamingLLM eviction.

        ``mode='full'`` replays the whole prompt in 64-token chunks like the
        reference (graph_infer.py:43-52). ``mode='fast'`` only processes the
        sink chunk + the tokens that can survive eviction — same cache
        OCCUPANCY but window KV conditioned on less context (draft quality
        changes slightly; losslessness is unaffected since the drafter is
        only a proposal distribution).
        """
        c = self.draft_prefill_chunk
        sp = self.spec
        if mode == "fast":
            cap = sp.draft_start_size + sp.draft_recent_size
            keep = (cap // c) * c
            if input_ids.shape[1] > keep:
                input_ids = jnp.concatenate(
                    [input_ids[:, :c], input_ids[:, -(keep - c):]], axis=1)
        dkv = state.dkv
        n = input_ids.shape[1]
        n_full = n // c
        if n_full:
            chunks = input_ids[:, :n_full * c].reshape(1, n_full, c)
            chunks = chunks.transpose(1, 0, 2)
            dkv = self._prefill_d_scan(self.d_params, chunks, dkv)
        if n % c:
            rem = n % c
            dkv = streaming_evict_prefill(dkv, sp, c)
            _, dkv = self._prefill_d_rem(self.d_params, input_ids[:, -rem:],
                                         dkv)
        return state.replace(dkv=dkv)

    # ------------------------------------------------------------------
    # decode steps
    # ------------------------------------------------------------------

    def ar_step(self, params, kv, token, key):
        return self._ar_step(params, kv, token, key)

    def generate(self, state: TriForceState, max_len: int,
                 mode: str = "triforce", stop_on_eos: bool = False):
        """Whole generation as ONE device dispatch (lax.while_loop over
        fused speculation steps). Returns (state, token_buf, n, counters)
        with counters = [steps, accepted, proposed, resampled, bonus,
        mid_draft, mid_accept]."""
        if mode == "triforce":
            return self._gen_triforce(max_len, stop_on_eos, self.t_params,
                                      self.d_params, state)
        if mode == "retrieval":
            return self._gen_retrieval(max_len, stop_on_eos, self.t_params,
                                       state)
        raise ValueError(mode)

    def generate_ar(self, kv, token, key, max_len: int):
        """Autoregressive generation as one dispatch."""
        return self._gen_ar(max_len, self.t_params, kv, token, key)

    def generate_forced(self, state: TriForceState, max_len: int,
                        alpha: float, mode: str = "retrieval",
                        stop_on_eos: bool = False):
        """Controlled-acceptance generation: every accept test becomes a
        coin flip at rate ``alpha`` while ALL real compute runs (drafter
        forwards, middle verifies, full-cache target verify, rollback, tail
        refresh). Random weights cannot express trained-model acceptance
        (NOTES_ROUND1.md), so this measures true end-to-end throughput at a
        chosen alpha — the validation harness for the composed bench metric.
        Output tokens are NOT lossless (the accept test is synthetic)."""
        cfg, sp = self.target_cfg, self.spec
        prog = self._forced_progs.get(mode)
        if prog is None:
            # alpha enters as a TRACED scalar, so every alpha shares ONE
            # compiled program (remote compiles are minutes each)
            if mode == "retrieval":
                def _g(max_len, stop_on_eos, alpha, t_params, state):
                    step = functools.partial(
                        _retrieval_spec_step, cfg, sp, self.prefill,
                        self.eos_token_id, self.mesh, self.shard_seq,
                        force_accept=alpha)
                    return self._gen_helper(step, max_len, stop_on_eos,
                                            sp.gamma + 2, t_params, state)
            elif mode == "triforce":
                def _g(max_len, stop_on_eos, alpha, t_params, d_params,
                       state):
                    step = functools.partial(
                        _triforce_step, cfg, self.draft_cfg, sp,
                        self.prefill, self.eos_token_id, self.mesh,
                        self.shard_seq, force_accept=alpha)
                    return self._gen_helper(step, max_len, stop_on_eos,
                                            sp.gamma + 2, t_params,
                                            d_params, state)
            else:
                raise ValueError(mode)
            # donate the state like every other generation program — the
            # forced dispatch otherwise allocates a SECOND full cache set
            # (~4.8 GB at bench shapes) next to the live input state
            dn = ((4,) if mode == "retrieval" else (5,)) \
                if self._donate else ()
            prog = jax.jit(_g, static_argnums=(0, 1), donate_argnums=dn)
            self._forced_progs[mode] = prog
        a = jnp.float32(alpha)
        if mode == "retrieval":
            return prog(max_len, stop_on_eos, a, self.t_params, state)
        return prog(max_len, stop_on_eos, a, self.t_params, self.d_params,
                    state)

    def triforce_step(self, state: TriForceState):
        return self._triforce_step(self.t_params, self.d_params, state)

    def retrieval_spec_step(self, state: TriForceState):
        return self._retrieval_spec_step(self.t_params, state)


# ---------------------------------------------------------------------------
# The fused TriForce step (reference: utils/decoding.py:41-160 + 163-223)
# ---------------------------------------------------------------------------

def _middle_spec(t_cfg: ModelConfig, d_cfg: ModelConfig, sp: SpecConfig,
                 mesh, t_params, d_params, state: TriForceState,
                 force_accept=None):
    """Drafter <-> middle speculation loop (reference Middle_Spec,
    decoding.py:163-223) as a ``lax.while_loop``, generalized to drafter
    CHAINS of ``sp.middle_chain`` tokens per middle verify.

    The reference drafts ONE token per middle verify. A middle verify
    streams the ENTIRE target weight set (the middle model IS the target's
    weights over the retrieval cache) while a drafter forward is ~10x
    cheaper, so the round's cost is ~(#middle verifies) x (weight stream).
    With ``middle_chain = k``: k cheap drafter forwards propose a chain
    autoregressively, ONE middle verify scores every chain position, and
    the accept walk applies the reference's per-proposal test in order —
    accept keeps the token; the first reject samples from that position's
    middle distribution and stops (decoding.py:212); a fully accepted chain
    earns a bonus token from the next middle row (decoding.py:201-209).
    k=1 reproduces the reference schedule exactly. Losslessness is
    unaffected: the outer target rejection test consumes gen_probs = the
    true middle conditionals of whatever tokens this level emits — the
    middle level is a proposal distribution, enforced only at the outer
    level (SURVEY.md §2.3).

    All forwards are FIXED-width gamma+1 (slots beyond the live prefix are
    causally inert junk — one program replaces the reference's gamma+3
    per-offset CUDA graphs); caches stay loop CLOSURES, never carries, so
    XLA does not double-buffer them per iteration.
    """
    gamma = sp.gamma
    k = max(1, min(sp.middle_chain if sp.middle_chain > 0 else gamma, gamma))
    vocab = t_cfg.vocab_size
    kv_seq_len = state.kv.seq_len

    gen_tokens0 = jnp.full((gamma + 1,), JUNK_TOKEN, jnp.int32)
    gen_probs0 = jnp.zeros((gamma + 1, vocab), jnp.float32)
    first_tok = state.next_token[0].astype(jnp.int32)

    def vt_of(gen_tokens):
        # drafter/middle input row: [next_token, gen_tokens[:gamma]]
        # (input slot i+1 always holds generated token i)
        return jnp.concatenate([first_tok[None], gen_tokens[:gamma]])[None]

    def cond(c):
        return c["n"] < gamma

    def body(c):
        n0 = c["n"]
        live = n0 < gamma   # False only on DEAD fixed-trip rounds (fori
        # path after a row finished): their verify logits are never
        # consumed (used=0, no bonus), so the retrieval-cache read is
        # gated to ZERO columns (forward_spec collapses k_len when its
        # kv_seq_len is 0) — a dead round costs the shared weight stream
        # only, not a per-row budget stream. Bit-identical outputs.
        key, kd, ka, kw = jax.random.split(c["key"], 4)
        kds = jax.random.split(kd, k)       # per-proposal drafter samples
        kas = jax.random.split(kw, 2)       # reject sample + bonus sample

        # --- chain drafting: up to k drafter forwards (early exit past the
        # gamma-1 proposal cap, so a tail round does not pay full-k drafts)
        def d_cond(dc):
            i = dc[0]
            return (i < k) & (n0 + i <= gamma - 1)

        def d_body(dc):
            i, vt, toks, qsel = dc
            d_logits, _ = llama.draft_forward_spec(
                d_cfg, d_params, vt, state.dkv, sp, commit=False)
            row = jax.lax.dynamic_slice(
                d_logits[0], (n0 + i, jnp.int32(0)), (1, vocab))
            q = sampling.norm_logits(row, sp.temperature, -1,
                                     sp.top_p)[0]    # graph_infer.py:57
            tok = sampling.sample(kds[i], q).astype(jnp.int32)
            toks = jax.lax.dynamic_update_slice(toks, tok[None], (i,))
            qsel = jax.lax.dynamic_update_slice(qsel, q[tok][None], (i,))
            vt = jax.lax.dynamic_update_slice(
                vt, tok[None, None], (jnp.int32(0), n0 + i + 1))
            return i + 1, vt, toks, qsel

        i_fin, vt, chain_toks, chain_q = jax.lax.while_loop(
            d_cond, d_body,
            (jnp.int32(0), vt_of(c["gen_tokens"]),
             jnp.full((k,), JUNK_TOKEN, jnp.int32),
             jnp.zeros((k,), jnp.float32)))

        # --- ONE middle verify over the whole chain (read-only rkv) -------
        m_logits, _ = llama.forward_spec(t_cfg, t_params, vt, state.rkv,
                                         jnp.where(live, kv_seq_len, 0),
                                         sp.budget, commit=False, mesh=mesh,
                                         act_quant=sp.mid_act_quant)
        rows_idx = jnp.clip(n0 + jnp.arange(k + 1), 0, gamma)
        rows = jnp.take(m_logits[0], rows_idx, axis=0)       # [k+1, V]
        p_rows = sampling.norm_logits(rows, sp.temperature, -1, sp.top_p)

        # --- accept walk over the chain, VECTORIZED: all per-proposal
        # coins at once, ONE middle-distribution sample at the first
        # rejection (only that one is ever consumed; the sequential form
        # drew a categorical over the whole vocab per position)
        js = jnp.arange(k)
        rs = jax.random.uniform(ka, (k,))
        if force_accept is None:
            ratios = p_rows[js, chain_toks] / jnp.maximum(chain_q, 1e-37)
            ok_v = rs < jnp.minimum(1.0, ratios)
        else:
            # controlled-acceptance validation: coin-flip accept at a FIXED
            # rate while running every real forward (bench methodology —
            # random weights cannot express trained-model acceptance,
            # NOTES_ROUND1.md)
            ok_v = rs < force_accept
        drafted = js < i_fin
        rej_v = drafted & ~ok_v
        any_rej = jnp.any(rej_v)
        j_rej = jnp.argmax(rej_v)                  # first rejection
        used = jnp.where(any_rej, j_rej + 1, i_fin)   # proposals consumed
        # reject: sample directly from that position's middle distribution
        # — no residual at the middle level (SURVEY §2.3)
        res = sampling.sample(
            kas[1], jnp.take(p_rows, j_rej, axis=0)).astype(jnp.int32)
        final_toks = jnp.where((js == j_rej) & any_rej, res, chain_toks)

        # commit consumed positions: tokens and their middle rows (the
        # middle row is the q the OUTER test consumes, for accepted and
        # rejected positions alike — reference decoding.py:193-220)
        def w_body(j, wc):
            gen_tokens, gen_probs = wc
            upd_t = jax.lax.dynamic_update_slice(
                gen_tokens, final_toks[j][None], (n0 + j,))
            upd_p = jax.lax.dynamic_update_slice(
                gen_probs, p_rows[j][None], (n0 + j, jnp.int32(0)))
            keep = j < used
            return (jnp.where(keep, upd_t, gen_tokens),
                    jnp.where(keep, upd_p, gen_probs))

        gen_tokens, gen_probs = jax.lax.fori_loop(
            0, k, w_body, (c["gen_tokens"], c["gen_probs"]))
        n = n0 + used
        acc = c["mid_accept"] + used - any_rej.astype(jnp.int32)
        tested = c["mid_draft"] + used

        # --- bonus on a fully accepted chain (decoding.py:201-209): sample
        # from the middle row AFTER the last accepted token (= row n - n0).
        # n0 < gamma guard: a no-op under the while_loop (its cond), but the
        # fixed-trip fori runs DEAD trips after a row finishes — without it
        # a dead trip at n0 == gamma would re-sample the bonus slot
        bonus_ok = ~any_rej & (n <= gamma) & (n0 < gamma)
        b_row = jnp.take(p_rows, jnp.clip(n - n0, 0, k), axis=0)
        b_tok = sampling.sample(kas[0], b_row).astype(jnp.int32)
        upd_t = jax.lax.dynamic_update_slice(gen_tokens, b_tok[None], (n,))
        upd_p = jax.lax.dynamic_update_slice(gen_probs, b_row[None],
                                             (n, jnp.int32(0)))
        gen_tokens = jnp.where(bonus_ok, upd_t, gen_tokens)
        gen_probs = jnp.where(bonus_ok, upd_p, gen_probs)
        n = n + bonus_ok.astype(jnp.int32)

        return {"n": n, "gen_tokens": gen_tokens, "gen_probs": gen_probs,
                "key": key, "mid_draft": tested, "mid_accept": acc,
                "trips": c["trips"] + 1,
                "live_trips": c["live_trips"] + live.astype(jnp.int32)}

    init = {"n": jnp.int32(0), "gen_tokens": gen_tokens0,
            "gen_probs": gen_probs0, "key": state.key,
            "mid_draft": jnp.int32(0), "mid_accept": jnp.int32(0),
            "trips": jnp.int32(0), "live_trips": jnp.int32(0)}
    if sp.middle_trips > 0:
        # fixed trip count: rows of a vmapped batch run in LOCKSTEP (the
        # batched while_loop pays the max trip count over rows every step);
        # a row that exhausts its trips proposes n < gamma tokens — the
        # outer verify already handles any gamma2 (live = pos < gamma2).
        # Dead trips (n0 >= gamma) draft nothing and commit nothing.
        out = jax.lax.fori_loop(0, sp.middle_trips, lambda t, c: body(c),
                                init)
    else:
        out = jax.lax.while_loop(cond, body, init)
    return out


def _outer_verify_and_commit(t_cfg: ModelConfig, sp: SpecConfig, prefill: int,
                             eos_token_id: int, mesh, shard_seq, t_params,
                             state: TriForceState, gamma2, gen_tokens,
                             gen_probs, key, has_draft: bool, d_cfg, d_params,
                             force_accept=None, return_probs=False,
                             defer_commit=False):
    """Target full-cache verify + exact rejection sampling + cache commit.
    reference: decoding.py:84-141.

    ``defer_commit``: the kv commit and retrieval tail refresh are NOT
    performed; instead the step also returns a payload
    ``(new_k_stack, new_v_stack, old_seq_len)`` and only advances
    ``kv.seq_len``. Used by the batched engine, whose vmap would otherwise
    lower the commit to a scatter on a buffer the attention custom call
    reads — XLA copy-insertion then materialises the whole cache per step
    (B=4 outer half measured 3.8 -> ~38 ms, probes/_r4_batched_decomp3.py);
    the caller commits all rows outside the vmap with chained per-row
    dynamic_update_slice (the flat engine's proven in-place pattern).
    """
    gamma = sp.gamma
    old_seq_len = state.kv.seq_len

    # --- one full-cache target forward over [next_token, gen_tokens] ------
    verify_in = jnp.concatenate(
        [state.next_token[None].astype(jnp.int32),
         gen_tokens[None, :gamma + 1]], axis=1)          # [1, gamma+2]
    logits, kv, _ = llama.forward_append(t_cfg, t_params, verify_in, state.kv,
                                         mesh=mesh, shard_seq=shard_seq,
                                         commit=not defer_commit)
    if defer_commit:
        new_stacks, kv = kv, state.kv.replace(
            seq_len=old_seq_len + gamma + 2)  # rolled back below
    p_all = sampling.norm_logits(logits[0], sp.temperature, sp.top_k,
                                 sp.top_p)               # [gamma+2, V]

    # --- exact rejection sampling (decoding.py:97-118), VECTORIZED: all
    # gamma+1 accept tests at once, then ONE residual sample at the first
    # rejection (the sequential loop drew a categorical over the whole
    # vocab per position; only the first rejection's is ever used)
    key, kb, kr, ks = jax.random.split(key, 4)
    pos = jnp.arange(gamma + 1)
    toks = gen_tokens[:gamma + 1]
    q_sel = gen_probs[pos, toks]
    p_sel = p_all[pos, toks]
    rs = jax.random.uniform(kr, (gamma + 1,))
    if force_accept is None:
        accept_v = rs < jnp.minimum(1.0, p_sel / jnp.maximum(q_sel, 1e-37))
    else:
        accept_v = rs < force_accept
    live = pos < gamma2
    # the walk stops at the first rejection OR the first ACCEPTED EOS
    # (continuing flag in the reference); positions after the stop are dead
    eos_ids = _as_eos_tuple(eos_token_id)
    stop_v = live & (~accept_v | (accept_v & _is_eos(toks, eos_ids)))
    any_stop = jnp.any(stop_v)
    j_stop = jnp.argmax(stop_v)               # first True (0 if none)
    stop_acc = accept_v[j_stop]               # stop was an accepted EOS
    count = jnp.where(any_stop, j_stop + stop_acc.astype(jnp.int32), gamma2)
    rejected = any_stop & ~stop_acc
    res_row = sampling.max_fn(
        jnp.take(p_all, j_stop, axis=0) - jnp.take(gen_probs, j_stop,
                                                   axis=0))
    res = sampling.sample(ks, res_row).astype(jnp.int32)
    resampled = rejected

    # --- bonus token when everything was accepted (decoding.py:127-134):
    # computed from count alone, exactly like the reference — an EOS
    # accepted at the last live position still earns the bonus sample
    bonus = count == gamma2
    bonus_tok = sampling.sample(kb, p_all[gamma2])
    pred = jnp.where(bonus, bonus_tok,
                     jnp.where(rejected, res, toks[j_stop]))
    # EOS on any emitting path: accepted proposal, residual resample, bonus
    # (the reference breaks on pred_token_idx == eos unconditionally,
    # decoding.py:107-121)
    eos_hit = (any_stop & stop_acc) | (rejected & _is_eos(res, eos_ids)) \
        | (bonus & _is_eos(bonus_tok, eos_ids))

    # --- cache commit: rollback + retrieval tail refresh ------------------
    # appended gamma+2, want old + count + 1 kept (decoding.py:124).
    # Accepted-EOS corner (unreachable in the reference, which always
    # breaks its loop on EOS): pred stays the accepted EOS with no
    # resample/bonus, so next_token would be a token the rollback ALREADY
    # committed — re-appended next step as a duplicate. Keep the
    # "next_token is never in kv" invariant by rolling back one extra slot
    # so the EOS lives only in next_token until the next verify commits it.
    has_final = resampled | bonus
    eos_is_pred = eos_hit & ~has_final
    kv = kv.rollback(gamma + 1 - count + eos_is_pred.astype(jnp.int32))
    if defer_commit:
        rkv = state.rkv      # refreshed by the caller from the stacks
    else:
        rkv = retrieval_tail_refresh(state.rkv, kv, sp, prefill,
                                     old_seq_len)

    # --- emitted tokens this step ------------------------------------------
    pos = jnp.arange(gamma + 2)
    emitted = jnp.where(
        pos < count, gen_tokens[jnp.minimum(pos, gamma)],
        jnp.where((pos == count) & has_final, pred, JUNK_TOKEN))
    n_emitted = count + has_final.astype(jnp.int32)

    # --- drafter replay + window compaction (decoding.py:137-139) ---------
    dkv = state.dkv
    if has_draft:
        pass_tokens = jnp.full((gamma + 3,), JUNK_TOKEN, jnp.int32)
        ppos = jnp.arange(gamma + 3)
        pass_tokens = jnp.where(
            ppos == 0, state.next_token[0],
            jnp.where(ppos <= count, gen_tokens[jnp.minimum(ppos - 1, gamma)],
                      jnp.where((ppos == count + 1) & has_final, pred,
                                JUNK_TOKEN)))
        _, dkv = llama.draft_forward_spec(d_cfg, d_params, pass_tokens[None],
                                          dkv, sp)
        # the reference's count includes the bonus but NOT a resample
        # (decoding.py:134-138) — we mirror that, including its quirk of
        # dropping the last accepted token from the window on rejection.
        count_ref = count + bonus.astype(jnp.int32)
        dkv = streaming_evict_for_spec(dkv, sp, count_ref)

    new_state = state.replace(kv=kv, rkv=rkv, dkv=dkv,
                              next_token=pred[None], key=key)
    stats = StepStats(tokens=emitted, n_emitted=n_emitted, gamma2=gamma2,
                      accepted=count, resampled=resampled.astype(jnp.int32),
                      bonus=bonus.astype(jnp.int32), eos=eos_hit,
                      mid_draft=jnp.int32(0), mid_accept=jnp.int32(0),
                      mid_verify=jnp.int32(0), mid_live=jnp.int32(0))
    if defer_commit:
        nk, nv = new_stacks
        return new_state, stats, (nk, nv, old_seq_len)
    if return_probs:
        # expose the REAL middle (q) and target (p) distribution rows of
        # this step for acceptance measurement (profiling.py) — positions
        # share the step's actual context, unlike a synthetic probe
        return new_state, stats, (gen_tokens, gen_probs, p_all)
    return new_state, stats


def _triforce_step(t_cfg: ModelConfig, d_cfg: ModelConfig, sp: SpecConfig,
                   prefill: int, eos_token_id: int, mesh, shard_seq,
                   t_params, d_params, state: TriForceState,
                   force_accept=None, defer_commit=False):
    """One full TriForce outer iteration (decoding.py:70-141), jitted whole."""
    mid = _middle_spec(t_cfg, d_cfg, sp, mesh, t_params, d_params, state,
                       force_accept=force_accept)
    state = state.replace(key=mid["key"])
    out = _outer_verify_and_commit(
        t_cfg, sp, prefill, eos_token_id, mesh, shard_seq, t_params, state,
        mid["n"], mid["gen_tokens"], mid["gen_probs"], mid["key"], True,
        d_cfg, d_params, force_accept=force_accept,
        defer_commit=defer_commit)
    new_state, stats = out[0], out[1].replace(mid_draft=mid["mid_draft"],
                                              mid_accept=mid["mid_accept"],
                                              mid_verify=mid["trips"],
                                              mid_live=mid["live_trips"])
    if defer_commit:
        return new_state, stats, out[2]
    return new_state, stats


def _retrieval_spec_step(t_cfg: ModelConfig, sp: SpecConfig, prefill: int,
                         eos_token_id: int, mesh, shard_seq,
                         t_params, state: TriForceState, force_accept=None,
                         return_probs=False, defer_commit=False):
    """Self-speculation step: the middle model (target weights over the
    retrieval cache) autoregressively drafts gamma tokens, the full-cache
    target verifies them — the minimum lossless slice (SURVEY.md §7.2 step 4;
    no drafter level).
    """
    gamma = sp.gamma
    vocab = t_cfg.vocab_size
    kv_seq_len = state.kv.seq_len

    verify_tokens0 = jnp.full((1, gamma + 1), JUNK_TOKEN, jnp.int32)
    verify_tokens0 = verify_tokens0.at[0, 0].set(state.next_token[0])
    gen_tokens0 = jnp.full((gamma + 1,), JUNK_TOKEN, jnp.int32)
    gen_probs0 = jnp.zeros((gamma + 1, vocab), jnp.float32)

    def body(n, c):
        verify_tokens, gen_tokens, gen_probs, key = c
        key, ks = jax.random.split(key)
        m_logits, _ = llama.forward_spec(t_cfg, t_params, verify_tokens,
                                         state.rkv, kv_seq_len, sp.budget,
                                         commit=False, mesh=mesh,
                                         act_quant=sp.mid_act_quant)
        row = jax.lax.dynamic_slice(m_logits[0], (n, jnp.int32(0)),
                                    (1, vocab))
        p_n = sampling.norm_logits(row, sp.temperature, -1, sp.top_p)[0]
        tok = sampling.sample(ks, p_n)
        gen_tokens = gen_tokens.at[n].set(tok.astype(jnp.int32))
        gen_probs = jax.lax.dynamic_update_slice(gen_probs, p_n[None],
                                                 (n, jnp.int32(0)))
        verify_tokens = jax.lax.dynamic_update_slice(
            verify_tokens, tok[None, None].astype(jnp.int32),
            (jnp.int32(0), n + 1))
        return (verify_tokens, gen_tokens, gen_probs, key)

    verify_tokens, gen_tokens, gen_probs, key = jax.lax.fori_loop(
        0, gamma, body,
        (verify_tokens0, gen_tokens0, gen_probs0, state.key))
    state = state.replace(key=key)
    assert not (return_probs and defer_commit), \
        "return_probs and defer_commit both repurpose the third output"
    out = _outer_verify_and_commit(
        t_cfg, sp, prefill, eos_token_id, mesh, shard_seq, t_params, state,
        jnp.int32(gamma), gen_tokens, gen_probs, key, False, None, None,
        force_accept=force_accept, return_probs=return_probs,
        defer_commit=defer_commit)
    # the self-speculation draft loop IS gamma middle verifies (all live)
    new_state, stats = out[0], out[1].replace(mid_verify=jnp.int32(gamma),
                                              mid_live=jnp.int32(gamma))
    if return_probs or defer_commit:
        return new_state, stats, out[2]
    return new_state, stats
