"""Decompose the BATCHED triforce step on hardware, take 2.

The _r4_batched_decomp.py fori-chain probe hung the tunnel twice (~100 min
with zero output). Root-cause hypothesis: it closed over the ~1 GB param
pytree inside ``jax.jit(lambda ...)``, embedding the weights as HLO
CONSTANTS that the axon tunnel has to serialize per compile. This probe is
shaped exactly like the program the bench successfully compiles every round
(params as jit ARGUMENTS, vmap over rows, ONE fori_loop over steps): each
component step is a stripped version of the real fused step, so B=1 vs B=4
step times isolate where the missing batched-scaling time lives.

Components per step (shapes = batched bench: prefill 15872, gamma 6,
int8 KV + int8 weights):
  tverify  — full-cache target forward, T = 8   (1x per real step)
  mid      — retrieval-cache middle verify, T = 7  (TRIPS=2x per real step)
  draft    — drafter spec forward, T = 7   (~13x per real step at chain 6)
  epilogue — rollback + tail refresh + commit, no forwards
"""
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

from triforce_tpu import config as C
from triforce_tpu.config import SpecConfig
from triforce_tpu.engine import Engine
from triforce_tpu.models import llama
from triforce_tpu.cache import retrieval_tail_refresh
from triforce_tpu.batched_spec import BatchedSpecEngine

GAMMA, CHAIN, TRIPS = 6, 6, 2
PREFILL = 15872
STEPS = 64


_FLAKY = ("UNAVAILABLE", "transport", "response body closed",
          "remote_compile", "DEADLINE")


def retry(f):
    for attempt in range(6):
        try:
            return f()
        except Exception as e:                        # tunnel flakes
            if not any(m in str(e) for m in _FLAKY):
                raise
            print(f"[bd2] tunnel flake (attempt {attempt}): retrying",
                  flush=True)
            time.sleep(15)
    return f()


def main():
    print(f"[bd2] backend={jax.default_backend()}", flush=True)
    cfg, dcfg = C.BENCH_7B_PROXY, C.LLAMA_68M
    sp = SpecConfig(gamma=GAMMA, budget=4096, chunk_size=8,
                    draft_start_size=16, draft_recent_size=250 - GAMMA,
                    temperature=0.6, top_p=0.9, middle_chain=CHAIN,
                    middle_trips=TRIPS)
    t = llama.init_params(jax.random.PRNGKey(0), cfg, jnp.bfloat16)
    d = llama.init_params(jax.random.PRNGKey(1), dcfg, jnp.bfloat16)
    eng = Engine(cfg, sp, t, draft_cfg=dcfg, draft_params=d,
                 prefill=PREFILL,
                 max_cache_len=PREFILL + 32 * (128 + GAMMA + 2),
                 dtype=jnp.bfloat16, prefill_chunk=512, kv_quant=True,
                 weight_quant=True, donate=False)
    bat = BatchedSpecEngine(eng, mode="triforce", donate=False,
                            force_accept=0.9)
    ids0 = jax.random.randint(jax.random.PRNGKey(40), (1, PREFILL), 0,
                              cfg.vocab_size)
    row = bat.prefill_rows([ids0], [0])
    jax.block_until_ready(row)
    print("[bd2] prefill done", flush=True)

    # ---- component steps: single-row fns, vmapped + fori'd like the bench
    def _thread(state, logits):
        nt = (state.next_token
              + logits[0, -1, 0].astype(jnp.int32)) % cfg.vocab_size
        return state.replace(next_token=nt)

    def step_tverify(tp, dp, state):
        ids = jnp.broadcast_to(state.next_token[:, None], (1, GAMMA + 2))
        logits, _, _ = llama.forward_append(cfg, tp, ids, state.kv)
        return _thread(state, logits)

    def step_mid(tp, dp, state):
        ids = jnp.broadcast_to(state.next_token[:, None], (1, GAMMA + 1))
        st = state
        for _ in range(TRIPS):
            logits, _ = llama.forward_spec(cfg, tp, ids, st.rkv,
                                           st.kv.seq_len, sp.budget,
                                           commit=False)
            st = _thread(st, logits)
            ids = jnp.broadcast_to(st.next_token[:, None], (1, GAMMA + 1))
        return st

    def step_draft(tp, dp, state):
        ids = jnp.broadcast_to(state.next_token[:, None], (1, GAMMA + 1))
        st = state
        for _ in range(CHAIN * TRIPS + 1):
            logits, _ = llama.draft_forward_spec(dcfg, dp, ids, st.dkv, sp,
                                                 commit=False)
            st = _thread(st, logits)
            ids = jnp.broadcast_to(st.next_token[:, None], (1, GAMMA + 1))
        return st

    def step_epilogue(tp, dp, state):
        # rollback + tail refresh + a gamma+2 commit, no forwards
        kv = state.kv.rollback(1)
        nk = jnp.zeros((cfg.num_layers, 1, cfg.num_kv_heads, GAMMA + 2,
                        cfg.head_dim), jnp.bfloat16)
        kv = llama._commit_cache(kv, nk, nk, kv.seq_len,
                                 seq_len=kv.seq_len + 3)
        rkv = retrieval_tail_refresh(state.rkv, kv, sp, PREFILL,
                                     state.kv.seq_len)
        return state.replace(kv=kv, rkv=rkv,
                             next_token=(state.next_token + 1) % 100)

    progs = {}
    for name, stepfn in (("tverify", step_tverify), ("mid", step_mid),
                         ("draft", step_draft), ("epilogue", step_epilogue)):
        vstep = jax.vmap(stepfn, in_axes=(None, None, 0))

        def prog(tp, dp, state, vstep=vstep):
            def body(i, st):
                return vstep(tp, dp, st)
            return jax.lax.fori_loop(0, STEPS, body, state).next_token.sum()
        progs[name] = jax.jit(prog)

    for B in (1, 4):
        state = jax.tree.map(
            lambda x: jnp.broadcast_to(x, (B,) + x.shape[1:]) + 0, row)
        jax.block_until_ready(state)
        for name, prog in progs.items():
            print(f"[bd2] B={B} {name} compiling...", flush=True)
            retry(lambda: int(prog(eng.t_params, eng.d_params, state)))
            ts = []
            for _r in range(3):
                # perturb the input so the tunnel cannot replay a
                # memoized identical dispatch (bench methodology)
                state = state.replace(next_token=state.next_token + 1)
                jax.block_until_ready(state.next_token)
                t0 = time.perf_counter()
                retry(lambda: int(prog(eng.t_params, eng.d_params, state)))
                ts.append(time.perf_counter() - t0)
            ms = min(ts) / STEPS * 1e3
            print(f"[bd2] B={B} {name:9s}: {ms:7.3f} ms/step-component",
                  flush=True)


if __name__ == "__main__":
    main()
