"""Batched-step decomposition, take 3: time the REAL halves of the fused
triforce step (engine._middle_spec and engine._outer_verify_and_commit)
vmapped at B=1 vs B=4, under the same fori-over-steps program shape as the
bench. Probe v2 showed the bare forwards scale fine (sum 9.1 -> 16.7 ms)
while the real step measures 10.3 -> 47.0 ms — so ~30 ms hides in the real
step's loop machinery / sampling / commit paths. This splits the real step
at the mid/outer boundary.
"""
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

from triforce_tpu import config as C
from triforce_tpu.config import SpecConfig
from triforce_tpu.engine import (Engine, _middle_spec,
                                 _outer_verify_and_commit)
from triforce_tpu.models import llama
from triforce_tpu.batched_spec import BatchedSpecEngine

GAMMA, CHAIN, TRIPS = 6, 6, 2
PREFILL = 15872
STEPS = 48

_FLAKY = ("UNAVAILABLE", "transport", "response body closed",
          "remote_compile", "DEADLINE")


def retry(f):
    for attempt in range(6):
        try:
            return f()
        except Exception as e:
            if not any(m in str(e) for m in _FLAKY):
                raise
            print(f"[bd3] tunnel flake (attempt {attempt}): retrying",
                  flush=True)
            time.sleep(15)
    return f()


def main():
    print(f"[bd3] backend={jax.default_backend()}", flush=True)
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
    print("[bd3] prefill done", flush=True)

    vocab = cfg.vocab_size

    def step_mid(tp, dp, state):
        """The REAL middle loop (chain drafting, accept walk, bonus) with a
        forced coin — returns a state whose key/next_token thread the
        result so nothing is DCE'd; caches untouched (as in the real
        step, the middle never commits)."""
        mid = _middle_spec(cfg, dcfg, sp, None, tp, dp, state,
                           force_accept=jnp.float32(0.9))
        nt = (state.next_token + mid["gen_tokens"][0]) % vocab
        return state.replace(key=mid["key"], next_token=nt)

    def step_outer(tp, dp, state):
        """The REAL outer half: full-cache verify + vectorized rejection +
        rollback + tail refresh + drafter replay + eviction, on junk
        proposals (gamma2 = gamma, uniform gen_probs)."""
        gen_tokens = (state.next_token[0]
                      + jnp.arange(GAMMA + 1)) % vocab
        gen_probs = jnp.full((GAMMA + 1, vocab), 1.0 / vocab, jnp.float32)
        new_state, stats = _outer_verify_and_commit(
            cfg, sp, PREFILL, (2,), None, False, tp, state,
            jnp.int32(GAMMA), gen_tokens, gen_probs, state.key, True,
            dcfg, dp, force_accept=jnp.float32(0.9))
        return new_state

    def step_full(tp, dp, state):
        from triforce_tpu.engine import _triforce_step
        st, _stats = _triforce_step(cfg, dcfg, sp, PREFILL, (2,), None,
                                    False, tp, dp, state,
                                    force_accept=jnp.float32(0.9))
        return st

    progs = {}
    # full_real is known from the bench (10.3 / 47.0 ms); time the halves.
    for name, stepfn in (("mid_real", step_mid), ("outer_real", step_outer)):
        vstep = jax.vmap(stepfn, in_axes=(None, None, 0))

        def prog(tp, dp, state, vstep=vstep):
            def body(i, st):
                return vstep(tp, dp, st)
            return jax.lax.fori_loop(0, STEPS, body, state).next_token.sum()
        # DONATE the state: in/out alias keeps one 4.8 GB state live at
        # B=4 (three undonated programs OOMed the 16 GB chip, run 1)
        progs[name] = jax.jit(prog, donate_argnums=(2,))

    def _bc(b_static, r, c):
        st = jax.tree.map(
            lambda x: jnp.broadcast_to(x, (b_static,) + x.shape[1:]) + 0, r)
        return st.replace(next_token=st.next_token + c)
    _bc_jit = jax.jit(_bc, static_argnums=(0,))   # ONE compiled bc per B

    counter = 0
    for B in (1, 4):
        for name, prog in progs.items():
            print(f"[bd3] B={B} {name} compiling...", flush=True)
            counter += 1
            st = _bc_jit(B, row, jnp.int32(counter))
            retry(lambda: int(prog(eng.t_params, eng.d_params, st)))
            del st
            time.sleep(8)      # let async frees land before reallocating
            ts = []
            for _r in range(3):
                counter += 1
                st = _bc_jit(B, row, jnp.int32(counter))
                jax.block_until_ready(st.next_token)
                t0 = time.perf_counter()
                retry(lambda: int(prog(eng.t_params, eng.d_params, st)))
                ts.append(time.perf_counter() - t0)
                del st
                time.sleep(8)
            ms = min(ts) / STEPS * 1e3
            print(f"[bd3] B={B} {name:10s}: {ms:7.3f} ms/step", flush=True)


if __name__ == "__main__":
    main()
