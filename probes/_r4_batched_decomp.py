"""Decompose the BATCHED triforce step on hardware: time the three real
forward components at B=1 vs B=4 to find where the missing ~28 ms/step
lives (bench r4: B=1 10.6 ms, B=4 42.4 ms — exactly 4x, i.e. ZERO
sharing, though weights should be read once per matmul for all rows).

Components (shapes = the batched bench: prefill 15872, gamma 6, chain 6,
budget 4096, int8 KV + int8 weights):
  tverify — vmapped full-cache target forward, T = gamma+2 = 8
  mid     — vmapped retrieval-cache middle verify, T = gamma+1 = 7
  draft   — vmapped drafter chain forward, T = 7

Methodology per NOTES_ROUND2: chain n calls in one dispatch serialized
through the input ids; slope-time two chain lengths; retry on the axon
tunnel's intermittent remote-compile broken pipe. ONE TPU job at a time.
The chain is a ``lax.fori_loop`` (trip count static per jit, body compiled
once) — the Python-unrolled form took >3 min per compile through the
tunnel and timed out.
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
from triforce_tpu.batched_spec import BatchedSpecEngine

GAMMA, CHAIN, TRIPS = 6, 6, 2
PREFILL = 15872
N_LO, N_HI = 2, 10   # 8-call slope (the 34-call chain hung the tunnel r4)


def build():
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
    return eng


def retry(f, *a):
    for attempt in range(4):
        try:
            return f(*a)
        except Exception as e:                        # tunnel broken pipe
            if "UNAVAILABLE" not in str(e) and "transport" not in str(e):
                raise
            print(f"[bd] tunnel flake (attempt {attempt}): retrying",
                  flush=True)
            time.sleep(10)
    return f(*a)


def slope(fn, mk_args, tag=""):
    f_lo = jax.jit(lambda *a: fn(N_LO, *a))
    f_hi = jax.jit(lambda *a: fn(N_HI, *a))
    print(f"[bd] {tag} compiling lo...", flush=True)
    retry(lambda: float(f_lo(*mk_args())))
    print(f"[bd] {tag} compiling hi...", flush=True)
    retry(lambda: float(f_hi(*mk_args())))
    print(f"[bd] {tag} timing...", flush=True)

    def best(f):
        ts = []
        for _ in range(3):
            a = mk_args()
            t0 = time.perf_counter()
            retry(lambda: float(f(*a)))   # tunnel flakes mid-timing too
            ts.append(time.perf_counter() - t0)
        return min(ts)

    # NOTE: the fori_loop latch costs O(10 us)/iteration and is part of the
    # slope, slightly inflating ms/call vs the engine's unrolled dispatch;
    # the lo/hi subtraction only cancels FIXED dispatch cost.
    return (best(f_hi) - best(f_lo)) / (N_HI - N_LO) * 1e3


def main():
    print(f"[bd] backend={jax.default_backend()}", flush=True)
    eng = build()
    cfg, dcfg, sp = eng.target_cfg, eng.draft_cfg, eng.spec
    bat = BatchedSpecEngine(eng, mode="triforce", donate=False,
                            force_accept=0.9)
    t_params, d_params = eng.t_params, eng.d_params

    ids0 = jax.random.randint(jax.random.PRNGKey(40), (1, PREFILL), 0,
                              cfg.vocab_size)
    row = bat.prefill_rows([ids0], [0])
    jax.block_until_ready(row)
    print("[bd] prefill done", flush=True)

    for B in (1, 4):
        state = jax.tree.map(
            lambda x: jnp.broadcast_to(x, (B,) + x.shape[1:]) + 0, row)
        jax.block_until_ready(state)
        seed_ids = jnp.arange(B, dtype=jnp.int32)

        def fresh():
            nonlocal seed_ids
            seed_ids = seed_ids + 1
            jax.block_until_ready(seed_ids)
            return (seed_ids, state)

        def chain(n, width, fwd, seed, st):
            def one(seed_row, row_st):
                ids0 = jnp.full((1, width), 7, jnp.int32) + seed_row

                def body(_, c):
                    acc, ids = c
                    logits = fwd(ids, row_st)
                    acc = acc + logits.sum()
                    ids = (ids + logits[0, -1, :1].astype(jnp.int32)) % 100
                    return acc, ids
                acc, _ = jax.lax.fori_loop(
                    0, n, body, (jnp.float32(0), ids0))
                return acc
            return jax.vmap(one)(seed, st).sum()

        def tverify(n, seed, st):
            return chain(
                n, GAMMA + 2,
                lambda ids, r: llama.forward_append(
                    cfg, t_params, ids, r.kv)[0],
                seed, st)

        def mid(n, seed, st):
            return chain(
                n, GAMMA + 1,
                lambda ids, r: llama.forward_spec(
                    cfg, t_params, ids, r.rkv, r.kv.seq_len,
                    sp.budget, commit=False)[0],
                seed, st)

        def draft(n, seed, st):
            return chain(
                n, GAMMA + 1,
                lambda ids, r: llama.draft_forward_spec(
                    dcfg, d_params, ids, r.dkv, sp, commit=False)[0],
                seed, st)

        for name, fn in (("tverify", tverify), ("mid", mid),
                         ("draft", draft)):
            ms = slope(fn, fresh, tag=f"B={B} {name}")
            print(f"[bd] B={B} {name:8s}: {ms:7.3f} ms/call", flush=True)


if __name__ == "__main__":
    main()
