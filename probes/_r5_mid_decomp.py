"""r5 probe: decompose the MIDDLE VERIFY's batched scaling (VERDICT r4
item 3 — mid-loop scales 1.61x at B=4 vs its ~1.9x byte ceiling, and it is
the residual between the 1.67x measured slope and the >=1.9x target).

Per-component step fns, vmapped over rows + fori'd over steps exactly like
the real program (probe methodology from _r4_batched_decomp2.py — params as
jit ARGUMENTS, never closures). Components of ONE forward_spec(T=7):

  mid_full    — the whole retrieval-cache middle verify
  mid_attn    — ONLY the per-layer retrieval attention (q projected from
                the carry, kernel + its q-quantize prep), scan over layers
  mid_mm      — ONLY the matmul tower (qkv + attn_out + mlp), no attention
  mid_logits  — lm_head projection + norm_logits (softmax + grid top-p)
  tv_attn     — full-cache attention only (tverify's stream), for contrast

Also sweeps the retrieval kernel's block size (the rkv cache is 4608 slots
— short sequences mean few grid steps, so pipelining may be thin).

Run:  nohup python probes/_r5_mid_decomp.py > /tmp/r5_mid.log 2>&1 &
"""
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)

from triforce_tpu import config as C
from triforce_tpu.config import SpecConfig
from triforce_tpu.engine import Engine
from triforce_tpu.models import llama, rope
from triforce_tpu.ops import sampling
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
        except Exception as e:
            if not any(m in str(e) for m in _FLAKY):
                raise
            print(f"[md] tunnel flake (attempt {attempt}): retrying",
                  flush=True)
            time.sleep(15)
    return f()


def main():
    print(f"[md] backend={jax.default_backend()}", flush=True)
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
    print(f"[md] prefill done; rkv real_budget={row.rkv.real_budget}",
          flush=True)

    T = GAMMA + 1
    cos, sin = rope.cos_sin_tables(cfg)

    def _thread(state, val):
        nt = (state.next_token + val.reshape(-1)[0].astype(jnp.int32)) \
            % cfg.vocab_size
        return state.replace(next_token=nt)

    def step_mid_full(tp, state):
        ids = jnp.broadcast_to(state.next_token[:, None], (1, T))
        logits, _ = llama.forward_spec(cfg, tp, ids, state.rkv,
                                       state.kv.seq_len, sp.budget,
                                       commit=False)
        return _thread(state, logits[0, -1, :1])

    def make_step_attn(block):
        def step(tp, state):
            # per-layer retrieval attention only: q derived from the carry
            # so layers serialize like the real scan; k_new/v_new fixed
            rkv = state.rkv
            x0 = jnp.full((1, cfg.num_kv_heads * cfg.num_heads //
                           cfg.num_kv_heads, T, cfg.head_dim), 0.01,
                          jnp.bfloat16)
            kn = jnp.full((1, cfg.num_kv_heads, T, cfg.head_dim), 0.01,
                          jnp.bfloat16)
            k_len = jnp.asarray(sp.budget, jnp.int32)

            def body(c, li):
                from triforce_tpu.ops.attention import append_attention_auto
                q = x0 + c[..., :1, :1, :1] * 0
                ctx = append_attention_auto(
                    q, rkv.k, rkv.v, kn, kn, k_len=k_len,
                    k_scale=rkv.k_scale, v_scale=rkv.v_scale, layer=li,
                    **({"block": block} if block else {}))
                return ctx.astype(jnp.float32), None

            c, _ = jax.lax.scan(body, jnp.zeros_like(x0, jnp.float32),
                                jnp.arange(cfg.num_layers))
            return _thread(state, c[0, 0, 0, :1])
        return step

    def step_mid_mm(tp, state):
        # matmul tower only: qkv + attn_out + mlp per layer, no attention
        x = jnp.full((1, T, cfg.hidden_size), 0.01, jnp.bfloat16) \
            + state.next_token.astype(jnp.bfloat16)[:, None, None] * 0

        def body(x, lp):
            h = llama._rms_norm(x, lp["ln_attn"], cfg.rms_norm_eps)
            q, k_new, v_new = llama._qkv(h, lp, cfg)
            ctx = (q + k_new.repeat(1, axis=1) * 0)[:, :cfg.num_heads]
            x = x + llama._attn_out(ctx, lp)
            h = llama._rms_norm(x, lp["ln_mlp"], cfg.rms_norm_eps)
            x = x + llama._mlp(h, lp)
            return x, None

        x, _ = jax.lax.scan(body, x, tp["layers"])
        return _thread(state, x[0, -1, :1])

    def step_mid_logits(tp, state):
        x = jnp.full((1, T, cfg.hidden_size), 0.01, jnp.bfloat16) \
            + state.next_token.astype(jnp.bfloat16)[:, None, None] * 0
        logits = llama._logits(cfg, tp, x)
        p = sampling.norm_logits(logits[0], sp.temperature, -1, sp.top_p)
        return _thread(state, p[0, :1] * 1e6)

    def step_tv_attn(tp, state):
        kv = state.kv
        x0 = jnp.full((1, cfg.num_heads, GAMMA + 2, cfg.head_dim), 0.01,
                      jnp.bfloat16)
        kn = jnp.full((1, cfg.num_kv_heads, GAMMA + 2, cfg.head_dim), 0.01,
                      jnp.bfloat16)

        def body(c, li):
            from triforce_tpu.ops.attention import append_attention_auto
            q = x0 + c[..., :1, :1, :1] * 0
            ctx = append_attention_auto(
                q, kv.k, kv.v, kn, kn, k_len=kv.seq_len,
                k_scale=kv.k_scale, v_scale=kv.v_scale, layer=li)
            return ctx.astype(jnp.float32), None

        c, _ = jax.lax.scan(body, jnp.zeros_like(x0, jnp.float32),
                            jnp.arange(cfg.num_layers))
        return _thread(state, c[0, 0, 0, :1])

    comps = [("mid_full", step_mid_full),
             ("mid_attn", make_step_attn(None)),
             ("mid_attn_b512", make_step_attn(512)),
             ("mid_attn_b1536", make_step_attn(1536)),
             ("mid_mm", step_mid_mm),
             ("mid_logits", step_mid_logits),
             ("tv_attn", step_tv_attn)]

    progs = {}
    for name, stepfn in comps:
        vstep = jax.vmap(stepfn, in_axes=(None, 0))

        def prog(tp, state, vstep=vstep):
            def body(i, st):
                return vstep(tp, st)
            return jax.lax.fori_loop(0, STEPS, body, state).next_token.sum()
        progs[name] = jax.jit(prog)

    res = {}
    for B in (1, 4):
        state = jax.tree.map(
            lambda x: jnp.broadcast_to(x, (B,) + x.shape[1:]) + 0, row)
        jax.block_until_ready(state)
        for name, prog in progs.items():
            retry(lambda: int(prog(eng.t_params, state)))
            ts = []
            for _r in range(3):
                state = state.replace(next_token=state.next_token + 1)
                jax.block_until_ready(state.next_token)
                t0 = time.perf_counter()
                retry(lambda: int(prog(eng.t_params, state)))
                ts.append(time.perf_counter() - t0)
            ms = min(ts) / STEPS * 1e3
            res[(name, B)] = ms
            print(f"[md] B={B} {name:14s}: {ms:7.3f} ms/call", flush=True)

    print("", flush=True)
    for name, _ in comps:
        a, b = res[(name, 1)], res[(name, 4)]
        print(f"[md] {name:14s} B1={a:7.3f}  B4={b:7.3f}  "
              f"scaling={4 * a / b:5.2f}x", flush=True)


if __name__ == "__main__":
    main()
