"""r5 probe: ablate per-row GLUE compute in the real batched step.

The B=4 slope (22.1 ms) sits 2x above its byte floor (11.3 ms) while B=1
(6.9 ms) is ~1.2x above its floor — the batched step is COMPUTE-bound:
per-row VPU work (sampling machinery, rope, norms) scales with B while
only the weight stream is shared. This probe measures the REAL fused step
(BatchedSpecEngine.decode slope, the bench's own measurement) under
ablations, monkeypatched before program build:

  full     — unmodified step
  notopp   — norm_logits without the top-p grid filter (softmax only)
  nosample — notopp + categorical sampling -> argmax
  norope   — nosample + apply_rope -> identity (timing only; wrong math)

Run: nohup python probes/_r5_glue_ablate.py > /tmp/r5_glue.log 2>&1 &
"""
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

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
HI, LO = 24, 8

_FLAKY = ("UNAVAILABLE", "transport", "response body closed",
          "remote_compile", "DEADLINE")


def retry(f):
    for attempt in range(6):
        try:
            return f()
        except Exception as e:
            if not any(m in str(e) for m in _FLAKY):
                raise
            print(f"[ga] flake (attempt {attempt}); retrying", flush=True)
            time.sleep(15)
    return f()


_real_nl = sampling.norm_logits
_real_sample = sampling.sample
_real_rope = rope.apply_rope


def softmax_only(logits, temperature=0.6, top_k=-1, top_p=0.9):
    return jax.nn.softmax(logits.astype(jnp.float32) / temperature, axis=-1)


def argmax_sample(key, probs):
    return jnp.argmax(probs, axis=-1)


def no_rope(x, cos, sin, positions):
    return x


VARIANTS = {
    "full": {},
    "notopp": {"nl": softmax_only},
    "nosample": {"nl": softmax_only, "sm": argmax_sample},
    "norope": {"nl": softmax_only, "sm": argmax_sample, "rp": no_rope},
}


def main():
    print(f"[ga] backend={jax.default_backend()}", flush=True)
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
    bat0 = BatchedSpecEngine(eng, mode="triforce", donate=False,
                             force_accept=0.9)
    ids0 = jax.random.randint(jax.random.PRNGKey(40), (1, PREFILL), 0,
                              cfg.vocab_size)
    row = retry(lambda: jax.block_until_ready(bat0.prefill_rows([ids0],
                                                                [0])))
    print("[ga] prefill done", flush=True)

    res = {}
    for name, mod in VARIANTS.items():
        sampling.norm_logits = mod.get("nl", _real_nl)
        sampling.sample = mod.get("sm", _real_sample)
        rope.apply_rope = mod.get("rp", _real_rope)
        try:
            # donate=True + state CHAINING (the bench's own pattern): a
            # non-donated B=4 decode holds 2 full pool states -> OOM
            bat = BatchedSpecEngine(eng, mode="triforce", donate=True,
                                    force_accept=0.9)
            for B in (1, 4):
                state = jax.tree.map(
                    lambda x: jnp.broadcast_to(x, (B,) + x.shape[1:]) + 0,
                    row)
                jax.block_until_ready(state)

                def run_n(state, n):
                    out = retry(lambda: bat.decode(state, n))
                    _ = int(np.asarray(out[2])[0, -1])
                    return out[0]
                for n in (LO, HI):   # compile both lengths
                    state = run_n(state, n)
                ts = {}
                for n in (LO, HI):
                    best = 1e9
                    for r in range(3):
                        t0 = time.perf_counter()
                        state = run_n(state, n)
                        best = min(best, time.perf_counter() - t0)
                    ts[n] = best
                slope = 1e3 * (ts[HI] - ts[LO]) / (HI - LO)
                res[(name, B)] = slope
                print(f"[ga] {name:9s} B={B}: slope {slope:7.3f} ms/step",
                      flush=True)
                del state
                time.sleep(8)
        finally:
            sampling.norm_logits = _real_nl
            sampling.sample = _real_sample
            rope.apply_rope = _real_rope
        del bat

    print("", flush=True)
    for name in VARIANTS:
        a, b = res[(name, 1)], res[(name, 4)]
        print(f"[ga] {name:9s} B1={a:7.3f}  B4={b:7.3f}  "
              f"scaling={4 * a / b:5.2f}x", flush=True)


if __name__ == "__main__":
    main()
