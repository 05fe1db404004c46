"""r5 probe: the T>=256 verify cliff (VERDICT r4 item 4).

round4_planner_driven_tree measured full-cache verify times 64->13.4 ms,
128->19.0, 256->98.3, 512->118.5 — a 5x cliff between 128 and 256. The
flash-decode admission gate caps per-head query rows at gt <= 128
(ops/attention.pallas_decode_eligible, from the r2 crossover probe), so
T>=256 verifies fall back to the XLA partials path over the whole 124928-
token cache. This probe re-measures BOTH paths at T in {64,128,256,512}
with today's kernel (int8 cache, _pick_block block choice) to decide where
the gate should sit.

Run on the TPU:  nohup python probes/_r5_cliff.py > /tmp/r5_cliff.log 2>&1 &
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)

from triforce_tpu import config as C, profiling
from triforce_tpu.cache import init_kv
from triforce_tpu.models import llama
from triforce_tpu.ops import attention as att_mod


def log(m):
    print(m, flush=True)


_FLAKY = ("UNAVAILABLE", "transport", "response body closed",
          "remote_compile", "DEADLINE")


def retry(f):
    for attempt in range(6):
        try:
            return f()
        except Exception as e:
            if not any(m in str(e) for m in _FLAKY):
                raise
            log(f"[cliff] tunnel flake (attempt {attempt}): retrying")
            time.sleep(15)
    return f()


def main():
    cfg = C.BENCH_7B_PROXY
    prefill = 124928
    max_len = 126976          # 31 * 4096 (the bench engine's padded length)
    dtype = jnp.bfloat16

    log(f"backend={jax.default_backend()}")
    params = retry(lambda: jax.block_until_ready(
        llama.quantize_weights(
            llama.init_params(jax.random.PRNGKey(0), cfg, dtype=dtype))))
    kv = init_kv(cfg, max_len, 1, dtype, quant=True)
    kv = kv.replace(seq_len=jnp.asarray(prefill, jnp.int32))
    jax.block_until_ready(kv.k)
    log("params+cache ready")

    def vbody(ids, params, kv):
        logits = llama.forward_append(cfg, params, ids, kv)[0]
        nxt = jnp.argmax(logits[0, -1]).astype(jnp.int32)
        return (ids + nxt + 1) % cfg.vocab_size

    real_gate = att_mod.pallas_decode_eligible
    results = {}
    for variant, gt_cap in (("gate128_current", 128), ("kernel512", 512)):
        def gate(b, s, gt, warn_context="", _cap=gt_cap):
            ok = real_gate(b, s, min(gt, 128), "")
            return ok and gt <= _cap
        att_mod.pallas_decode_eligible = gate
        for t in (64, 128, 256, 512):
            if variant == "gate128_current" and t <= 128:
                pass  # kernel either way; measure once for the floor
            ids0 = jnp.zeros((1, t), jnp.int32)
            t0 = time.perf_counter()
            dt = retry(lambda: profiling._time_chained(
                vbody, ids0, (params, kv), 3, 16))
            wall = time.perf_counter() - t0
            results[(variant, t)] = dt
            log(f"{variant:>16} T={t:<4} verify {1e3 * dt:8.2f} ms "
                f"(probe wall {wall:.0f}s incl compile)")
        att_mod.pallas_decode_eligible = real_gate

    log("")
    for t in (64, 128, 256, 512):
        a = results[("gate128_current", t)]
        b = results[("kernel512", t)]
        log(f"T={t:<4} current={1e3 * a:8.2f} ms  kernel={1e3 * b:8.2f} ms "
            f"-> kernel is {a / b:.2f}x")


if __name__ == "__main__":
    main()
