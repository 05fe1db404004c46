"""Probe: where do the AR step's 20.8 ms go? (BENCH_7B_PROXY, int8 KV+w8)

Floor estimate: 4.3 GB KV / 736 GB/s (measured chained-kernel rate,
probes/_r2_vpu_variants.py) + ~1 GB w8 weights / 800 GB/s ~= 7 ms; at the
conservative 440 GB/s figure ~= 12 ms. Measured AR is 20.8 ms -> up to
~2x headroom somewhere. Decomposition strategy (all slope-timed, one
compile each):

  1. ar(S) sweep: forward_append of 1 token with the TRACED seq_len swept
     over {8K, 16K, 32K, 62K} on one static 64K cache (the decode kernel's
     scalar-prefetch clamp makes streamed bytes track seq_len while shapes
     stay static). Slope = effective KV bandwidth in-context; intercept =
     everything that isn't the KV stream (weights, norms, rope, o/mlp
     matmuls, host-invisible gaps).
  2. gen_ar per-token: slope of generate_ar over max_len at fixed S; the
     difference vs (1) at the same S = sampling + commit cost per token.

Run: python probes/_r2_ar_decomp.py   (ONE TPU job at a time.)
"""

import sys
import time

sys.path.insert(0, "/root/repo")  # never via PYTHONPATH (clobbers axon site)

import jax
import jax.numpy as jnp
import numpy as np

from triforce_tpu import config as C
from triforce_tpu.cache import init_kv
from triforce_tpu.models import llama

CFG = C.BENCH_7B_PROXY
SMAX = 65536


def main():
    print(f"backend={jax.default_backend()}", flush=True)
    dtype = jnp.bfloat16
    params = llama.init_params(jax.random.PRNGKey(0), CFG, dtype=dtype)
    pq = llama.quantize_weights(params)
    jax.block_until_ready(pq)
    del params
    kv = init_kv(CFG, max_len=SMAX, quant=True)
    kv = kv.replace(seq_len=jnp.int32(1024))
    jax.block_until_ready(kv)
    kv_bytes_per_tok = (CFG.num_layers * CFG.num_kv_heads
                        * (2 * CFG.head_dim + 2 * 4))
    print(f"kv bytes/token = {kv_bytes_per_tok} "
          f"({kv_bytes_per_tok * 63488 / 1e9:.2f} GB at 63488)", flush=True)

    def step_body(ids, params, kv, s):
        kv2 = kv.replace(seq_len=s)
        logits = llama.forward_append(CFG, params, ids, kv2)[0]
        nxt = jnp.argmax(logits[0, -1]).astype(jnp.int32)
        return (ids + nxt + 1) % CFG.vocab_size

    def chained(n, ids, params, kv, s):
        def loop(c):
            i, ids = c
            return i + 1, step_body(ids, params, kv, s)
        return jax.lax.while_loop(lambda c: c[0] < n, loop,
                                  (jnp.int32(0), ids))[1]

    f = jax.jit(chained)
    ids0 = jnp.zeros((1, 1), jnp.int32)

    # warm compile with throwaway ids
    _ = np.asarray(f(jnp.int32(1), ids0 + 1, pq, kv, jnp.int32(2048)))

    n_lo, n_hi = 8, 72
    print(f"slope n_lo={n_lo} n_hi={n_hi}", flush=True)
    for s in (8192, 16384, 32768, 62464):
        times = {}
        for j, n in enumerate((n_lo, n_hi)):
            idsb = jnp.asarray(np.full((1, 1), j + s % 7, np.int32))
            _ = float(jnp.sum(idsb))  # force before t0
            t0 = time.perf_counter()
            _ = np.asarray(f(jnp.int32(n), idsb, pq, kv, jnp.int32(s)))
            times[n] = time.perf_counter() - t0
        ms = (times[n_hi] - times[n_lo]) / (n_hi - n_lo) * 1e3
        bw = kv_bytes_per_tok * s / (ms * 1e-3) / 1e9
        print(f"ar_fwd S={s:6d}: {ms:7.3f} ms/step "
              f"(kv-only rate {bw:.0f} GB/s)", flush=True)

    print("done", flush=True)


if __name__ == "__main__":
    main()
