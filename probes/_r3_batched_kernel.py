"""Isolate the row-batched flash-decode kernel's B-scaling on hardware:
B=1 vs B=4 at the batched-bench verify shape (20480-slot int8 cache,
gt=8). If the kernel's B=4 time ~= 4x its per-row KV time, the batched
step's remaining gap vs the bandwidth floor lives OUTSIDE the kernel
(vmapped epilogue / norm / loop overheads).

Methodology per NOTES_ROUND2: hoist + force all inputs before t0, chain
n calls in one jitted dispatch (per-dispatch tunnel round trip is ~60 ms),
slope-time over two chain lengths.

Run: python probes/_r3_batched_kernel.py   (ONE TPU job at a time!)
"""
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from triforce_tpu.cache import quantize_tokens
from triforce_tpu.ops.flash_decode import (flash_decode_append_batched,
                                           _pick_block)

S, HKV, D, GT, TN = 20480, 16, 128, 8, 8


def mk(b, key):
    ks = jax.random.split(key, 5)
    k = jax.random.normal(ks[0], (b, 1, HKV, S, D), jnp.bfloat16)
    v = jax.random.normal(ks[1], (b, 1, HKV, S, D), jnp.bfloat16)
    k8, ksc = quantize_tokens(k)
    v8, vsc = quantize_tokens(v)
    q = jax.random.normal(ks[2], (b, HKV, GT, D), jnp.bfloat16)
    kn = jax.random.normal(ks[3], (b, HKV, TN, D), jnp.bfloat16)
    vn = jax.random.normal(ks[4], (b, HKV, TN, D), jnp.bfloat16)
    klen = jnp.full((b,), S - 512, jnp.int32)
    nm = jnp.ones((b, GT, TN), bool)
    return (q, k8, v8, kn, vn, klen, nm, ksc[..., 0, :, :][:, None]
            if False else ksc, vsc)


def chain(n, block):
    def f(q, k8, v8, kn, vn, klen, nm, ksc, vsc):
        out = jnp.zeros((), jnp.float32)
        qq = q
        for i in range(n):
            o = flash_decode_append_batched(
                qq, k8[:, 0], v8[:, 0], kn, vn, klen, nm, block=block,
                k_scale=ksc[:, 0], v_scale=vsc[:, 0],
                layer=None)
            qq = (q + o[..., :1, :1] * 1e-6).astype(q.dtype)  # serialize
            out = out + o.sum()
        return out
    return jax.jit(f, static_argnums=())


def run(b):
    args = mk(b, jax.random.PRNGKey(b))
    jax.block_until_ready(args)
    block = _pick_block(S, HKV, D, GT, TN, quant=True)
    f_lo, f_hi = chain(8, block), chain(40, block)
    q = args[0]

    def fresh():
        # a DIFFERENT q each timed dispatch: the axon tunnel memoizes
        # byte-identical dispatches (bench.py docstring)
        nonlocal_q = q + jax.random.normal(
            jax.random.PRNGKey(int(time.time() * 1e6) % 2**31), q.shape,
            q.dtype) * 1e-3
        jax.block_until_ready(nonlocal_q)
        return (nonlocal_q,) + args[1:]

    r = float(f_lo(*fresh()))          # compile + warm
    r = float(f_hi(*fresh()))
    a = fresh()
    t0 = time.perf_counter()
    r = float(f_lo(*a))
    t_lo = time.perf_counter() - t0
    a = fresh()
    t0 = time.perf_counter()
    r = float(f_hi(*a))
    t_hi = time.perf_counter() - t0
    per_call = (t_hi - t_lo) / 32 * 1e3
    bw = b * (2 * S * HKV * D + 2 * 4 * S * HKV) / per_call / 1e6
    print(f"[bk] B={b}: {per_call:.3f} ms/call (slope), "
          f"{bw:.0f} GB/s int8-equiv", flush=True)
    return per_call


def main():
    print(f"[bk] backend={jax.default_backend()} block="
          f"{_pick_block(S, HKV, D, GT, TN, quant=True)}", flush=True)
    t1 = run(1)
    t4 = run(4)
    print(f"[bk] B4/B1 per-call ratio: {t4 / t1:.2f} (ideal ~4.0 for "
          f"KV-bound; kernel scales if close)", flush=True)


if __name__ == "__main__":
    main()
