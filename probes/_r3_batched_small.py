"""Small-cache (retrieval, s=4608) batched attention: row-batched Pallas
kernel (grid (B, nb=2) — tiny, pipeline-warmup-bound?) vs the portable XLA
partials path, at B in {1, 4}. Decides the batched-vmap admission
threshold. ONE TPU job at a time.
"""
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

from triforce_tpu.cache import quantize_tokens
from triforce_tpu.ops.flash_decode import (flash_decode_append_batched,
                                           _pick_block)
from triforce_tpu.ops.attention import append_attention

S, HKV, D, GT, TN = 4608, 16, 128, 8, 8
N_LO, N_HI = 8, 40


def mk(b):
    ks = jax.random.split(jax.random.PRNGKey(b), 5)
    k = jax.random.normal(ks[0], (b, HKV, S, D), jnp.bfloat16)
    v = jax.random.normal(ks[1], (b, HKV, S, D), jnp.bfloat16)
    k8, ksc = quantize_tokens(k)
    v8, vsc = quantize_tokens(v)
    q = jax.random.normal(ks[2], (b, HKV, GT, D), jnp.bfloat16)
    kn = jax.random.normal(ks[3], (b, HKV, TN, D), jnp.bfloat16)
    vn = jax.random.normal(ks[4], (b, HKV, TN, D), jnp.bfloat16)
    klen = jnp.full((b,), S - 512, jnp.int32)
    nm = jnp.ones((b, GT, TN), bool)
    return q, k8, v8, kn, vn, klen, nm, ksc, vsc


def timed(f, args, q):
    def fresh():
        q2 = q + jax.random.normal(jax.random.PRNGKey(
            int(time.time() * 1e6) % 2**31), q.shape, q.dtype) * 1e-3
        jax.block_until_ready(q2)
        return (q2,) + args[1:]

    float(f[0](*fresh())); float(f[1](*fresh()))  # compile+warm
    a = fresh(); t0 = time.perf_counter(); float(f[0](*a))
    t_lo = time.perf_counter() - t0
    a = fresh(); t0 = time.perf_counter(); float(f[1](*a))
    t_hi = time.perf_counter() - t0
    return (t_hi - t_lo) / (N_HI - N_LO) * 1e3


def chain_kernel(n, block):
    def f(q, k8, v8, kn, vn, klen, nm, ksc, vsc):
        out, qq = jnp.zeros((), jnp.float32), q
        for _ in range(n):
            o = flash_decode_append_batched(qq, k8, v8, kn, vn, klen, nm,
                                            block=block, k_scale=ksc,
                                            v_scale=vsc)
            qq = (q + o[..., :1, :1] * 1e-6).astype(q.dtype)
            out = out + o.sum()
        return out
    return jax.jit(f)


def chain_xla(n):
    def f(q, k8, v8, kn, vn, klen, nm, ksc, vsc):
        out, qq = jnp.zeros((), jnp.float32), q
        for _ in range(n):
            o = append_attention(qq, k8, v8, kn, vn, k_len=klen[0],
                                 new_mask=nm[0], k_scale=ksc, v_scale=vsc)
            qq = (q + o[..., :1, :1] * 1e-6).astype(q.dtype)
            out = out + o.sum()
        return out
    return jax.jit(f)


def main():
    block = _pick_block(S, HKV, D, GT, TN, quant=True)
    print(f"[bs] backend={jax.default_backend()} block={block}", flush=True)
    for b in (1, 4):
        args = mk(b)
        jax.block_until_ready(args)
        tk = timed((chain_kernel(N_LO, block), chain_kernel(N_HI, block)),
                   args, args[0])
        tx = timed((chain_xla(N_LO), chain_xla(N_HI)), args, args[0])
        print(f"[bs] B={b}: kernel {tk:.3f} ms/call, xla {tx:.3f} ms/call",
              flush=True)


if __name__ == "__main__":
    main()
