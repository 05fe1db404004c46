"""Probe: does feeding the KV cache through lax.scan xs copy each layer's
slab before the Pallas kernel reads it?

Theory (from probes/_r2_vpu_variants.py): the chained kernel streams at
~736 GB/s, but the in-model AR step implies ~300 GB/s effective. The model
forward scans layers with the stacked [L,Hkv,S,D] cache as scan XS; XLA
lowers each iteration's xs access to a dynamic-slice whose output must be a
materialized buffer for the pallas_call operand -> an HBM->HBM copy of the
0.27 GB slab (read + write) on top of the kernel's own read = 3x traffic.

Variants (same chained-slope harness, per-kernel-call ms reported):
  C  direct:    chain N kernel calls on ONE fixed [Hkv,S,D] slab
  A  scan-xs:   outer chain of inner lax.scan over L layers with the
                stacked cache as xs (the model's round-1 pattern)
  U  unrolled:  inner python loop over STATIC slices stack[l] (does XLA
                alias static slices?)
  S  stacked:   inner lax.scan over layer INDICES, kernel reads the stack
                in place via the layer BlockSpec coordinate (zero-copy)

MEASURED (v5e, 2026-08-18): gt=1: C 1.246 / A 1.153 / U 1.244; gt=8:
C 1.184 / A 1.179 / U 1.126 ms/call (~230 GB/s) vs the SAME kernel on
standalone slabs at 0.38-0.50 ms (700+ GB/s, probes/_r2_kern_iso.py) —
i.e. ANY sliced-slab operand (scan xs, static or dynamic slice; XLA does
not hoist the 0.27 GB slice out of the loop) pays the HBM->HBM slab copy.
S measures the fix.

Run: python probes/_r2_scanxs.py [--gt 1|8]   (ONE TPU job at a time.)
"""

import argparse
import sys
import time

sys.path.insert(0, "/root/repo")  # never via PYTHONPATH (clobbers axon site)

import jax
import jax.numpy as jnp
import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--gt", type=int, default=1)
    ap.add_argument("--layers", type=int, default=16)
    ap.add_argument("--block", type=int, default=4096)
    args = ap.parse_args()

    from triforce_tpu.ops.flash_decode import flash_decode_append  # noqa

    hkv, d, s, L, gt = 16, 128, 65536, args.layers, args.gt
    block = args.block
    print(f"backend={jax.default_backend()} hkv={hkv} s={s} L={L} gt={gt} "
          f"block={block}", flush=True)

    rng = np.random.default_rng(0)
    kst = jnp.asarray(rng.integers(-127, 127, (L, hkv, s, d), dtype=np.int8))
    vst = jnp.asarray(rng.integers(-127, 127, (L, hkv, s, d), dtype=np.int8))
    kss = jnp.asarray(rng.random((L, hkv, s), dtype=np.float32) * 0.01)
    vss = jnp.asarray(rng.random((L, hkv, s), dtype=np.float32) * 0.01)
    q0 = jnp.asarray(rng.random((hkv, gt, d), dtype=np.float32) * 0.1
                     ).astype(jnp.bfloat16)
    kn = jnp.zeros((hkv, 1, d), jnp.bfloat16)
    vn = jnp.zeros((hkv, 1, d), jnp.bfloat16)
    nmask = jnp.ones((gt, 1), bool)
    klen = jnp.int32(s - 128)
    jax.block_until_ready((kst, vst, kss, vss))

    kern = lambda q, k, v, ks, vs: flash_decode_append(
        q, k, v, kn, vn, klen, nmask, block=block, k_scale=ks, v_scale=vs)

    def chain(q, out):
        return (q + (out[:, :, :1] > 1e30).astype(q.dtype)).astype(q.dtype)

    def make(variant):
        # the stacks are ARGUMENTS of the jitted fn (a closure would ship
        # them as HLO constants -> tunnel HTTP 413, NOTES_ROUND2.md)
        if variant == "C":
            def body_one(q, ks4):
                k, v, ksc, vsc = (x[0] for x in ks4)
                return chain(q, kern(q, k, v, ksc, vsc))
            calls_per_iter = 1
        elif variant == "A":
            def body_one(q, ks4):
                def sbody(qc, xs):
                    k_l, v_l, ks_l, vs_l = xs
                    return chain(qc, kern(qc, k_l, v_l, ks_l, vs_l)), None
                return jax.lax.scan(sbody, q, ks4)[0]
            calls_per_iter = L
        elif variant == "U":
            def body_one(q, ks4):
                k, v, ksc, vsc = ks4
                for l in range(L):
                    q = chain(q, kern(q, k[l], v[l], ksc[l], vsc[l]))
                return q
            calls_per_iter = L
        elif variant == "S":
            def body_one(q, ks4):
                k, v, ksc, vsc = ks4

                def sbody(qc, li):
                    out = flash_decode_append(
                        qc, k, v, kn, vn, klen, nmask, block=block,
                        k_scale=ksc, v_scale=vsc, layer=li)
                    return chain(qc, out), None
                return jax.lax.scan(sbody, q, jnp.arange(L))[0]
            calls_per_iter = L
        else:
            raise ValueError(variant)

        def chained(n, q, k, v, ksc, vsc):
            def loop(c):
                i, q = c
                return i + 1, body_one(q, (k, v, ksc, vsc))
            return jax.lax.while_loop(lambda c: c[0] < n, loop,
                                      (jnp.int32(0), q))[1]

        return jax.jit(chained), calls_per_iter

    bytes_kv = 2 * hkv * s * d + 2 * hkv * s * 4
    n_pairs = {"C": (16, 144), "A": (2, 12), "U": (2, 12), "S": (2, 12)}
    for variant in ("C", "A", "U", "S"):
        f, cpi = make(variant)
        n_lo, n_hi = n_pairs[variant]
        _ = np.asarray(f(jnp.int32(1), q0 + 1, kst, vst, kss, vss))
        times = {}
        for j, n in enumerate((n_lo, n_hi)):
            qb = (q0 + j * 1e-3).astype(jnp.bfloat16)
            _ = float(qb.astype(jnp.float32).sum())  # force before t0
            t0 = time.perf_counter()
            _ = np.asarray(f(jnp.int32(n), qb, kst, vst, kss, vss))
            times[n] = time.perf_counter() - t0
        ms = (times[n_hi] - times[n_lo]) / (n_hi - n_lo) / cpi * 1e3
        print(f"{variant}  {ms:7.3f} ms/kernel-call  "
              f"({bytes_kv / ms * 1e3 / 1e9:.0f} GB/s)", flush=True)


if __name__ == "__main__":
    main()
