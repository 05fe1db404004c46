"""Probe: why does the REAL flash_decode_append run ~1.2 ms/call while the
hand-rolled probe kernel (probes/_r2_vpu_variants.py "base") runs ~0.38 ms
at the SAME shapes (hkv16 s65536 d128 gt8 block4096, int8)?

Same chained-slope harness for every variant:
  hand      the vpu-probe base kernel (separate q8/qs args, static finalize)
  partials  real flash_decode_partials (no new-token fold)
  append    real flash_decode_append (the in-model kernel)

Run: python probes/_r2_kern_iso.py [--gt 8]   (ONE TPU job at a time.)
"""

import argparse
import sys
import time

sys.path.insert(0, "/root/repo")  # never via PYTHONPATH (clobbers axon site)

import jax
import jax.numpy as jnp
import numpy as np


def time_slope(f, q0, args, n_lo=16, n_hi=144):
    _ = np.asarray(f(jnp.int32(1), q0 + 1, *args))  # compile, throwaway
    times = {}
    for j, n in enumerate((n_lo, n_hi)):
        qb = q0 + j
        _ = float(qb.astype(jnp.float32).sum())  # force before t0
        t0 = time.perf_counter()
        _ = np.asarray(f(jnp.int32(n), qb, *args))
        times[n] = time.perf_counter() - t0
    return (times[n_hi] - times[n_lo]) / (n_hi - n_lo)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--gt", type=int, default=8)
    ap.add_argument("--block", type=int, default=4096)
    args = ap.parse_args()
    from triforce_tpu.ops.flash_decode import (flash_decode_append,
                                               flash_decode_partials)
    from probes._r2_vpu_variants import make_variant

    hkv, s, d, gt, block = 16, 65536, 128, args.gt, args.block
    print(f"backend={jax.default_backend()} hkv={hkv} s={s} gt={gt} "
          f"block={block}", flush=True)
    rng = np.random.default_rng(0)
    k = jnp.asarray(rng.integers(-127, 127, (hkv, s, d), dtype=np.int8))
    v = jnp.asarray(rng.integers(-127, 127, (hkv, s, d), dtype=np.int8))
    ks = jnp.asarray(rng.random((hkv, s), dtype=np.float32) * 0.01)
    vs = jnp.asarray(rng.random((hkv, s), dtype=np.float32) * 0.01)
    q8 = jnp.asarray(rng.integers(-127, 127, (hkv, gt, d), dtype=np.int8))
    qbf = jnp.asarray(rng.random((hkv, gt, d), dtype=np.float32) * 0.1
                      ).astype(jnp.bfloat16)
    qs = jnp.asarray(rng.random((hkv, gt), dtype=np.float32) * 0.01)
    kn = jnp.zeros((hkv, 1, d), jnp.bfloat16)
    vn = jnp.zeros((hkv, 1, d), jnp.bfloat16)
    nmask = jnp.ones((gt, 1), bool)
    klen = jnp.int32(s - 128)
    klen1 = jnp.asarray([s - 128], jnp.int32)
    bytes_kv = 2 * hkv * s * d + 2 * hkv * s * 4

    def report(name, sec):
        ms = sec * 1e3
        print(f"{name:10s} {ms:7.3f} ms/call ({bytes_kv/ms*1e3/1e9:.0f} "
              f"GB/s)", flush=True)

    # --- hand (vpu base) --------------------------------------------------
    hand = make_variant("base", hkv, s, d, gt, block)

    def chained_hand(n, q8, qs, klen1, k, v, ks, vs):
        def loop(c):
            i, qq = c
            out = hand(klen1, qq, qs, k, v, ks, vs)
            return i + 1, (qq + (out[:, :, :1] > 1e30).astype(jnp.int8)
                           ).astype(jnp.int8)
        return jax.lax.while_loop(lambda c: c[0] < n, loop,
                                  (jnp.int32(0), q8))[1]

    report("hand", time_slope(jax.jit(chained_hand), q8,
                              (qs, klen1, k, v, ks, vs)))

    # --- real partials ----------------------------------------------------
    def chained_part(n, q, k, v, ks, vs):
        def loop(c):
            i, qq = c
            m, l, acc = flash_decode_partials(qq, k, v, klen, block=block,
                                              k_scale=ks, v_scale=vs)
            return i + 1, (qq + (acc[:, :, :1] > 1e30).astype(qq.dtype))
        return jax.lax.while_loop(lambda c: c[0] < n, loop,
                                  (jnp.int32(0), q))[1]

    report("partials", time_slope(jax.jit(chained_part), qbf,
                                  (k, v, ks, vs)))

    # --- real append ------------------------------------------------------
    def chained_app(n, q, k, v, ks, vs):
        def loop(c):
            i, qq = c
            out = flash_decode_append(qq, k, v, kn, vn, klen, nmask,
                                      block=block, k_scale=ks, v_scale=vs)
            return i + 1, (qq + (out[:, :, :1] > 1e30).astype(qq.dtype))
        return jax.lax.while_loop(lambda c: c[0] < n, loop,
                                  (jnp.int32(0), q))[1]

    report("append", time_slope(jax.jit(chained_app), qbf,
                                (k, v, ks, vs)))


if __name__ == "__main__":
    main()
