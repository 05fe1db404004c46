"""Probe: which pass of the int8 flash-decode kernel costs the ~0.7 ms/call
gap between the measured ~1.3 ms (gt=8, 63.5K int8 cache, in-context) and the
~0.6 ms DMA floor (0.27 GB per-layer slab / 440 GB/s)?

Strategy: rebuild the kernel with individual passes stripped (numerically
WRONG on purpose — perf attribution only), time each variant with the
slope method (two fused-loop dispatch lengths; cancels the ~60 ms tunnel
round-trip), and read the deltas.

Variants:
  base      the real int8 kernel math (scores dequant, mask, online softmax,
            p-requant chain, int8 pv)
  noreq     p-requant chain replaced by a shift-cast (strips: pf=p*vs,
            max-reduce, divide, round, clip)
  noexp     exp() replaced by identity (strips 2 transcendental passes)
  nomask    validity where() stripped
  nosc      score scale multiplies stripped (one scalar mult instead)
  floor     everything stripped: int dot -> shift-cast -> int dot -> acc
  bf16      the real bf16 kernel (2x the bytes; bandwidth yardstick)

Run: python probes/_r2_vpu_variants.py [--gt 8] [--block 4096]
(ONE TPU job at a time; see NOTES_ROUND2.md.)
"""

import argparse
import functools
import sys
import time

sys.path.insert(0, "/root/repo")  # never via PYTHONPATH (clobbers axon site)

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG_INF = -1e30


def make_variant(variant: str, hkv: int, s: int, d: int, gt: int,
                 block: int, interpret: bool = False):
    nb = s // block

    def kernel(klen_ref, q_ref, qs_ref, k_ref, v_ref, ks_ref, vs_ref,
               o_ref, m_sc, l_sc, acc_sc):
        i = pl.program_id(0)
        k_len = klen_ref[0]

        @pl.when(i == 0)
        def _():
            m_sc[:] = jnp.full_like(m_sc, _NEG_INF)
            l_sc[:] = jnp.zeros_like(l_sc)
            acc_sc[:] = jnp.zeros_like(acc_sc)

        @pl.when(i < pl.cdiv(k_len, block))
        def _():
            sc_i = jax.lax.dot_general(
                q_ref[:], k_ref[:], (((2,), (2,)), ((0,), (0,))),
                preferred_element_type=jnp.int32)
            if variant == "floor":
                p8 = (sc_i >> 8).astype(jnp.int8)
                pv_i = jax.lax.dot_general(
                    p8, v_ref[:], (((2,), (1,)), ((0,), (0,))),
                    preferred_element_type=jnp.int32)
                acc_sc[:] = acc_sc[:] + pv_i.astype(jnp.float32)
                return
            if variant == "nosc":
                sc = sc_i.astype(jnp.float32) * 0.01
            else:
                sc = (sc_i.astype(jnp.float32)
                      * qs_ref[:][:, :, None] * ks_ref[:][:, None, :])
            if variant != "nomask":
                base = i * block
                cols = jax.lax.broadcasted_iota(
                    jnp.int32, (1, gt, block), 2) + base
                sc = jnp.where(cols < k_len, sc, _NEG_INF)
            m = m_sc[:]
            m_new = jnp.maximum(m, sc.max(axis=-1, keepdims=True))
            if variant == "noexp":
                alpha = m - m_new
                p = sc - m_new
            else:
                alpha = jnp.exp(m - m_new)
                p = jnp.exp(sc - m_new)
            l_sc[:] = l_sc[:] * alpha + p.sum(axis=-1, keepdims=True)
            if variant == "noreq":
                p8 = (sc_i >> 8).astype(jnp.int8)
                ps = jnp.ones((hkv, gt, 1), jnp.float32)
            else:
                pf = p * vs_ref[:][:, None, :]
                ps = jnp.maximum(
                    jnp.max(jnp.abs(pf), axis=-1, keepdims=True) / 127.0,
                    1e-20)
                p8 = jnp.clip(jnp.round(pf / ps), -127, 127).astype(jnp.int8)
            pv_i = jax.lax.dot_general(
                p8, v_ref[:], (((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.int32)
            acc_sc[:] = acc_sc[:] * alpha + pv_i.astype(jnp.float32) * ps
            m_sc[:] = m_new

        @pl.when(i == nb - 1)
        def _():
            o_ref[:] = acc_sc[:] / jnp.maximum(l_sc[:], 1e-9)

    def kv_index(i, klen_ref):
        last = jnp.maximum(pl.cdiv(klen_ref[0], block) - 1, 0)
        return (0, jnp.minimum(i, last), 0)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((hkv, gt, d), lambda i, *_: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((hkv, gt), lambda i, *_: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((hkv, block, d), kv_index, memory_space=pltpu.VMEM),
            pl.BlockSpec((hkv, block, d), kv_index, memory_space=pltpu.VMEM),
            pl.BlockSpec((hkv, block), lambda i, kl: kv_index(i, kl)[:2],
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((hkv, block), lambda i, kl: kv_index(i, kl)[:2],
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((hkv, gt, d), lambda i, *_: (0, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((hkv, gt, 1), jnp.float32),
            pltpu.VMEM((hkv, gt, 1), jnp.float32),
            pltpu.VMEM((hkv, gt, d), jnp.float32),
        ],
    )

    def call(klen, q8, qs, k, v, ks, vs):
        return pl.pallas_call(
            kernel,
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((hkv, gt, d), jnp.float32),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024),
            interpret=interpret,
        )(klen, q8, qs, k, v, ks, vs)

    return call


def time_slope(fn, args_fn, n_lo=16, n_hi=144):
    """Slope timing: run fn n times inside one jitted while_loop, chaining
    the q input off the previous output so nothing is replayable."""
    def chained(n, q8, qs, klen, k, v, ks, vs):
        def loop(c):
            i, q8 = c
            out = fn(klen, q8, qs, k, v, ks, vs)
            q8n = (q8 + (out[:, :, :1] > 1e30).astype(jnp.int8)
                   ).astype(jnp.int8)
            return i + 1, q8n
        return jax.lax.while_loop(lambda c: c[0] < n, loop,
                                  (jnp.int32(0), q8))[1]

    f = jax.jit(chained)
    q8, qs, klen, k, v, ks, vs = args_fn()
    _ = np.asarray(f(jnp.int32(1), q8, qs, klen, k, v, ks, vs))
    out = {}
    for n in (n_lo, n_hi):
        q8b = jnp.asarray(np.asarray(q8) + (n % 2))  # fresh arg per timing
        _ = float(jnp.sum(q8b.astype(jnp.float32)))  # force before t0
        t0 = time.perf_counter()
        _ = np.asarray(f(jnp.int32(n), q8b, qs, klen, k, v, ks, vs))
        out[n] = time.perf_counter() - t0
    return (out[n_hi] - out[n_lo]) / (n_hi - n_lo)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--gt", type=int, default=8)
    ap.add_argument("--block", type=int, default=4096)
    ap.add_argument("--s", type=int, default=65536)
    ap.add_argument("--hkv", type=int, default=16)
    ap.add_argument("--d", type=int, default=128)
    ap.add_argument("--smoke", action="store_true",
                    help="tiny shapes, interpret mode, cpu — syntax check")
    args = ap.parse_args()
    if args.smoke:
        jax.config.update("jax_platforms", "cpu")
        args.hkv, args.s, args.d, args.gt, args.block = 2, 512, 128, 8, 256
    hkv, s, d, gt, block = args.hkv, args.s, args.d, args.gt, args.block

    print(f"backend={jax.default_backend()} hkv={hkv} s={s} d={d} "
          f"gt={gt} block={block}", flush=True)
    rng = np.random.default_rng(0)
    k = jnp.asarray(rng.integers(-127, 127, (hkv, s, d), dtype=np.int8))
    v = jnp.asarray(rng.integers(-127, 127, (hkv, s, d), dtype=np.int8))
    ks = jnp.asarray(rng.random((hkv, s), dtype=np.float32) * 0.01)
    vs = jnp.asarray(rng.random((hkv, s), dtype=np.float32) * 0.01)
    q8 = jnp.asarray(rng.integers(-127, 127, (hkv, gt, d), dtype=np.int8))
    qs = jnp.asarray(rng.random((hkv, gt), dtype=np.float32) * 0.01)
    klen = jnp.asarray([s - 128], jnp.int32)

    bytes_kv = 2 * hkv * s * d + 2 * hkv * s * 4  # int8 K+V + f32 scales
    floor_ms = bytes_kv / 440e9 * 1e3
    print(f"slab={bytes_kv/1e9:.3f} GB, 440GB/s floor={floor_ms:.3f} ms",
          flush=True)

    args_fn = lambda: (q8, qs, klen, k, v, ks, vs)
    results = {}
    for variant in ["base", "noreq", "noexp", "nomask", "nosc", "floor"]:
        fn = make_variant(variant, hkv, s, d, gt, block,
                          interpret=args.smoke)
        try:
            ms = time_slope(fn, args_fn) * 1e3
        except Exception as e:  # noqa
            print(f"{variant:8s} FAILED: {type(e).__name__}: {e}",
                  flush=True)
            continue
        results[variant] = ms
        print(f"{variant:8s} {ms:7.3f} ms/call  ({bytes_kv/ms*1e3/1e9:.0f} "
              f"GB/s int8-equiv)", flush=True)

    if "base" in results:
        base = results["base"]
        for kname, ms in results.items():
            if kname != "base":
                print(f"  delta base-{kname:7s} = {base - ms:+7.3f} ms",
                      flush=True)


if __name__ == "__main__":
    main()
