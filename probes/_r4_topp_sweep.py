"""Sweep sort-free top-p configurations on TPU: binary-24 (r3) vs grid
(passes x grid) at the two shapes the triforce step actually calls —
[1, V] (drafter chain positions, vmapped over B rows) and [8, V] (outer
verify rows). Times a chained fori loop of norm_logits-equivalent calls
per config; ONE TPU job at a time."""
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

V = 32000
N_LO, N_HI = 10, 80


def retry(f):
    for attempt in range(4):
        try:
            return f()
        except Exception as e:
            if "UNAVAILABLE" not in str(e) and "transport" not in str(e):
                raise
            print(f"[tp] flake {attempt}", flush=True)
            time.sleep(10)
    return f()


def binary_filter(logits, top_p, iters=24):
    probs = jax.nn.softmax(logits, axis=-1)
    pmax = probs.max(axis=-1, keepdims=True)
    lo, hi = jnp.zeros_like(pmax), pmax + 1e-6

    def body(_, c):
        lo, hi = c
        mid = 0.5 * (lo + hi)
        m = jnp.sum(jnp.where(probs >= mid, probs, 0.0), -1, keepdims=True)
        keep = m > top_p
        return jnp.where(keep, mid, lo), jnp.where(keep, hi, mid)
    lo, hi = jax.lax.fori_loop(0, iters, body, (lo, hi))
    return jnp.where(probs >= lo, logits, -1e30)


def grid_filter(logits, top_p, passes, grid):
    probs = jax.nn.softmax(logits, axis=-1)
    pmax = probs.max(axis=-1, keepdims=True)
    lo, hi = jnp.zeros_like(pmax), pmax + 1e-6
    frac = jnp.arange(grid, dtype=probs.dtype) / grid
    for _ in range(passes):
        taus = lo + (hi - lo) * frac
        mass = jnp.sum(jnp.where(probs[..., :, None] >= taus[..., None, :],
                                 probs[..., :, None], 0.0), axis=-2)
        j = jnp.sum(mass > top_p, axis=-1, keepdims=True) - 1
        step = (hi - lo) / grid
        lo = lo + step * j
        hi = lo + step
    return jnp.where(probs >= lo, logits, -1e30)


def bench(filt, shape, tag):
    def chain(n, x):
        def body(_, c):
            y = filt(c, 0.9)
            p = jax.nn.softmax(y, -1)
            return c + p.sum(-1, keepdims=True) * 1e-3
        return jax.lax.fori_loop(0, n, body, x).sum()

    f_lo = jax.jit(lambda x: chain(N_LO, x))
    f_hi = jax.jit(lambda x: chain(N_HI, x))
    x = jax.random.normal(jax.random.PRNGKey(0), shape) * 3
    retry(lambda: float(f_lo(x)))
    retry(lambda: float(f_hi(x)))

    def best(f):
        ts = []
        for r in range(3):
            xr = x + r * 1e-3
            jax.block_until_ready(xr)
            t0 = time.perf_counter()
            retry(lambda: float(f(xr)))
            ts.append(time.perf_counter() - t0)
        return min(ts)

    us = (best(f_hi) - best(f_lo)) / (N_HI - N_LO) * 1e6
    print(f"[tp] {tag:18s} {str(shape):14s}: {us:8.1f} us/call", flush=True)


def main():
    print(f"[tp] backend={jax.default_backend()}", flush=True)
    for shape in ((1, V), (4, 1, V), (8, V), (4, 8, V)):
        bench(lambda l, p: binary_filter(l, p, 24), shape, "binary24")
        for passes, grid in ((3, 256), (4, 64), (3, 64)):
            bench(lambda l, p, ps=passes, g=grid: grid_filter(l, p, ps, g),
                  shape, f"grid{grid}x{passes}")


if __name__ == "__main__":
    main()
