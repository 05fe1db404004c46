"""Locate the batched step's residual GLUE cost: the B=4 real step is
23.4 ms vs a 16.75 ms forward-component sum (probes/_r4_batched_decomp2).
This probe times the step's NON-forward math alone — sampling
(norm_logits + categorical), accept walks with residual renorms, RNG
split chains, and the small dynamic_update_slice buffer plumbing — under
the same vmap-over-rows + fori-over-steps structure, with the model
forwards REMOVED (logit rows come from a cheap hash of the carry, so the
data dependence chain survives but no weights/caches are read).

Shapes mirror the batched bench: gamma 6, chain 6, trips 2, vocab 32000.
Per step and row: 13 drafter-sample rounds ([1, V] norm+sample), 2 middle
verifies' row normalization ([7, V] -> gen_probs buffer), 1 outer walk
([8, V] p-rows, fori accept chain with residual max(p-q,0) renorm), ~30
key splits. ONE TPU job at a time.
"""
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

from triforce_tpu.ops import sampling

GAMMA, K, TRIPS, VOCAB = 6, 6, 2, 32000
N_LO, N_HI = 2, 10


def retry(f, *a):
    for attempt in range(4):
        try:
            return f(*a)
        except Exception as e:
            if "UNAVAILABLE" not in str(e) and "transport" not in str(e):
                raise
            print(f"[glue] tunnel flake (attempt {attempt}): retrying",
                  flush=True)
            time.sleep(10)
    return f(*a)


def fake_logits(seed_scalar, rows):
    """Deterministic [rows, VOCAB] 'logits' derived from the carry (keeps
    the dependence chain; costs one iota + broadcast elementwise)."""
    base = jnp.arange(VOCAB, dtype=jnp.float32)
    return jnp.sin(base[None, :] * 1e-3
                   + seed_scalar[..., None, None].astype(jnp.float32))


def one_step(key, seed):
    """All the glue of one triforce step for ONE row."""
    emitted = jnp.zeros((GAMMA + 2,), jnp.int32)
    gen_probs = jnp.zeros((GAMMA + 1, VOCAB), jnp.float32)

    # middle trips: chain drafting glue + middle-row normalization
    for _t in range(TRIPS):
        key, kd, kw = jax.random.split(key, 3)
        kds = jax.random.split(kd, K)
        vt = jnp.zeros((1, GAMMA + 1), jnp.int32)
        for i in range(K):                        # drafter-loop glue
            row = fake_logits(seed + i, 1)
            q = sampling.norm_logits(row, 0.6, -1, 0.9)[0]
            tok = sampling.sample(kds[i], q).astype(jnp.int32)
            vt = jax.lax.dynamic_update_slice(
                vt, tok[None, None], (jnp.int32(0), jnp.int32(i)))
            seed = seed + tok
        mrow = fake_logits(seed, GAMMA + 1)       # middle verify rows
        mq = sampling.norm_logits(mrow, 0.6, -1, 0.9)
        gen_probs = gen_probs + mq                # buffer write stand-in

    # outer walk: p rows, accept chain with residual renorm
    key, kr, kb = jax.random.split(key, 3)
    prow = fake_logits(seed + 7, GAMMA + 2)
    p = sampling.norm_logits(prow, 0.6, -1, 0.9)
    rs = jax.random.uniform(kr, (GAMMA + 1,))

    def walk(n, c):
        emitted, seed = c
        ratio = p[n, 100 + n] / jnp.maximum(gen_probs[n, 100 + n], 1e-9)
        ok = rs[n] < ratio
        resid = jnp.maximum(p[n] - gen_probs[n], 0)
        resid = resid / jnp.maximum(resid.sum(), 1e-9)
        tok = jnp.where(ok, jnp.int32(100 + n),
                        sampling.sample(kb, resid).astype(jnp.int32))
        emitted = emitted.at[n].set(tok)
        return emitted, seed + tok

    emitted, seed = jax.lax.fori_loop(0, GAMMA + 1, walk, (emitted, seed))
    bonus = sampling.sample(kb, p[GAMMA + 1])
    return key, seed + bonus.astype(jnp.int32), emitted.sum()


def chain(n, keys, seeds):
    def one(key, seed):
        def body(_, c):
            key, seed, acc = c
            key, seed, s = one_step(key, seed)
            return key, seed, acc + s
        return jax.lax.fori_loop(0, n, body, (key, seed, jnp.int32(0)))[2]
    return jax.vmap(one)(keys, seeds).sum()


def main():
    print(f"[glue] backend={jax.default_backend()}", flush=True)
    for B in (1, 4):
        keys = jax.random.split(jax.random.PRNGKey(0), B)
        seeds = jnp.arange(B, dtype=jnp.int32)
        f_lo = jax.jit(lambda k, s: chain(N_LO, k, s))
        f_hi = jax.jit(lambda k, s: chain(N_HI, k, s))
        print(f"[glue] B={B} compiling...", flush=True)
        retry(lambda: int(f_lo(keys, seeds)))
        retry(lambda: int(f_hi(keys, seeds)))

        def best(f):
            ts = []
            for r in range(3):
                a = (jax.random.split(jax.random.PRNGKey(r), B),
                     seeds + r)
                jax.block_until_ready(a)
                t0 = time.perf_counter()
                retry(lambda: int(f(*a)))
                ts.append(time.perf_counter() - t0)
            return min(ts)

        ms = (best(f_hi) - best(f_lo)) / (N_HI - N_LO) * 1e3
        print(f"[glue] B={B}: {ms:7.3f} ms/step of glue", flush=True)


if __name__ == "__main__":
    main()
