"""Jittable sampling ops: temperature / top-k / top-p filtering, categorical
sampling with explicit PRNG keys, and the residual distribution for exact
rejection-sampling speculation.

TPU-native replacement for the reference's eager torch ops
(``/root/reference/utils/sampling.py``): every op is shape-static and key
threaded, so sampling is bitwise deterministic and replicated across hosts —
this is what removes the reference's per-token rank-0 broadcast + barrier
(``utils/decoding.py:230-239``).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_NEG_INF = -1e30   # python float: a module-level jnp scalar would
# initialise the XLA backend at import, breaking jax.distributed
# bring-up (must run before any backend use) on multi-host


def top_k_filter(logits: jnp.ndarray, top_k: int) -> jnp.ndarray:
    """Mask everything below the k-th largest logit. ``top_k`` is static.

    reference: utils/sampling.py:16-18.
    """
    if top_k <= 0:
        return logits
    k = min(top_k, logits.shape[-1])
    kth = jax.lax.top_k(logits, k)[0][..., -1:]
    return jnp.where(logits < kth, _NEG_INF, logits)


def top_p_filter(logits: jnp.ndarray, top_p: float) -> jnp.ndarray:
    """Nucleus filter, exactly mirroring the reference's semantics
    (utils/sampling.py:19-26): sort descending, keep the smallest prefix whose
    cumulative softmax mass exceeds ``top_p`` (first element always kept),
    mask the rest to -inf.
    """
    if top_p <= 0.0 or top_p >= 1.0:
        return logits
    sort_idx = jnp.argsort(-logits, axis=-1)
    sorted_logits = jnp.take_along_axis(logits, sort_idx, axis=-1)
    probs = jax.nn.softmax(sorted_logits, axis=-1)
    cum = jnp.cumsum(probs, axis=-1)
    drop_sorted = cum > top_p
    # shift right: a token is dropped only if the mass *before* it already
    # exceeds top_p (reference: filter[...,1:]=filter[...,:-1]; filter[...,0]=0)
    drop_sorted = jnp.concatenate(
        [jnp.zeros_like(drop_sorted[..., :1]), drop_sorted[..., :-1]], axis=-1)
    inv = jnp.argsort(sort_idx, axis=-1)
    drop = jnp.take_along_axis(drop_sorted, inv, axis=-1)
    return jnp.where(drop, _NEG_INF, logits)


def top_p_filter_fast(logits: jnp.ndarray, top_p: float,
                      passes: int = 4, grid: int = 64) -> jnp.ndarray:
    """Sort-free nucleus filter: grid-refine the probability threshold
    whose upper level set has mass > top_p, then keep that set.

    A top-p set is always an upper level set of the distribution (up to
    exact fp ties, which have measure ~0 at fp32), so this matches the
    sort-based filter while replacing an O(V log^2 V) bitonic sort with
    ``passes`` wide masked reductions. Each pass evaluates the level-set
    mass at ``grid`` thresholds in ONE fused reduction over the vocab and
    narrows [lo, hi) by a factor of ``grid``; 4 passes of 64 reach
    pmax * 64^-4 = 2^-24 — the same fp32 resolution as a 24-iteration
    binary search at 1/6th the sequential depth (the search was
    latency-bound: the speculation step's sampling glue was ~3.9 ms/step,
    probes/_r4_glue.py). grid=64 keeps the per-pass [.., V, G] compare
    small enough that batched-row shapes do not blow HBM traffic
    (probes/_r4_topp_sweep.py: 256-wide grids materialize ~0.25-1 GB/s
    of intermediate at [4, 8, V] and lose to the binary search there).
    """
    if top_p <= 0.0 or top_p >= 1.0:
        return logits
    probs = jax.nn.softmax(logits, axis=-1)
    pmax = probs.max(axis=-1, keepdims=True)

    # invariant: mass(lo) > top_p >= mass(hi)  (lo=0 keeps everything;
    # hi above the max keeps nothing)
    lo = jnp.zeros_like(pmax)
    hi = pmax + 1e-6
    frac = jnp.arange(grid, dtype=probs.dtype) / grid   # [G): tau grid
    for _ in range(passes):
        taus = lo + (hi - lo) * frac                    # [..., G]
        # mass of the level set at every grid threshold, one fused pass:
        # [..., V, G] broadcast-compare reduced over V (XLA keeps the G
        # accumulators in registers; nothing materialises)
        mass = jnp.sum(jnp.where(probs[..., :, None] >= taus[..., None, :],
                                 probs[..., :, None], 0.0), axis=-2)
        # taus ascend => mass non-increasing; j = last grid point with
        # mass > top_p (j >= 0 since taus[0] = lo keeps the invariant)
        j = jnp.sum(mass > top_p, axis=-1, keepdims=True) - 1
        step = (hi - lo) / grid
        lo = lo + step * j
        hi = lo + step
    # lo is (within fp32) the largest threshold whose level set still has
    # mass > top_p; that level set is exactly the reference's kept prefix
    return jnp.where(probs >= lo, logits, _NEG_INF)


def norm_logits(logits: jnp.ndarray, temperature: float = 0.6,
                top_k: int = -1, top_p: float = 0.9) -> jnp.ndarray:
    """logits [..., V] (fp32) -> filtered probability simplex [..., V].

    reference: utils/sampling.py:43-60.
    """
    import os
    logits = logits.astype(jnp.float32) / temperature
    logits = top_k_filter(logits, top_k)
    if os.environ.get("TRIFORCE_SORT_TOPP"):
        logits = top_p_filter(logits, top_p)
    else:
        logits = top_p_filter_fast(logits, top_p)
    return jax.nn.softmax(logits, axis=-1)


def sample(key: jax.Array, probs: jnp.ndarray) -> jnp.ndarray:
    """Draw one token index from a probability vector [..., V].

    reference: utils/sampling.py:63-65 (torch.multinomial); here a Gumbel-max
    categorical with an explicit key — deterministic and replicated.
    """
    logp = jnp.log(jnp.maximum(probs, 1e-37))
    logp = jnp.where(probs > 0, logp, _NEG_INF)
    return jax.random.categorical(key, logp, axis=-1)


def max_fn(x: jnp.ndarray) -> jnp.ndarray:
    """Normalised positive residual ``norm(max(x, 0))`` used to resample on
    speculative rejection. reference: utils/sampling.py:68-76.
    """
    pos = jnp.maximum(x, 0.0)
    denom = jnp.sum(pos, axis=-1, keepdims=True)
    # guard the (theoretically impossible at fp32) all-rejected corner
    denom = jnp.where(denom <= 0, 1.0, denom)
    return pos / denom


def topk_small(x: jnp.ndarray, k: int) -> jnp.ndarray:
    """Exact ordered top-k indices of ``x`` [..., V] for SMALL static k via
    k argmax-and-mask passes. ``lax.top_k`` lowers to a full bitonic sort
    on TPU (~10+ ms at [78, 32000] — measured as the dominant cost of a
    tree grow level, NOTES_ROUND3.md); k reduction passes are ~free.
    Returns [..., k] indices in descending-value order."""
    idxs = []
    x = jnp.maximum(x, _NEG_INF)  # inputs may sit AT the sentinel already
    for _ in range(k):
        i = jnp.argmax(x, axis=-1)
        idxs.append(i)
        # mask with -inf, strictly BELOW the _NEG_INF sentinel zero-prob
        # entries sit at: masking with the sentinel itself made argmax
        # re-pick index 0 whenever the support was smaller than k
        # (duplicate indices; lax.top_k always returned distinct ones)
        x = jnp.where(jax.nn.one_hot(i, x.shape[-1], dtype=bool), -jnp.inf,
                      x)
    return jnp.stack(idxs, axis=-1)


def gumbel_topk_without_replacement(key: jax.Array, probs: jnp.ndarray,
                                    k: int) -> jnp.ndarray:
    """Sample ``k`` distinct indices ~ probs without replacement.

    reference (tree child sampling): test/offloading_seqouia.py:29-39 uses
    ``(rand.log() / q).topk(k)``; the Gumbel-top-k trick is the standard
    equivalent: argtop-k of log p + Gumbel noise (k argmax passes — see
    ``topk_small``).
    """
    g = jax.random.gumbel(key, probs.shape, dtype=jnp.float32)
    logp = jnp.where(probs > 0, jnp.log(jnp.maximum(probs, 1e-37)), _NEG_INF)
    return topk_small(logp + g, k)
