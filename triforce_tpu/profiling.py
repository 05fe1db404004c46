"""Profiling / tracing utilities.

The reference's observability is wall-clock spans + CUDA synchronize
bracketing (SURVEY.md §5.1: decoding.py:69,143, offloading_seqouia.py:196)
and an offline-measured time table feeding the tree planner
(tree/config.json). Here:

  * ``span`` / ``Timer`` — host-side phase timers with block_until_ready
    bracketing (the XLA analogue of torch.cuda.synchronize);
  * ``trace`` — context manager around ``jax.profiler`` emitting a TensorBoard
    trace directory for kernel-level inspection;
  * ``measure_phase_times`` — times each compiled decode program (drafter
    step, middle verify, target verify, retrieval build) at its real shapes;
    its output is exactly the (draft_time, target_time) table the offline
    tree planner consumes (tree/planner.py:choose_tree — reference
    tree_search.py:55-75 reads the same numbers from tree/config.json);
  * ``measure_acceptance_vector`` — runs the middle/target hierarchy and
    records per-position acceptance, the planner's ``p`` vector (the
    reference ships this as a measured artifact,
    tree/acceptance-rate-vector.pt).
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np


class Timer:
    """Accumulating phase timer; synchronises the device at span edges."""

    def __init__(self) -> None:
        self.totals: Dict[str, float] = defaultdict(float)
        self.counts: Dict[str, int] = defaultdict(int)

    @contextlib.contextmanager
    def span(self, name: str, sync=None):
        if sync is not None:
            jax.block_until_ready(sync)
        t0 = time.perf_counter()
        yield
        if sync is not None:
            jax.block_until_ready(sync)
        self.totals[name] += time.perf_counter() - t0
        self.counts[name] += 1

    def report(self) -> Dict[str, Dict[str, float]]:
        return {
            name: {"total_s": tot, "count": self.counts[name],
                   "mean_ms": 1e3 * tot / max(self.counts[name], 1)}
            for name, tot in sorted(self.totals.items())
        }

    def pretty(self) -> str:
        rows = ["  {:<24} {:>8.2f} ms x{:<5d} {:>9.3f} s".format(
            k, v["mean_ms"], v["count"], v["total_s"])
            for k, v in self.report().items()]
        return "\n".join(rows)


@contextlib.contextmanager
def trace(log_dir: str):
    """jax.profiler trace (view in TensorBoard / xprof)."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def _time_fn(fn, iters: int = 8, warmup: int = 2) -> float:
    out = None
    for _ in range(warmup):
        out = fn()
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn()
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def measure_phase_times(engine, state, iters: int = 8) -> Dict[str, float]:
    """Per-phase seconds for a prefilled engine state. Keys:
    ``target_verify`` (full-cache forward of gamma+2 tokens), ``middle_step``
    (one retrieval-cache verify), ``draft_step`` (one drafter forward, if a
    drafter is configured), ``retrieval_build``, ``ar_step``.
    State is NOT donated here (donate=False jit wrappers), so the caller's
    state stays valid."""
    from .models import llama
    from . import engine as engine_mod

    cfg, sp = engine.target_cfg, engine.spec
    out: Dict[str, float] = {}
    gamma = sp.gamma

    verify_ids = jnp.zeros((1, gamma + 2), jnp.int32)
    f_verify = jax.jit(lambda p, i, kv: llama.forward_append(cfg, p, i, kv)[0])
    out["target_verify"] = _time_fn(
        lambda: f_verify(engine.t_params, verify_ids, state.kv), iters)

    spec_ids = jnp.zeros((1, gamma + 1), jnp.int32)
    f_mid = jax.jit(lambda p, i, rkv, n: llama.forward_spec(
        cfg, p, i, rkv, n, sp.budget)[0])
    out["middle_step"] = _time_fn(
        lambda: f_mid(engine.t_params, spec_ids, state.rkv, state.kv.seq_len),
        iters)

    ar_ids = jnp.zeros((1, 1), jnp.int32)
    f_ar = jax.jit(lambda p, i, kv: llama.forward_append(cfg, p, i, kv)[0])
    out["ar_step"] = _time_fn(
        lambda: f_ar(engine.t_params, ar_ids, state.kv), iters)

    f_build = jax.jit(lambda p, i, kv, rkv: llama.forward_append(
        cfg, p, i, kv, build_rkv=rkv, prefill=engine.prefill,
        chunk_size=sp.chunk_size, budget=sp.budget)[0])
    out["retrieval_build"] = _time_fn(
        lambda: f_build(engine.t_params, ar_ids, state.kv, state.rkv),
        max(iters // 4, 1))

    if engine.draft_cfg is not None:
        d_ids = jnp.zeros((1, gamma + 1), jnp.int32)
        f_draft = jax.jit(lambda p, i, dkv: llama.draft_forward_spec(
            engine.draft_cfg, p, i, dkv, sp)[0])
        out["draft_step"] = _time_fn(
            lambda: f_draft(engine.d_params, d_ids, state.dkv), iters)
    return out


def measure_acceptance_vector(engine, input_ids, max_branch: int = 4,
                              steps: int = 32, seed: int = 0) -> np.ndarray:
    """Empirical per-branch acceptance vector for the tree planner, from the
    REAL hierarchy: the engine runs genuine retrieval-speculation steps, and
    every proposal position of every step exposes its actual middle (q) and
    target (p) distribution rows (``return_probs`` path of the fused step).
    For each real (q, p) pair, ``max_branch`` candidates are drawn without
    replacement from q (Gumbel top-k, device-keyed) and rejection-tested in
    order against p with residual updates — exactly the SpecTree accept
    chain (SpecTree_TP.py:147-165). p[b] = fraction of positions where
    candidate b was the first accept. Replaces the reference's shipped
    artifact tree/acceptance-rate-vector.pt with a measurable; every random
    draw is a threaded jax key (deterministic given ``seed``).
    """
    import functools

    from . import engine as engine_mod
    from .ops import sampling

    state = engine.init_state(jax.random.PRNGKey(seed))
    state = engine.prefill_target(state, input_ids)
    key = jax.random.PRNGKey(seed + 1)
    gamma = engine.spec.gamma

    debug_step = jax.jit(functools.partial(
        engine_mod._retrieval_spec_step, engine.target_cfg, engine.spec,
        engine.prefill, engine.eos_token_id, engine.mesh, engine.shard_seq,
        return_probs=True))

    wins = np.zeros(max_branch + 1)
    total = 0
    for _ in range(steps):
        state, stats, (toks, q_rows, p_rows) = debug_step(engine.t_params,
                                                          state)
        q_rows = np.asarray(q_rows, np.float64)   # [gamma+1, V] middle q
        p_rows = np.asarray(p_rows, np.float64)   # [gamma+2, V] target p
        for i in range(gamma):  # real proposal positions of this step
            key, k1, k2 = jax.random.split(key, 3)
            q, p = q_rows[i], p_rows[i]
            if q.sum() <= 0:
                continue
            cand = np.asarray(sampling.gumbel_topk_without_replacement(
                k1, jnp.asarray(q, jnp.float32), max_branch))
            rs = np.asarray(jax.random.uniform(k2, (max_branch,)))
            qn, pn = q.copy(), p.copy()
            accepted_at = 0
            for b, tok in enumerate(cand, start=1):
                if pn[tok] > rs[b - 1] * max(qn[tok], 1e-37):
                    accepted_at = b
                    break
                resid = np.maximum(pn - qn, 0)
                pn = resid / max(resid.sum(), 1e-37)
                qn[tok] = 0.0
                qn = qn / max(qn.sum(), 1e-37)
            if accepted_at:
                wins[accepted_at] += 1
            total += 1
    return wins / max(total, 1)
