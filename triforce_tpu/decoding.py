"""Decoding algorithm drivers: autoregressive baseline, TriForce hierarchy,
and retrieval-only self-speculation.

Host-side analogues of ``/root/reference/utils/decoding.py`` — but where the
reference's loops sync with the device every token (``.item()`` at
decoding.py:186,193 and rank-0 broadcasts at :230-239), these loops only pull
back a tiny StepStats pytree once per OUTER step (7-16 tokens), and every
distributed run is a replicated program with a shared PRNG key: zero
broadcasts, zero barriers.
"""

from __future__ import annotations

import dataclasses
import time
from typing import List

import jax
import jax.numpy as jnp
import numpy as np

from .engine import Engine, TriForceState
from .ops import sampling
from .utils.misc import spec_stream


@dataclasses.dataclass
class DecodeResult:
    tokens: List[int]
    tokens_per_sec: float
    acceptance_rate: float = float("nan")
    avg_tokens_per_step: float = float("nan")
    middle_acceptance_rate: float = float("nan")
    steps: int = 0
    wall_s: float = 0.0


def autoregressive(engine: Engine, input_ids: jnp.ndarray, max_len: int = 256,
                   seed: int = 0, verbose: bool = False,
                   tokenizer=None) -> DecodeResult:
    """Plain AR decoding baseline: prefill, then ONE device dispatch running
    the whole token loop (lax.fori_loop). reference: decoding.py:14-37 (which
    pays a host sync per token; here the host reads back once).
    """
    state = engine.init_state(jax.random.PRNGKey(seed))
    kv = state.kv
    sp = engine.spec
    c = engine.prefill_chunk
    p = input_ids.shape[1]
    n_full = max(p - 1, 0) // c
    bodyids = input_ids[:, :-1]
    if n_full:
        chunks = bodyids[:, :n_full * c].reshape(1, n_full, c).transpose(
            1, 0, 2)
        kv = engine._prefill_scan(engine.t_params, chunks, kv)
    rem = bodyids.shape[1] - n_full * c
    if rem:
        _, kv = engine._prefill_t(engine.t_params, bodyids[:, -rem:], kv)
    logits, kv = engine._prefill_t(engine.t_params, input_ids[:, -1:], kv)
    key, k2 = jax.random.split(state.key)
    probs = sampling.norm_logits(logits[:, -1], sp.temperature, sp.top_k,
                                 sp.top_p)
    token = sampling.sample(k2, probs)

    first = int(token[0])  # host readback = prefill fully done
    t0 = time.perf_counter()
    kv, token, key, buf = engine.generate_ar(kv, token, key, max_len)
    toks = np.asarray(buf).tolist()  # host readback = generation done
    t1 = time.perf_counter()
    out = [first] + toks
    if verbose:
        for t in out:
            spec_stream(t, tokenizer, "cyan")
    return DecodeResult(tokens=out, tokens_per_sec=max_len / (t1 - t0),
                        steps=max_len, wall_s=t1 - t0)


def _run_spec_loop(engine: Engine, state: TriForceState, mode: str,
                   max_len: int, verbose: bool, tokenizer,
                   stop_on_eos: bool) -> DecodeResult:
    """Whole generation = ONE device dispatch; host reads the token buffer
    and aggregated counters back once at the end."""
    first = int(state.next_token[0])  # readback: prefill complete
    t0 = time.perf_counter()
    state, buf, n, counters, _ = engine.generate(state, max_len, mode=mode,
                                                 stop_on_eos=stop_on_eos)
    toks = np.asarray(buf)
    n = int(n)
    counters = np.asarray(counters)
    t1 = time.perf_counter()

    out = toks[:n].tolist()
    assert out[0] == first
    (steps, accepted, proposed, resampled, bonus, mid_draft, mid_accept,
     _mid_verify, _mid_live) = (int(x) for x in counters)
    if verbose:
        for t in out:
            spec_stream(t, tokenizer, "green")
    gen = n - 1  # tokens produced by speculation steps (buf[0] is prefill's)
    return DecodeResult(
        tokens=out, tokens_per_sec=gen / (t1 - t0),
        acceptance_rate=accepted / max(proposed, 1),
        avg_tokens_per_step=gen / max(steps, 1),
        middle_acceptance_rate=mid_accept / max(mid_draft, 1),
        steps=steps, wall_s=t1 - t0)


def triforce(engine: Engine, input_ids: jnp.ndarray, max_len: int = 256,
             seed: int = 0, verbose: bool = False, tokenizer=None,
             stop_on_eos: bool = False,
             draft_prefill_mode: str = "full") -> DecodeResult:
    """The full three-level hierarchy. reference: decoding.py:41-160."""
    state = engine.init_state(jax.random.PRNGKey(seed))
    state = engine.prefill_target(state, input_ids)
    state = engine.prefill_draft(state, input_ids, mode=draft_prefill_mode)
    return _run_spec_loop(engine, state, "triforce", max_len,
                          verbose, tokenizer, stop_on_eos)


def retrieval_spec(engine: Engine, input_ids: jnp.ndarray, max_len: int = 256,
                   seed: int = 0, verbose: bool = False, tokenizer=None,
                   stop_on_eos: bool = False) -> DecodeResult:
    """Self-speculation: target weights over the retrieval cache draft,
    full-cache target verifies (lossless; no drafter level)."""
    state = engine.init_state(jax.random.PRNGKey(seed))
    state = engine.prefill_target(state, input_ids)
    return _run_spec_loop(engine, state, "retrieval", max_len,
                          verbose, tokenizer, stop_on_eos)
