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
from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from .engine import Engine, TriForceState, JUNK_TOKEN
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
    """Plain AR decoding baseline. reference: decoding.py:14-37."""
    state = engine.init_state(jax.random.PRNGKey(seed))
    kv = state.kv
    sp = engine.spec
    logits = None
    c = engine.prefill_chunk
    n_full = input_ids.shape[1] // c
    for i in range(n_full):
        logits, kv = engine._prefill_t(engine.t_params,
                                       input_ids[:, i * c:(i + 1) * c], kv)
    rem = input_ids.shape[1] - n_full * c
    if rem:
        logits, kv = engine._prefill_t(engine.t_params, input_ids[:, -rem:],
                                       kv)
    key, k2 = jax.random.split(state.key)
    probs = sampling.norm_logits(logits[:, -1], sp.temperature, sp.top_k,
                                 sp.top_p)
    token = sampling.sample(k2, probs)

    out = [int(token[0])]
    if verbose:
        spec_stream(out[-1], tokenizer, "cyan")
    token.block_until_ready()
    t0 = time.perf_counter()
    n = 0
    while n < max_len:
        token, kv, key = engine.ar_step(engine.t_params, kv, token, key)
        n += 1
        if verbose:
            spec_stream(int(token[0]), tokenizer, "cyan")
            out.append(int(token[0]))
    token.block_until_ready()
    t1 = time.perf_counter()
    return DecodeResult(tokens=out, tokens_per_sec=n / (t1 - t0),
                        steps=n, wall_s=t1 - t0)


def _run_spec_loop(engine: Engine, state: TriForceState, step_fn,
                   max_len: int, verbose: bool, tokenizer,
                   stop_on_eos: bool) -> DecodeResult:
    sp = engine.spec
    out: List[int] = [int(state.next_token[0])]
    if verbose:
        spec_stream(out[-1], tokenizer, "cyan")

    n = 0
    steps = 0
    accepted = resampled = bonus = draft_count = 0
    mid_draft = mid_accept = 0
    jax.block_until_ready(state)
    t0 = time.perf_counter()
    while n < max_len:
        state, stats = step_fn(state)
        steps += 1
        ne = int(stats.n_emitted)
        toks = np.asarray(stats.tokens)[:ne].tolist()
        out.extend(toks)
        n += ne
        g2 = int(stats.gamma2)
        acc = int(stats.accepted)
        accepted += acc
        draft_count += g2
        if bool(stats.eos) and acc < g2:
            # reference corrects draft_count when EOS cut the chain short
            # (decoding.py:108-110)
            draft_count -= g2 - acc
        resampled += int(stats.resampled)
        bonus += int(stats.bonus)
        mid_draft += int(stats.mid_draft)
        mid_accept += int(stats.mid_accept)
        if verbose:
            for t in toks:
                spec_stream(t, tokenizer, "green")
        if stop_on_eos and bool(stats.eos):
            break
    jax.block_until_ready(state)
    t1 = time.perf_counter()

    acc_rate = accepted / max(draft_count, 1)
    return DecodeResult(
        tokens=out, tokens_per_sec=n / (t1 - t0), acceptance_rate=acc_rate,
        avg_tokens_per_step=n / max(steps, 1),
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
    return _run_spec_loop(engine, state, engine.triforce_step, max_len,
                          verbose, tokenizer, stop_on_eos)


def retrieval_spec(engine: Engine, input_ids: jnp.ndarray, max_len: int = 256,
                   seed: int = 0, verbose: bool = False, tokenizer=None,
                   stop_on_eos: bool = False) -> DecodeResult:
    """Self-speculation: target weights over the retrieval cache draft,
    full-cache target verifies (lossless; no drafter level)."""
    state = engine.init_state(jax.random.PRNGKey(seed))
    state = engine.prefill_target(state, input_ids)
    return _run_spec_loop(engine, state, engine.retrieval_spec_step, max_len,
                          verbose, tokenizer, stop_on_eos)
