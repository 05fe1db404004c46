"""Batched speculative decoding: B sequences speculate together in ONE
program, each with its own acceptance count, rollback, and retrieval tail
refresh.

The reference is strictly bsz=1 (asserted at
``/root/reference/models/TP_llama.py:71``); this is a beyond-reference
capability for production serving. Design: the single-sequence fused step
(``engine._retrieval_spec_step`` / ``_triforce_step``) is ``jax.vmap``-ped
over a stacked ``TriForceState``. Every per-row state machine the verdict
asks for — per-row gamma2, per-row rejection/rollback (a masked scalar
subtraction), per-row tail refresh (masked block blend) — is the SAME code
as B=1, vectorised by the batching rule, so batched outputs are exactly the
B=1 outputs under the same per-row PRNG keys (tested). Weights are read
once per step for ALL rows (the whole point of batching bandwidth-bound
decode); each row keeps its own cache row.

The AR-only continuous-batching substrate (slot pool, admission, per-row
lengths) lives in ``batching.py``; this module gives speculation the same
batched-step capability.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp

from .config import ModelConfig, SpecConfig
from .ops import attention as attention_ops
from .engine import (Engine, TriForceState, _retrieval_spec_step,
                     _triforce_step)


def stack_states(states):
    """Stack B single-sequence TriForceStates into one batched pytree
    (leading axis = row)."""
    return jax.tree.map(lambda *xs: jnp.stack(xs, axis=0), *states)


def unstack_state(batched, b: int):
    """Split a batched state back into per-row states."""
    return [jax.tree.map(lambda x: x[i], batched) for i in range(b)]


class BatchedSpecEngine:
    """Batched fused speculation steps over a row-stacked state.

    Built ON an existing single-sequence :class:`Engine` (same configs,
    same params, same compiled semantics). ``mode`` is 'retrieval'
    (self-speculation) or 'triforce' (3-level with drafter).
    """

    def __init__(self, engine: Engine, mode: str = "retrieval",
                 donate: bool = True):
        assert engine.mesh is None, \
            "batched speculation is single-chip this round (dp-sharding of " \
            "the row axis is the natural extension)"
        self.engine = engine
        self.mode = mode
        cfg, sp = engine.target_cfg, engine.spec
        dn = (1,) if donate else ()
        # the flash-decode kernel's custom_vmap rule lowers these vmapped
        # B=1 attention calls onto the row-batched (B, nb)-grid kernel, so
        # batched speculation keeps the Pallas decode bandwidth
        if mode == "retrieval":
            step = functools.partial(_retrieval_spec_step, cfg, sp,
                                     engine.prefill, engine.eos_token_id,
                                     None, False)

            def _batched(t_params, state):
                return jax.vmap(step, in_axes=(None, 0))(t_params, state)
            self._step = jax.jit(_batched, donate_argnums=dn)
        elif mode == "triforce":
            step = functools.partial(_triforce_step, cfg, engine.draft_cfg,
                                     sp, engine.prefill, engine.eos_token_id,
                                     None, False)

            def _batched(t_params, d_params, state):
                return jax.vmap(step, in_axes=(None, None, 0))(
                    t_params, d_params, state)
            self._step = jax.jit(_batched, donate_argnums=(2,) if donate
                                 else ())
        else:
            raise ValueError(mode)

    def prefill_rows(self, prompts, seeds) -> TriForceState:
        """Prefill each row through the single-sequence engine programs and
        stack (prefill is compute-bound — batching it buys little; decode is
        where rows share weights reads)."""
        eng = self.engine
        states = []
        for ids, seed in zip(prompts, seeds):
            st = eng.init_state(jax.random.PRNGKey(seed))
            st = eng.prefill_target(st, ids)
            if self.mode == "triforce":
                st = eng.prefill_draft(st, ids)
            states.append(st)
        return stack_states(states)

    def step(self, state: TriForceState):
        """One fused speculation step for EVERY row (one dispatch).
        Returns (state, stats) with a leading row axis on every stats
        field."""
        if self.mode == "retrieval":
            return self._step(self.engine.t_params, state)
        return self._step(self.engine.t_params, self.engine.d_params, state)

    def decode(self, state: TriForceState, steps: int):
        """Run ``steps`` fused steps; returns (state, tokens [B, steps,
        gamma+2], n_emitted [B, steps])."""
        toks, ns = [], []
        for _ in range(steps):
            state, stats = self.step(state)
            toks.append(stats.tokens)
            ns.append(stats.n_emitted)
        return state, jnp.stack(toks, axis=1), jnp.stack(ns, axis=1)
