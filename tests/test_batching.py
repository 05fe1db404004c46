"""Continuous batching: per-row-length batched AR decode must match the
single-sequence engine's distribution machinery, and the scheduler must
drive multiple requests through a shared slot pool.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from triforce_tpu import config as cfg_mod
from triforce_tpu.config import SpecConfig
from triforce_tpu.batching import (BatchState, init_batch, batched_ar_step,
                                   Scheduler, Request)
from triforce_tpu.cache import KVCache
from triforce_tpu.models import llama

TCFG = cfg_mod.TINY_TARGET
SPEC = SpecConfig(gamma=3, budget=16, chunk_size=4, temperature=0.8,
                  top_p=0.9)


@pytest.fixture(scope="module")
def params():
    return llama.init_params(jax.random.PRNGKey(0), TCFG, dtype=jnp.float32)


def test_rowwise_matches_single(params):
    """Batched decode at different per-row lengths == each row decoded
    alone (same cache content, same key per row comparison of logits)."""
    B, S = 3, 64
    state = init_batch(TCFG, B, S, jax.random.PRNGKey(1), dtype=jnp.float32)
    lens = [7, 19, 33]
    # fill each row by single-sequence prefill
    rows = []
    for i, ln in enumerate(lens):
        ids = jax.random.randint(jax.random.PRNGKey(10 + i), (1, ln), 0,
                                 TCFG.vocab_size)
        kv = KVCache(k=state.k[:, i:i + 1], v=state.v[:, i:i + 1],
                     seq_len=jnp.zeros((), jnp.int32))
        logits, kv, _ = llama.forward_append(TCFG, params, ids, kv)
        rows.append((ids, kv, logits[:, -1]))
        state = state.replace(
            k=state.k.at[:, i:i + 1].set(kv.k),
            v=state.v.at[:, i:i + 1].set(kv.v),
            seq_lens=state.seq_lens.at[i].set(ln),
            tokens=state.tokens.at[i].set(int(ids[0, -1]) % 7),
            live=state.live.at[i].set(True))

    # one batched step vs three single-sequence steps on the same token
    new_state = batched_ar_step(TCFG, SPEC, params, state)
    assert np.asarray(new_state.seq_lens).tolist() == [ln + 1 for ln in lens]

    for i, (ids, kv, _) in enumerate(rows):
        tok = state.tokens[i][None]
        logits_1, kv2, _ = llama.forward_append(TCFG, params, tok[None], kv)
        # the committed KV must agree row-wise
        np.testing.assert_allclose(
            np.asarray(new_state.k[:, i:i + 1, :, :lens[i] + 1]),
            np.asarray(kv2.k[:, :, :, :lens[i] + 1]), atol=2e-5, rtol=2e-5)


def test_dead_rows_frozen(params):
    B, S = 2, 32
    state = init_batch(TCFG, B, S, jax.random.PRNGKey(2), dtype=jnp.float32)
    state = state.replace(
        seq_lens=jnp.asarray([5, 9], jnp.int32),
        tokens=jnp.asarray([3, 4], jnp.int32),
        live=jnp.asarray([True, False]))
    out = batched_ar_step(TCFG, SPEC, params, state)
    assert int(out.seq_lens[0]) == 6
    assert int(out.seq_lens[1]) == 9          # frozen
    assert int(out.tokens[1]) == 4            # unchanged
    assert int(out.n_out[0]) == 1 and int(out.n_out[1]) == 0


def test_scheduler_completes_requests(params):
    sched = Scheduler(TCFG, SPEC, params, batch=2, max_len=96,
                      dtype=jnp.float32, segment=4, eos_token_id=-1)
    rng = np.random.default_rng(0)
    reqs = [Request(rid=i, prompt=rng.integers(0, TCFG.vocab_size, 16),
                    max_new_tokens=10) for i in range(3)]
    for r in reqs:
        sched.submit(r)
    done = sched.run(max_wall_s=300)
    assert len(done) == 3
    for r in reqs:
        assert r.done
        assert len(r.out) >= 10
        assert all(0 <= t < TCFG.vocab_size for t in r.out)
