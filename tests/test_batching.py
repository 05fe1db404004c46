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
        kv = KVCache(k=state.k[i:i + 1].transpose(1, 0, 2, 3, 4),
                     v=state.v[i:i + 1].transpose(1, 0, 2, 3, 4),
                     seq_len=jnp.zeros((), jnp.int32))
        logits, kv, _ = llama.forward_append(TCFG, params, ids, kv)
        rows.append((ids, kv, logits[:, -1]))
        state = state.replace(
            k=state.k.at[i:i + 1].set(kv.k.transpose(1, 0, 2, 3, 4)),
            v=state.v.at[i:i + 1].set(kv.v.transpose(1, 0, 2, 3, 4)),
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
            np.asarray(new_state.k[i:i + 1, :, :, :lens[i] + 1]
                       ).transpose(1, 0, 2, 3, 4),
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


def test_rowwise_attention_partial_last_block():
    """S not a multiple of the block: the final partial block's
    dynamic_slice start clamps, and the column labels/masks must clamp WITH
    it. Regression: keys in the overlap were double-counted and the real
    tail keys masked out (2.4e-2 output error at S=3000, block=2048)."""
    from triforce_tpu.batching import _rowwise_attention
    b, hq, hkv, d, s, block = 2, 4, 2, 16, 300, 128   # 300 % 128 != 0
    ks = jax.random.split(jax.random.PRNGKey(5), 3)
    q = jax.random.normal(ks[0], (b, hq, 1, d), jnp.float32)
    k = jax.random.normal(ks[1], (b, hkv, s, d), jnp.float32)
    v = jax.random.normal(ks[2], (b, hkv, s, d), jnp.float32)
    seq_lens = jnp.asarray([291, 123], jnp.int32)   # row 0 ends in the tail

    m, l, acc = _rowwise_attention(q, k, v, seq_lens, block=block)
    got = acc / l[..., None]                         # [B,Hkv,G,1,D]
    got = got.reshape(b, hq, 1, d)

    scale = 1.0 / np.sqrt(d)
    for row in range(b):
        n = int(seq_lens[row])
        qg = np.asarray(q[row]).reshape(hkv, hq // hkv, d)
        kk = np.asarray(k[row, :, :n])
        vv = np.asarray(v[row, :, :n])
        sc = np.einsum("hgd,hsd->hgs", qg, kk) * scale
        p = np.exp(sc - sc.max(-1, keepdims=True))
        p /= p.sum(-1, keepdims=True)
        want = np.einsum("hgs,hsd->hgd", p, vv).reshape(hq, 1, d)
        np.testing.assert_allclose(np.asarray(got[row]), want,
                                   atol=1e-5, rtol=1e-5)
