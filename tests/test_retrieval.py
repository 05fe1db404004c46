"""Retrieval-cache construction vs a slow numpy transcription of the
reference algorithm (models/cache.py:146-178)."""

import jax
import jax.numpy as jnp
import numpy as np

from triforce_tpu.ops import retrieval


def np_reference_build(q, k_pref, v_pref, chunk_size, select_sets):
    """Direct numpy port of the reference chunk-mean top-k gather (MHA)."""
    b, h, p, d = k_pref.shape
    chunks = p // chunk_size
    chunk_k = k_pref.reshape(b, h, chunks, chunk_size, d).mean(axis=3)
    # scores: q [b,h,1,d] . chunk_k [b,h,c,d]
    scores = np.einsum("bhqd,bhcd->bhc", q, chunk_k)
    out_k = np.zeros((b, h, select_sets * chunk_size, d), k_pref.dtype)
    out_v = np.zeros_like(out_k)
    idx_all = np.zeros((b, h, select_sets), np.int64)
    for bi in range(b):
        for hi in range(h):
            rest = np.argsort(-scores[bi, hi, 1:], kind="stable")
            top = (rest[:select_sets - 1] + 1)
            idx = np.concatenate([[0], top])
            idx_all[bi, hi] = idx
            kc = k_pref[bi, hi].reshape(chunks, chunk_size, d)
            vc = v_pref[bi, hi].reshape(chunks, chunk_size, d)
            out_k[bi, hi] = kc[idx].reshape(-1, d)
            out_v[bi, hi] = vc[idx].reshape(-1, d)
    return out_k, out_v, idx_all


def test_build_layer_matches_numpy():
    rng = np.random.default_rng(0)
    b, h, p, d, cs = 1, 3, 64, 8, 4
    budget = 16  # select_sets = 4
    q = rng.normal(size=(b, h, 1, d)).astype(np.float32)
    k = rng.normal(size=(b, h, p, d)).astype(np.float32)
    v = rng.normal(size=(b, h, p, d)).astype(np.float32)

    k_sel, v_sel = retrieval.build_layer(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), p, cs, budget)
    want_k, want_v, _ = np_reference_build(q, k, v, cs, budget // cs)

    # selected chunk SETS must match; within-budget ordering is by score so
    # it should match exactly too (ties measure-zero with random floats)
    np.testing.assert_allclose(np.asarray(k_sel), want_k, atol=1e-5)
    np.testing.assert_allclose(np.asarray(v_sel), want_v, atol=1e-5)


def test_chunk_zero_always_kept():
    rng = np.random.default_rng(1)
    b, h, p, d, cs = 1, 2, 32, 8, 4
    q = rng.normal(size=(b, h, 1, d)).astype(np.float32)
    k = rng.normal(size=(b, h, p, d)).astype(np.float32)
    # make chunk 0 maximally unattractive
    k[:, :, :cs] = -100.0 * np.sign(q.sum())
    sc = retrieval.chunk_scores_xla(jnp.asarray(q), jnp.asarray(k), cs)
    idx = retrieval.select_chunks(sc, 3)
    assert (np.asarray(idx)[:, :, 0] == 0).all()
    assert (np.asarray(idx)[:, :, 1:] > 0).all()


def test_gqa_group_scoring():
    """With Hq = 2*Hkv the scores must be averaged per KV head group."""
    rng = np.random.default_rng(2)
    b, hkv, p, d, cs = 1, 2, 32, 8, 4
    q = rng.normal(size=(b, 2 * hkv, 1, d)).astype(np.float32)
    k = rng.normal(size=(b, hkv, p, d)).astype(np.float32)
    sc = retrieval.chunk_scores_xla(jnp.asarray(q), jnp.asarray(k), cs)
    idx = retrieval.select_chunks(sc, 4)
    assert idx.shape == (b, hkv, 4)

    chunk_k = k.reshape(b, hkv, p // cs, cs, d).mean(axis=3)
    qm = q.reshape(b, hkv, 2, d).mean(axis=2)  # mean over group = mean score
    scores = np.einsum("bhd,bhcd->bhc", qm, chunk_k)
    for hi in range(hkv):
        rest = np.argsort(-scores[0, hi, 1:], kind="stable")[:3] + 1
        want = {0, *rest.tolist()}
        assert set(np.asarray(idx)[0, hi].tolist()) == want


def test_tail_refresh_rolling_window_past_budget():
    """Long generations keep refreshing (VERDICT r3 weak#6): generated
    token g lives at budget slot budget - 1 - (g mod budget), so the budget
    tail is a ROLLING window of the most recent generated tokens — the r3
    version silently STOPPED refreshing once g reached budget - gamma - 2.
    Checked slot-exactly against a numpy model through >2 wrap cycles,
    including the wrap-boundary steps whose slot block splits in two."""
    from triforce_tpu.cache import KVCache, RetrievalCache, \
        retrieval_tail_refresh
    from triforce_tpu.config import SpecConfig

    L, B, H, D = 1, 1, 1, 2
    budget, gamma, prefill = 16, 3, 8
    max_new = gamma + 2
    spec = SpecConfig(gamma=gamma, budget=budget, chunk_size=4)
    total = 3 * budget + 7          # > 2 wrap cycles
    S = prefill + total + max_new
    # full-cache K row of token t encodes t (so slots are identifiable)
    full = np.arange(S, dtype=np.float32)[None, None, None, :, None]
    full = np.broadcast_to(full, (L, B, H, S, D)).copy()
    rb = budget + gamma + 2
    rkv = RetrievalCache(k=jnp.full((L, B, H, rb, D), -1.0),
                         v=jnp.full((L, B, H, rb, D), -1.0))

    expect = -np.ones(budget)       # slot -> token id (numpy model)
    g = 0
    rng = np.random.default_rng(0)
    while g < total:
        n_new = int(rng.integers(1, max_new + 1))
        n_new = min(n_new, total - g)
        kv = KVCache(k=jnp.asarray(full), v=jnp.asarray(full),
                     seq_len=jnp.int32(prefill + g + n_new))
        rkv = retrieval_tail_refresh(
            rkv, kv, spec, prefill, jnp.int32(prefill + g))
        for j in range(n_new):
            expect[budget - 1 - ((g + j) % budget)] = prefill + g + j
        g += n_new
    got = np.asarray(rkv.k)[0, 0, 0, :budget, 0]
    np.testing.assert_array_equal(got, expect)
