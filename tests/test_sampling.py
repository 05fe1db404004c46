"""Sampling ops vs slow numpy references (reference: utils/sampling.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from triforce_tpu.ops import sampling


def np_top_p_filter(logits, top_p):
    logits = logits.copy()
    for b in range(logits.shape[0]):
        order = np.argsort(-logits[b], kind="stable")
        sorted_logits = logits[b][order]
        probs = np.exp(sorted_logits - sorted_logits.max())
        probs = probs / probs.sum()
        cum = np.cumsum(probs)
        drop = cum > top_p
        drop[1:] = drop[:-1].copy()
        drop[0] = False
        logits[b][order[drop]] = -np.inf
    return logits


def test_top_p_filter_matches_numpy():
    rng = np.random.default_rng(0)
    logits = rng.normal(size=(4, 50)).astype(np.float32)
    got = np.asarray(sampling.top_p_filter(jnp.asarray(logits), 0.9))
    want = np_top_p_filter(logits, 0.9)
    kept_want = np.isfinite(want)
    kept_got = got > -1e29  # filter uses a finite -1e30 sentinel, not -inf
    assert np.array_equal(kept_got, kept_want)
    np.testing.assert_allclose(got[kept_want], want[kept_want], rtol=1e-6)


def test_top_k_filter():
    logits = jnp.asarray([[1.0, 5.0, 3.0, 2.0, 4.0]])
    got = sampling.top_k_filter(logits, 2)
    kept = np.isfinite(np.asarray(got)) & (np.asarray(got) > -1e29)
    assert kept.sum() == 2
    assert kept[0, 1] and kept[0, 4]


def test_norm_logits_is_distribution():
    rng = np.random.default_rng(1)
    logits = jnp.asarray(rng.normal(size=(2, 100)).astype(np.float32))
    probs = sampling.norm_logits(logits, temperature=0.6, top_p=0.9)
    np.testing.assert_allclose(np.asarray(probs.sum(-1)), 1.0, rtol=1e-5)
    assert (np.asarray(probs) >= 0).all()


def test_sample_empirical_distribution():
    probs = jnp.asarray([0.5, 0.3, 0.2, 0.0])
    keys = jax.random.split(jax.random.PRNGKey(0), 20000)
    draws = jax.vmap(lambda k: sampling.sample(k, probs))(keys)
    counts = np.bincount(np.asarray(draws), minlength=4) / 20000
    np.testing.assert_allclose(counts[:3], [0.5, 0.3, 0.2], atol=0.02)
    assert counts[3] == 0


def test_max_fn():
    x = jnp.asarray([[0.2, -0.1, 0.3, -0.4]])
    got = np.asarray(sampling.max_fn(x))
    np.testing.assert_allclose(got, [[0.4, 0.0, 0.6, 0.0]], rtol=1e-6)


def test_gumbel_topk_without_replacement_distinct():
    probs = jnp.asarray([0.4, 0.3, 0.2, 0.1, 0.0, 0.0])
    for seed in range(20):
        idx = np.asarray(sampling.gumbel_topk_without_replacement(
            jax.random.PRNGKey(seed), probs, 3))
        assert len(set(idx.tolist())) == 3
        assert all(i < 4 for i in idx)  # zero-prob entries never chosen


def test_fast_topp_matches_sorted():
    """Binary-search nucleus filter == sort-based filter on random logits
    (the kept set is the same upper level set)."""
    from triforce_tpu.ops.sampling import top_p_filter, top_p_filter_fast
    for seed in range(6):
        logits = jax.random.normal(jax.random.PRNGKey(seed),
                                   (3, 257)) * (1 + seed)
        for p in (0.5, 0.9, 0.97):
            a = np.asarray(top_p_filter(logits, p))
            b = np.asarray(top_p_filter_fast(logits, p))
            np.testing.assert_array_equal(a > -1e29, b > -1e29,
                                          err_msg=f"seed={seed} p={p}")


def test_topk_small_matches_lax_topk():
    """Iterative argmax top-k (k reduction passes instead of a full TPU
    sort) must return exactly lax.top_k's ordered indices for distinct
    values."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from triforce_tpu.ops import sampling

    x = jax.random.normal(jax.random.PRNGKey(0), (7, 1000))
    want = jax.lax.top_k(x, 4)[1]
    got = sampling.topk_small(x, 4)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_topk_small_distinct_on_tiny_support():
    """Support smaller than k must still yield k DISTINCT indices (like
    lax.top_k): review r3 found argmax-and-mask re-picked index 0 because
    the mask value equaled the zero-prob sentinel, inflating the planner's
    measured branch-acceptance vector."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from triforce_tpu.ops import sampling

    probs = jnp.asarray([[0.7, 0.3, 0.0, 0.0, 0.0, 0.0]])
    idx = np.asarray(sampling.gumbel_topk_without_replacement(
        jax.random.PRNGKey(0), probs, 4))[0]
    assert len(set(idx.tolist())) == 4, idx
    assert set(idx[:2].tolist()) == {0, 1}
