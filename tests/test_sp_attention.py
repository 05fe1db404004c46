"""Sequence-parallel attention (sp-sharded KV + psum partial merge) must be
numerically identical to the single-device path — the correctness core of
replacing the reference's CPU offloading with cross-chip KV sharding
(SURVEY.md §5.7)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from triforce_tpu.ops import attention
from triforce_tpu.ops.sp_attention import sp_append_attention
from triforce_tpu.parallel import mesh as mesh_mod

pytestmark = pytest.mark.skipif(len(jax.devices()) < 8,
                                reason="needs 8 (virtual) devices")


@pytest.mark.parametrize("tp,sp,hq,hkv,t,k_len", [
    (1, 8, 4, 4, 1, 300),
    (2, 4, 4, 2, 7, 413),
    (4, 2, 8, 4, 3, 512),
])
def test_sp_matches_single_device(tp, sp, hq, hkv, t, k_len):
    s, d = 512, 16
    ks = jax.random.split(jax.random.PRNGKey(k_len + t), 5)
    q = jax.random.normal(ks[0], (1, hq, t, d), jnp.float32)
    k = jax.random.normal(ks[1], (1, hkv, s, d), jnp.float32)
    v = jax.random.normal(ks[2], (1, hkv, s, d), jnp.float32)
    kn = jax.random.normal(ks[3], (1, hkv, t, d), jnp.float32)
    vn = jax.random.normal(ks[4], (1, hkv, t, d), jnp.float32)

    want = attention.append_attention(q, k, v, kn, vn,
                                      k_len=jnp.asarray(k_len))

    m = mesh_mod.make_mesh(tp=tp, sp=sp)
    got = jax.jit(lambda *a: sp_append_attention(
        m, *a, k_len=jnp.asarray(k_len)))(q, k, v, kn, vn)

    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-5, rtol=2e-5)


def test_sp_empty_prefix():
    """k_len=0: only the new block contributes; no NaNs from all-masked
    shards."""
    m = mesh_mod.make_mesh(tp=1, sp=8)
    ks = jax.random.split(jax.random.PRNGKey(0), 5)
    q = jax.random.normal(ks[0], (1, 2, 2, 16), jnp.float32)
    k = jnp.zeros((1, 2, 512, 16), jnp.float32)
    v = jnp.zeros((1, 2, 512, 16), jnp.float32)
    kn = jax.random.normal(ks[3], (1, 2, 2, 16), jnp.float32)
    vn = jax.random.normal(ks[4], (1, 2, 2, 16), jnp.float32)
    want = attention.append_attention(q, k, v, kn, vn, k_len=jnp.asarray(0))
    got = jax.jit(lambda *a: sp_append_attention(
        m, *a, k_len=jnp.asarray(0)))(q, k, v, kn, vn)
    assert not np.isnan(np.asarray(got)).any()
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-5, rtol=2e-5)
