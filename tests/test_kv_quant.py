"""INT8 KV-cache quantization: numerics vs the bf16/f32 cache and end-to-end
decode. The reference stores fp16 KV (cache.py:34); int8 halves decode
bytes — the dominant cost at 128K — at ~1e-2 relative attention error.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from triforce_tpu import config as cfg_mod
from triforce_tpu.config import SpecConfig
from triforce_tpu.cache import quantize_tokens, dequantize, init_kv
from triforce_tpu.engine import Engine
from triforce_tpu.models import llama
from triforce_tpu import decoding

TCFG = cfg_mod.TINY_TARGET
SPEC = SpecConfig(gamma=3, budget=16, chunk_size=4, draft_start_size=4,
                  draft_recent_size=12, temperature=0.8, top_p=0.9)
PREFILL = 32


def test_quantize_roundtrip():
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 3, 7, 16)) * 3.0
    codes, scale = quantize_tokens(x)
    assert codes.dtype == jnp.int8
    back = dequantize(codes, scale)
    np.testing.assert_allclose(np.asarray(back), np.asarray(x),
                               atol=float(jnp.max(jnp.abs(x))) / 100)


def test_quant_forward_close_to_fp32():
    params = llama.init_params(jax.random.PRNGKey(0), TCFG, dtype=jnp.float32)
    ids = jax.random.randint(jax.random.PRNGKey(1), (1, 24), 0,
                             TCFG.vocab_size)
    kv = init_kv(TCFG, max_len=32, dtype=jnp.float32)
    ref, kv_ref, _ = llama.forward_append(TCFG, params, ids, kv)

    kvq = init_kv(TCFG, max_len=32, quant=True)
    got, kvq, _ = llama.forward_append(TCFG, params, ids, kvq)
    assert kvq.k.dtype == jnp.int8
    assert int(kvq.seq_len) == 24
    # logits agree to quantization noise
    r, g = np.asarray(ref), np.asarray(got)
    denom = np.maximum(np.abs(r).max(), 1)
    assert np.max(np.abs(r - g)) / denom < 0.08

    # incremental append over the quantized cache also agrees
    ids2 = jax.random.randint(jax.random.PRNGKey(2), (1, 1), 0,
                              TCFG.vocab_size)
    ref2, _, _ = llama.forward_append(TCFG, params, ids2, kv_ref)
    got2, _, _ = llama.forward_append(TCFG, params, ids2, kvq)
    r, g = np.asarray(ref2), np.asarray(got2)
    assert np.max(np.abs(r - g)) / np.maximum(np.abs(r).max(), 1) < 0.08


@pytest.fixture(scope="module")
def quant_engine():
    t_params = llama.init_params(jax.random.PRNGKey(0), TCFG,
                                 dtype=jnp.float32)
    d_params = llama.init_params(jax.random.PRNGKey(1), cfg_mod.TINY_DRAFT,
                                 dtype=jnp.float32)
    engine = Engine(TCFG, SPEC, t_params, draft_cfg=cfg_mod.TINY_DRAFT,
                    draft_params=d_params, prefill=PREFILL,
                    max_cache_len=PREFILL + 64, dtype=jnp.float32,
                    prefill_chunk=16, draft_prefill_chunk=8, donate=False,
                    kv_quant=True)
    ids = jax.random.randint(jax.random.PRNGKey(2), (1, PREFILL), 0,
                             TCFG.vocab_size)
    return engine, ids


def test_quant_retrieval_spec_decodes(quant_engine):
    engine, ids = quant_engine
    res = decoding.retrieval_spec(engine, ids, max_len=16, seed=3)
    assert len(res.tokens) >= 16
    assert all(0 <= t < TCFG.vocab_size for t in res.tokens)
    assert res.acceptance_rate > 0.2  # quantized middle still approximates


def test_quant_triforce_decodes(quant_engine):
    engine, ids = quant_engine
    res = decoding.triforce(engine, ids, max_len=16, seed=5)
    assert len(res.tokens) >= 16
    assert all(0 <= t < TCFG.vocab_size for t in res.tokens)


def test_quant_ar_matches_distribution_shape(quant_engine):
    engine, ids = quant_engine
    res = decoding.autoregressive(engine, ids, max_len=12, seed=1)
    assert len(res.tokens) == 13
