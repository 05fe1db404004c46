"""Model forward invariants on tiny configs (fp32 CPU).

The load-bearing oracle: chunked/incremental decoding through the cache must
produce the same logits as one full-sequence forward — this is what the
reference implicitly relies on for prefill chunking (graph_infer.py:31-37).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from triforce_tpu import config as cfg_mod
from triforce_tpu.cache import init_kv, init_streaming
from triforce_tpu.config import SpecConfig
from triforce_tpu.models import llama, rope

TINY = cfg_mod.TINY_TARGET
TINY_NOYARN = TINY.with_(rope=cfg_mod.RopeConfig(kind="llama"))


@pytest.fixture(scope="module")
def params():
    return llama.init_params(jax.random.PRNGKey(0), TINY, dtype=jnp.float32)


def test_incremental_decode_matches_full_forward(params):
    ids = jax.random.randint(jax.random.PRNGKey(1), (1, 12), 0,
                             TINY.vocab_size)
    kv_a = init_kv(TINY, max_len=32, dtype=jnp.float32)
    full_logits, kv_a, _ = llama.forward_append(TINY, params, ids, kv_a)

    kv_b = init_kv(TINY, max_len=32, dtype=jnp.float32)
    _, kv_b, _ = llama.forward_append(TINY, params, ids[:, :8], kv_b)
    last = None
    for i in range(8, 12):
        last, kv_b, _ = llama.forward_append(TINY, params, ids[:, i:i + 1],
                                             kv_b)
    np.testing.assert_allclose(np.asarray(last[0, 0]),
                               np.asarray(full_logits[0, -1]),
                               atol=1e-4, rtol=1e-4)
    assert int(kv_b.seq_len) == 12


def test_chunked_prefill_matches_full_forward(params):
    ids = jax.random.randint(jax.random.PRNGKey(2), (1, 16), 0,
                             TINY.vocab_size)
    kv_a = init_kv(TINY, max_len=32, dtype=jnp.float32)
    full_logits, _, _ = llama.forward_append(TINY, params, ids, kv_a)

    kv_b = init_kv(TINY, max_len=32, dtype=jnp.float32)
    logits = None
    for i in range(0, 16, 4):
        logits, kv_b, _ = llama.forward_append(TINY, params, ids[:, i:i + 4],
                                               kv_b)
    np.testing.assert_allclose(np.asarray(logits[0, -1]),
                               np.asarray(full_logits[0, -1]),
                               atol=1e-4, rtol=1e-4)


def test_junk_suffix_does_not_change_prefix_logits(params):
    """Causal masking: appending tokens never changes earlier positions'
    logits — the property the whole static-shape padding scheme rests on."""
    ids = jax.random.randint(jax.random.PRNGKey(3), (1, 6), 0,
                             TINY.vocab_size)
    junk = jnp.full((1, 3), 7, jnp.int32)
    kv = init_kv(TINY, max_len=32, dtype=jnp.float32)
    la, _, _ = llama.forward_append(TINY, params, ids, kv)
    kv = init_kv(TINY, max_len=32, dtype=jnp.float32)
    lb, _, _ = llama.forward_append(
        TINY, params, jnp.concatenate([ids, junk], axis=1), kv)
    np.testing.assert_allclose(np.asarray(la), np.asarray(lb[:, :6]),
                               atol=1e-5, rtol=1e-5)


def test_draft_incremental_matches_full(params=None):
    dcfg = cfg_mod.TINY_DRAFT
    dparams = llama.init_params(jax.random.PRNGKey(4), dcfg,
                                dtype=jnp.float32)
    spec = SpecConfig(gamma=3, draft_start_size=4, draft_recent_size=20)
    ids = jax.random.randint(jax.random.PRNGKey(5), (1, 10), 0,
                             dcfg.vocab_size)

    dkv_a = init_streaming(dcfg, spec, dtype=jnp.float32)
    full_logits, dkv_a = llama.draft_forward(dcfg, dparams, ids, dkv_a)

    dkv_b = init_streaming(dcfg, spec, dtype=jnp.float32)
    _, dkv_b = llama.draft_forward(dcfg, dparams, ids[:, :7], dkv_b)
    last = None
    for i in range(7, 10):
        last, dkv_b = llama.draft_forward(dcfg, dparams, ids[:, i:i + 1],
                                          dkv_b)
    np.testing.assert_allclose(np.asarray(last[0, 0]),
                               np.asarray(full_logits[0, -1]),
                               atol=1e-4, rtol=1e-4)


def test_yarn_tables_sane():
    cos, sin = rope.cos_sin_tables(TINY)
    m = rope.mscale_for(TINY.rope)
    assert m > 1.0  # scaling_factor 4 -> mscale ~1.138
    np.testing.assert_allclose(np.asarray(cos[0]), m, rtol=1e-6)
    np.testing.assert_allclose(np.asarray(sin[0]), 0.0, atol=1e-7)
    # YaRN inv_freq must lie between pure interpolation and extrapolation
    r = TINY.rope
    inv = rope.inv_freq_for(r, TINY.head_dim)
    base = r.theta ** (np.arange(0, TINY.head_dim, 2) / TINY.head_dim)
    extra, interp = 1.0 / base, 1.0 / (r.scaling_factor * base)
    assert (inv <= extra + 1e-9).all() and (inv >= interp - 1e-9).all()
    assert not np.allclose(inv, extra) and not np.allclose(inv, interp)


def test_rope_apply_inverse_consistency():
    """Rotating by position p then attending equals relative-position law:
    <rope(q,m), rope(k,n)> depends only on m-n (classic RoPE property)."""
    cfg = TINY_NOYARN
    cos, sin = rope.cos_sin_tables(cfg, max_len=64)
    q = jax.random.normal(jax.random.PRNGKey(6), (1, 1, 1, cfg.head_dim))
    k = jax.random.normal(jax.random.PRNGKey(7), (1, 1, 1, cfg.head_dim))
    def dot(m, n):
        qm = rope.apply_rope(q, cos, sin, jnp.asarray([m]))
        kn = rope.apply_rope(k, cos, sin, jnp.asarray([n]))
        return float(jnp.sum(qm * kn))
    np.testing.assert_allclose(dot(5, 3), dot(12, 10), rtol=1e-5)
    assert abs(dot(5, 3) - dot(10, 3)) > 1e-6


def test_rope_variants():
    """All five reference-validated rope_scaling kinds produce finite,
    distinct tables (config_yarn.py:184-193); yarn == ntk-by-parts up to
    the mscale attention factor; dynamic kinds resolve their factor from
    the table length."""
    import numpy as np
    from triforce_tpu.config import RopeConfig
    from triforce_tpu.models import rope as R

    base = dict(theta=10000.0, scaling_factor=4.0,
                original_max_position_embeddings=1024)
    tables = {}
    for kind in ("llama", "linear", "dynamic", "ntk-by-parts", "yarn",
                 "dynamic-yarn"):
        rc = RopeConfig(kind=kind, **base)
        cos, sin = R._cos_sin_tables_np(rc, 64, 4096)
        assert np.isfinite(cos).all() and np.isfinite(sin).all(), kind
        tables[kind] = cos

    # yarn = ntk-by-parts * mscale (same interpolation, extra attn scale)
    m = R.mscale_for(RopeConfig(kind="yarn", **base))
    assert m > 1.0
    np.testing.assert_allclose(tables["yarn"],
                               tables["ntk-by-parts"] * np.float32(m),
                               rtol=1e-5, atol=1e-5)
    # linear interpolation compresses positions by the factor
    np.testing.assert_allclose(tables["linear"][4], tables["llama"][1],
                               rtol=1e-5, atol=1e-5)
    # dynamic factor follows the table length: 4096/1024 = 4 == static 4.0
    rc_dyn = RopeConfig(kind="dynamic-yarn", **base)
    assert R._effective_scale(rc_dyn, 4096) == 4.0
    assert R._effective_scale(rc_dyn, 8192) == 8.0
    # kinds genuinely differ
    assert not np.allclose(tables["dynamic"], tables["llama"])
    assert not np.allclose(tables["yarn"], tables["llama"])


def test_dynamic_ntk_matches_hf_formula():
    """kind='dynamic' must use the HF dynamic-NTK base multiplier
    factor*seq/orig - (factor-1), not the bare seq/orig ratio (regression:
    the configured factor was dropped entirely)."""
    from triforce_tpu.config import RopeConfig
    from triforce_tpu.models import rope as rope_mod
    d, orig, factor, max_len = 64, 1024, 4.0, 4096
    rc = RopeConfig(kind="dynamic", theta=10000.0, scaling_factor=factor,
                    original_max_position_embeddings=orig)
    inv = rope_mod.inv_freq_for(rc, d, max_len)
    mult = factor * max_len / orig - (factor - 1.0)     # = 13, not 4
    base = 10000.0 * mult ** (d / (d - 2))
    want = 1.0 / base ** (np.arange(0, d, 2, dtype=np.float32) / d)
    np.testing.assert_allclose(np.asarray(inv), want, rtol=1e-6)


def test_config_from_hf_rope_type_key_and_drafter_slots():
    """Modern HF configs serialize rope_scaling under 'rope_type'; drafter
    loads must set rope_on_slots (no HF field encodes it)."""
    from triforce_tpu.models import hf as hf_mod
    base = dict(vocab_size=128, hidden_size=64, intermediate_size=128,
                num_hidden_layers=2, num_attention_heads=4,
                max_position_embeddings=8192, rope_theta=10000.0)
    cfg = hf_mod.config_from_hf(
        dict(base, rope_scaling={"rope_type": "yarn", "factor": 32.0,
                                 "original_max_position_embeddings": 4096}))
    assert cfg.rope.kind == "yarn" and cfg.rope.scaling_factor == 32.0
    dcfg = hf_mod.config_from_hf(dict(base), rope_on_slots=True)
    assert dcfg.rope_on_slots
