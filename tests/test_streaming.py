"""StreamingLLM drafter cache choreography (reference: cache.py:200-265 +
modeling_llama_68m.py:151-178) — the trickiest state machine per SURVEY §7.3.
"""

import jax
import jax.numpy as jnp
import numpy as np

from triforce_tpu import config as cfg_mod
from triforce_tpu.cache import (init_streaming, streaming_evict_prefill,
                                streaming_evict_for_spec)
from triforce_tpu.config import SpecConfig
from triforce_tpu.models import llama

DCFG = cfg_mod.TINY_DRAFT
SPEC = SpecConfig(gamma=3, draft_start_size=4, draft_recent_size=12)


def test_evict_prefill_slides_window():
    spec = SPEC
    cache = init_streaming(DCFG, spec, dtype=jnp.float32)
    # fill slots 0..15 with identifiable values (slot index in k[..., 0])
    marks = jnp.arange(cache.real_budget, dtype=jnp.float32)
    k = cache.k + marks[None, None, None, :, None]
    cache = cache.replace(k=k, v=k, seq_len=jnp.asarray(16, jnp.int32))

    # incoming 8 > cap(16) - 16 -> evict: keep last recent-8=4 at slots 4..7
    out = streaming_evict_prefill(cache, spec, 8)
    assert int(out.seq_len) == 4 + 12 - 8  # start + recent - incoming = 8
    got = np.asarray(out.k[0, 0, 0, :, 0])
    # sink slots 0..3 unchanged
    np.testing.assert_array_equal(got[:4], [0, 1, 2, 3])
    # slots 4..7 = old slots seq_len-4..seq_len = 12..15
    np.testing.assert_array_equal(got[4:8], [12, 13, 14, 15])


def test_evict_prefill_noop_when_fits():
    cache = init_streaming(DCFG, SPEC, dtype=jnp.float32)
    cache = cache.replace(seq_len=jnp.asarray(4, jnp.int32))
    out = streaming_evict_prefill(cache, SPEC, 8)
    assert int(out.seq_len) == 4


def test_evict_for_spec_compacts_accepted():
    spec = SPEC
    cache = init_streaming(DCFG, spec, dtype=jnp.float32)
    marks = jnp.arange(cache.real_budget, dtype=jnp.float32)
    cache = cache.replace(k=cache.k + marks[None, None, None, :, None],
                          v=cache.v + marks[None, None, None, :, None])
    count = jnp.asarray(2, jnp.int32)
    out = streaming_evict_for_spec(cache, spec, count)
    got = np.asarray(out.k[0, 0, 0, :, 0])
    # window [start, start+recent) <- slots [start+count, start+recent+count)
    np.testing.assert_array_equal(got[:4], [0, 1, 2, 3])         # sink
    np.testing.assert_array_equal(got[4:16], np.arange(6, 18))   # shifted by 2
    # spec slots beyond window untouched
    np.testing.assert_array_equal(got[16:], np.arange(16, 22))


def test_draft_spec_equals_append_when_window_full():
    """When the prefill exactly fills start+recent, a gamma_offset-0 spec
    step writes the same slot with the same position as an append would —
    logits must agree. This pins the fixed-slot/slot-position semantics."""
    dparams = llama.init_params(jax.random.PRNGKey(0), DCFG,
                                dtype=jnp.float32)
    spec = SPEC
    cap = spec.draft_start_size + spec.draft_recent_size  # 16
    ids = jax.random.randint(jax.random.PRNGKey(1), (1, cap), 0,
                             DCFG.vocab_size)
    dkv = init_streaming(DCFG, spec, dtype=jnp.float32)
    _, dkv = llama.draft_forward(DCFG, dparams, ids, dkv)
    assert int(dkv.seq_len) == cap

    tok = jnp.asarray([[5]], jnp.int32)
    # append path
    la, _ = llama.draft_forward(DCFG, dparams, tok, dkv)
    # spec path at gamma offset 0: fixed-width gamma+1 input, junk suffix
    spec_in = jnp.full((1, spec.gamma + 1), 99, jnp.int32).at[0, 0].set(5)
    ls, _ = llama.draft_forward_spec(DCFG, dparams, spec_in, dkv, spec)
    np.testing.assert_allclose(np.asarray(ls[0, 0]), np.asarray(la[0, -1]),
                               atol=1e-4, rtol=1e-4)


def test_draft_spec_junk_suffix_inert():
    """Changing junk tokens beyond the live prefix must not change the live
    rows' logits (what makes ONE compiled program replace gamma+3 graphs)."""
    dparams = llama.init_params(jax.random.PRNGKey(0), DCFG,
                                dtype=jnp.float32)
    spec = SPEC
    cap = spec.draft_start_size + spec.draft_recent_size
    ids = jax.random.randint(jax.random.PRNGKey(1), (1, cap), 0,
                             DCFG.vocab_size)
    dkv = init_streaming(DCFG, spec, dtype=jnp.float32)
    _, dkv = llama.draft_forward(DCFG, dparams, ids, dkv)

    a = jnp.asarray([[7, 11, 99, 99]], jnp.int32)
    b = jnp.asarray([[7, 11, 3, 140]], jnp.int32)
    la, _ = llama.draft_forward_spec(DCFG, dparams, a, dkv, spec)
    lb, _ = llama.draft_forward_spec(DCFG, dparams, b, dkv, spec)
    np.testing.assert_allclose(np.asarray(la[0, :2]), np.asarray(lb[0, :2]),
                               atol=1e-5)
