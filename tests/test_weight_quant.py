"""INT8 weight-only quantization must be quality-neutral: per-channel
scales keep logits close to bf16/f32 and the greedy token identical almost
everywhere (beyond-reference feature; VERDICT round 1 item 8)."""

import jax
import jax.numpy as jnp
import numpy as np

from triforce_tpu import config as C
from triforce_tpu.cache import init_kv
from triforce_tpu.config import SpecConfig
from triforce_tpu.engine import Engine
from triforce_tpu.models import llama

CFG = C.TINY_TARGET


def test_quantized_logits_close():
    params = llama.init_params(jax.random.PRNGKey(0), CFG, dtype=jnp.float32)
    qparams = llama.quantize_weights(params)
    assert qparams["layers"]["wq"].dtype == jnp.int8
    assert qparams["lm_head"].dtype == jnp.int8

    ids = jax.random.randint(jax.random.PRNGKey(1), (1, 24), 0,
                             CFG.vocab_size)
    kv0 = init_kv(CFG, max_len=32, dtype=jnp.float32)
    ref, _, _ = llama.forward_append(CFG, params, ids, kv0)
    kv1 = init_kv(CFG, max_len=32, dtype=jnp.float32)
    got, _, _ = llama.forward_append(CFG, qparams, ids, kv1)

    ref, got = np.asarray(ref[0]), np.asarray(got[0])
    # per-position softmax distributions stay close
    def sm(x):
        e = np.exp(x - x.max(-1, keepdims=True))
        return e / e.sum(-1, keepdims=True)
    tv = 0.5 * np.abs(sm(ref) - sm(got)).sum(-1)   # total variation per pos
    assert tv.mean() < 0.05, tv.mean()
    # greedy tokens nearly always identical
    agree = (ref.argmax(-1) == got.argmax(-1)).mean()
    assert agree >= 0.9, agree


def test_dequant_weights_bitwise_identical():
    """dequant_weights pre-converts int8 codes exactly (int8->float is
    lossless) and keeps the output-side scales, so forwards over the result
    are BITWISE identical to the fused-convert int8 path — the wide-forward
    speed fix (tree grow / prefill scans) must not change numerics."""
    params = llama.init_params(jax.random.PRNGKey(0), CFG, dtype=jnp.float32)
    qparams = llama.quantize_weights(params)
    dparams = llama.dequant_weights(qparams, dtype=jnp.float32)
    assert dparams["layers"]["wq"].dtype == jnp.float32
    assert "wq_scale" in dparams["layers"]
    assert dparams["lm_head"].dtype == jnp.float32

    ids = jax.random.randint(jax.random.PRNGKey(1), (1, 24), 0,
                             CFG.vocab_size)
    kv0 = init_kv(CFG, max_len=32, dtype=jnp.float32)
    ref, kv_ref, _ = llama.forward_append(CFG, qparams, ids, kv0)
    kv1 = init_kv(CFG, max_len=32, dtype=jnp.float32)
    got, kv_got, _ = llama.forward_append(CFG, dparams, ids, kv1)
    np.testing.assert_array_equal(np.asarray(ref), np.asarray(got))
    np.testing.assert_array_equal(np.asarray(kv_ref.k), np.asarray(kv_got.k))

    # non-quantized params pass through dequant_weights unchanged
    same = llama.dequant_weights(params, dtype=jnp.float32)
    assert same["layers"]["wq"] is params["layers"]["wq"]


def test_engine_weight_quant_decodes():
    spec = SpecConfig(gamma=3, budget=16, chunk_size=4, draft_start_size=4,
                      draft_recent_size=12, temperature=0.6, top_p=0.9)
    params = llama.init_params(jax.random.PRNGKey(0), CFG, dtype=jnp.float32)
    eng = Engine(CFG, spec, params, prefill=32, max_cache_len=96,
                 dtype=jnp.float32, prefill_chunk=16, donate=False,
                 kv_quant=True, weight_quant=True)
    ids = jax.random.randint(jax.random.PRNGKey(2), (1, 32), 0,
                             CFG.vocab_size)
    st = eng.init_state(jax.random.PRNGKey(7))
    st = eng.prefill_target(st, ids)
    st, buf, n, counters, _ = eng.generate(st, 16, mode="retrieval")
    toks = np.asarray(buf)[:int(n)]
    assert int(n) >= 16
    assert ((0 <= toks) & (toks < CFG.vocab_size)).all()


def test_weight_quant_sharded():
    """int8 weights + scale planes under a tp mesh."""
    import pytest
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 devices")
    from triforce_tpu.parallel import mesh as mesh_mod
    cfg8 = CFG.with_(num_heads=8, num_kv_heads=8, head_dim=8, hidden_size=64)
    params = llama.init_params(jax.random.PRNGKey(0), cfg8,
                               dtype=jnp.float32)
    qparams = llama.quantize_weights(params)
    ids = jax.random.randint(jax.random.PRNGKey(1), (1, 16), 0,
                             cfg8.vocab_size)
    kv0 = init_kv(cfg8, max_len=32, dtype=jnp.float32)
    ref, _, _ = llama.forward_append(cfg8, qparams, ids, kv0)

    m = mesh_mod.make_mesh(tp=8)
    from triforce_tpu.parallel import sharding as shard_mod
    sq = shard_mod.shard_params(qparams, m, cfg8)
    kv1 = init_kv(cfg8, max_len=32, dtype=jnp.float32)
    got, _, _ = jax.jit(lambda p, i, c: llama.forward_append(
        cfg8, p, i, c, mesh=m))(sq, ids, kv1)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=2e-3, rtol=2e-3)


def test_engine_weight_quant_quantizes_drafter_and_decodes():
    """weight_quant must also quantize the DRAFTER (at middle_chain=k the
    drafter streams its weights k times per step) and the 3-level hierarchy
    must still decode."""
    import jax
    import jax.numpy as jnp
    from triforce_tpu import config as C
    from triforce_tpu.config import SpecConfig
    from triforce_tpu.engine import Engine
    from triforce_tpu.models import llama

    tcfg, dcfg = C.TINY_TARGET, C.TINY_DRAFT
    spec = SpecConfig(gamma=3, budget=16, chunk_size=4, draft_start_size=4,
                      draft_recent_size=12, middle_chain=3)
    t = llama.init_params(jax.random.PRNGKey(0), tcfg, dtype=jnp.float32)
    d = llama.init_params(jax.random.PRNGKey(1), dcfg, dtype=jnp.float32)
    eng = Engine(tcfg, spec, t, draft_cfg=dcfg, draft_params=d, prefill=32,
                 max_cache_len=96, dtype=jnp.float32, prefill_chunk=16,
                 draft_prefill_chunk=8, weight_quant=True, donate=False)
    assert eng.d_params["layers"]["wq"].dtype == jnp.int8
    assert "wq_scale" in eng.d_params["layers"]
    ids = jax.random.randint(jax.random.PRNGKey(2), (1, 32), 0,
                             tcfg.vocab_size)
    st = eng.init_state(jax.random.PRNGKey(3))
    st = eng.prefill_target(st, ids)
    st = eng.prefill_draft(st, ids)
    st, stats = eng.triforce_step(st)
    assert int(stats.n_emitted) >= 1


def test_act_quant_matmul_close_to_exact():
    """The int8 x int8 activation-quantized matmul (llama._wmm aq=True) must
    track the exact weight-only path within per-token activation rounding
    error (~1/127 relative) — it feeds PROPOSAL forwards only (tree grow),
    so closeness, not equality, is the contract."""
    import numpy as np
    key = jax.random.PRNGKey(3)
    x = jax.random.normal(key, (1, 78, 64), jnp.float32)
    w = jax.random.normal(jax.random.PRNGKey(4), (64, 128), jnp.float32) * 0.1
    wf = np.asarray(w, np.float32)
    s = np.maximum(np.abs(wf).max(axis=0) / 127.0, 1e-8)
    lp = {"w": jnp.asarray(np.clip(np.round(wf / s), -127, 127), jnp.int8),
          "w_scale": jnp.asarray(s, jnp.float32)}
    exact = llama._wmm(x, "bth,hd->btd", lp, "w")
    aq = llama._wmm(x, "bth,hd->btd", lp, "w", aq=True)
    err = float(jnp.max(jnp.abs(aq - exact)))
    ref = float(jnp.max(jnp.abs(exact)))
    assert err < 0.03 * ref, (err, ref)
    # int8 codes dotted with int8 codes must accumulate in int32 exactly:
    # a one-hot activation row recovers a dequantized weight row exactly
    onehot = jnp.zeros((1, 1, 64), jnp.float32).at[0, 0, 7].set(1.0)
    got = llama._wmm(onehot, "bth,hd->btd", lp, "w", aq=True)[0, 0]
    want = lp["w"][7].astype(jnp.float32) * lp["w_scale"]
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-6)


def test_tree_grow_act_quant_proposals_track_exact():
    """forward_tree_spec(act_quant=True) proposal logits must stay close to
    the exact path's (same committed tree KV semantics, bounded rounding
    drift) — grow is a proposal distribution, so the outer test absorbs the
    shift, but a large divergence would indicate a wiring bug, not
    rounding."""
    import numpy as np
    from triforce_tpu.cache import init_tree_retrieval
    from triforce_tpu import config as C
    cfg = C.TINY_TARGET
    params = llama.quantize_weights(
        llama.init_params(jax.random.PRNGKey(0), cfg, dtype=jnp.float32))
    from triforce_tpu.cache import init_kv
    kv = init_kv(cfg, 64, dtype=jnp.float32)
    ids = jax.random.randint(jax.random.PRNGKey(1), (1, 32), 0,
                             cfg.vocab_size)
    _, kv, _ = llama.forward_append(cfg, params, ids, kv)
    rkv = init_tree_retrieval(cfg, budget=16, tree_size=8,
                              dtype=jnp.float32)
    tok = jnp.asarray([[5]], jnp.int32)
    kw = dict(depths=np.zeros(1, np.int32),
              ancestor_mask=np.zeros((1, 8), bool), slot_start=0,
              budget=16, kv_seq_len=kv.seq_len)
    exact, _, _ = llama.forward_tree_spec(cfg, params, tok, rkv, **kw)
    aq, _, _ = llama.forward_tree_spec(cfg, params, tok, rkv, **kw,
                                       act_quant=True)
    err = float(jnp.max(jnp.abs(aq - exact)))
    ref = float(jnp.max(jnp.abs(exact))) + 1e-9
    assert err < 0.05 * ref, (err, ref)


def test_mid_act_quant_flat_and_batched():
    """mid_act_quant (int8 x int8 middle verify): the engine decodes, the
    middle p_rows stay a valid proposal distribution (outer test exact),
    and batched rows still equal their single-sequence runs bit-for-bit."""
    import dataclasses
    import jax
    import jax.numpy as jnp
    import numpy as np
    from triforce_tpu import config as C
    from triforce_tpu.config import SpecConfig
    from triforce_tpu.engine import Engine
    from triforce_tpu.models import llama
    from triforce_tpu.batched_spec import BatchedSpecEngine, stack_states

    spec = SpecConfig(gamma=3, budget=16, chunk_size=4, draft_start_size=4,
                      draft_recent_size=12, temperature=0.7, top_p=0.9,
                      middle_chain=2, middle_trips=2, mid_act_quant=True)
    tcfg, dcfg = C.TINY_TARGET, C.TINY_DRAFT
    t = llama.quantize_weights(
        llama.init_params(jax.random.PRNGKey(0), tcfg, jnp.float32))
    d = llama.quantize_weights(
        llama.init_params(jax.random.PRNGKey(1), dcfg, jnp.float32))
    eng = Engine(tcfg, spec, t, draft_cfg=dcfg, draft_params=d, prefill=32,
                 max_cache_len=32 + 32, dtype=jnp.float32, prefill_chunk=16,
                 draft_prefill_chunk=8, donate=False)
    ids = jax.random.randint(jax.random.PRNGKey(7), (1, 32), 0,
                             tcfg.vocab_size)
    sts, streams = [], []
    for seed in (11, 22):
        st = eng.init_state(jax.random.PRNGKey(seed))
        st = eng.prefill_target(st, ids)
        st = eng.prefill_draft(st, ids)
        sts.append(st)
        toks = []
        for _ in range(3):
            st, stats = eng.triforce_step(st)
            n = int(stats.n_emitted)
            assert 1 <= n <= spec.gamma + 2
            toks.extend(np.asarray(stats.tokens)[:n].tolist())
        streams.append(toks)
    bat = BatchedSpecEngine(eng, mode="triforce", donate=False)
    bst = stack_states(sts)
    got = [[], []]
    for _ in range(3):
        bst, stats = bat.step(bst)
        for r in range(2):
            got[r].extend(np.asarray(
                stats.tokens[r])[: int(stats.n_emitted[r])].tolist())
    assert got[0] == streams[0] and got[1] == streams[1]
