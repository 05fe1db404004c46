"""Tensor-parallel sharding over a virtual 8-device mesh (SURVEY.md §4):
GSPMD must reproduce the single-device math — this replaces the reference's
hand-written NCCL tower (models/TP_llama.py, models/tensor_op.py), which it
can only test on real multi-GPU rigs.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from triforce_tpu import config as cfg_mod
from triforce_tpu.config import SpecConfig, RopeConfig, ModelConfig
from triforce_tpu.cache import init_kv
from triforce_tpu.engine import Engine
from triforce_tpu.models import llama
from triforce_tpu.parallel import mesh as mesh_mod
from triforce_tpu.parallel import sharding as shard_mod

# 8 KV heads so tp=8 shards them exactly like the reference's
# num_kv_heads // world_size split (cache.py:278)
TP8_CFG = ModelConfig(
    vocab_size=199, hidden_size=64, intermediate_size=128, num_layers=2,
    num_heads=8, num_kv_heads=8, head_dim=8, max_position_embeddings=4096,
    rms_norm_eps=1e-5, rope=RopeConfig(kind="llama"))

pytestmark = pytest.mark.skipif(len(jax.devices()) < 8,
                                reason="needs 8 (virtual) devices")


def test_tp_forward_matches_single_device():
    params = llama.init_params(jax.random.PRNGKey(0), TP8_CFG,
                               dtype=jnp.float32)
    ids = jax.random.randint(jax.random.PRNGKey(1), (1, 16), 0,
                             TP8_CFG.vocab_size)
    kv = init_kv(TP8_CFG, max_len=32, dtype=jnp.float32)
    ref_logits, ref_kv, _ = llama.forward_append(TP8_CFG, params, ids, kv)

    m = mesh_mod.make_mesh(tp=8)
    sparams = shard_mod.shard_params(params, m, TP8_CFG)
    from triforce_tpu.cache import KVCache
    kv_sh = shard_mod.kv_shardings(m, TP8_CFG)
    kv2 = jax.device_put(
        init_kv(TP8_CFG, max_len=32, dtype=jnp.float32),
        KVCache(k=kv_sh, v=kv_sh, seq_len=mesh_mod.named(m)))

    logits, kv_out, _ = jax.jit(
        lambda p, i, c: llama.forward_append(TP8_CFG, p, i, c)
    )(sparams, ids, kv2)

    np.testing.assert_allclose(np.asarray(logits), np.asarray(ref_logits),
                               atol=1e-3, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(kv_out.k), np.asarray(ref_kv.k),
                               atol=1e-4, rtol=1e-4)


def test_tp_triforce_step_runs_sharded():
    """Whole fused TriForce step under tp=8: state sharded per
    state_shardings, one step executes and produces sane stats."""
    spec = SpecConfig(gamma=3, budget=16, chunk_size=4, draft_start_size=4,
                      draft_recent_size=12, temperature=0.8, top_p=0.9)
    prefill = 32
    t_params = llama.init_params(jax.random.PRNGKey(0), TP8_CFG,
                                 dtype=jnp.float32)
    d_params = llama.init_params(jax.random.PRNGKey(1), cfg_mod.TINY_DRAFT,
                                 dtype=jnp.float32)
    m = mesh_mod.make_mesh(tp=8)
    engine = Engine(TP8_CFG, spec, t_params, draft_cfg=cfg_mod.TINY_DRAFT,
                    draft_params=d_params, prefill=prefill,
                    max_cache_len=prefill + 32, dtype=jnp.float32,
                    prefill_chunk=16, draft_prefill_chunk=8, donate=False)
    ids = jax.random.randint(jax.random.PRNGKey(2), (1, prefill), 0,
                             TP8_CFG.vocab_size)

    engine.t_params = shard_mod.shard_params(t_params, m, TP8_CFG)
    state = engine.init_state(jax.random.PRNGKey(7))
    st_sh = shard_mod.state_shardings(m, TP8_CFG, cfg_mod.TINY_DRAFT)
    state = jax.device_put(state, st_sh)
    state = engine.prefill_target(state, ids)
    state = engine.prefill_draft(state, ids)
    new_state, stats = engine.triforce_step(state)

    assert int(stats.gamma2) in (spec.gamma, spec.gamma + 1)
    toks = np.asarray(stats.tokens)[:int(stats.n_emitted)]
    assert ((0 <= toks) & (toks < TP8_CFG.vocab_size)).all()
    assert int(new_state.kv.seq_len) == int(state.kv.seq_len) + \
        int(stats.accepted) + 1


@pytest.mark.parametrize("tp,sp,quant", [(1, 8, False), (2, 4, False),
                                         (2, 4, True), (8, 1, False)])
def test_sharded_triforce_tokens_match_single_device(tp, sp, quant):
    """The WHOLE fused TriForce step under a (tp, sp) mesh must emit the
    same tokens as the single-device engine: sequence-sharding the full
    cache (the reference's offloading replacement, SURVEY.md §5.7) is
    an implementation detail, not a model change."""
    spec = SpecConfig(gamma=3, budget=16, chunk_size=4, draft_start_size=4,
                      draft_recent_size=12, temperature=0.2, top_p=0.9)
    prefill = 32
    t_params = llama.init_params(jax.random.PRNGKey(0), TP8_CFG,
                                 dtype=jnp.float32)
    d_params = llama.init_params(jax.random.PRNGKey(1), cfg_mod.TINY_DRAFT,
                                 dtype=jnp.float32)
    ids = jax.random.randint(jax.random.PRNGKey(2), (1, prefill), 0,
                             TP8_CFG.vocab_size)

    def run(mesh, shard_seq):
        engine = Engine(TP8_CFG, spec, t_params, draft_cfg=cfg_mod.TINY_DRAFT,
                        draft_params=d_params, prefill=prefill,
                        max_cache_len=prefill + 32, dtype=jnp.float32,
                        prefill_chunk=16, draft_prefill_chunk=8,
                        donate=False, mesh=mesh, shard_seq=shard_seq,
                        kv_quant=quant)
        state = engine.init_state(jax.random.PRNGKey(7))
        state = engine.prefill_target(state, ids)
        state = engine.prefill_draft(state, ids)
        toks = []
        for _ in range(3):
            state, stats = engine.triforce_step(state)
            toks += list(np.asarray(stats.tokens)[:int(stats.n_emitted)])
        return toks

    ref = run(None, False)
    m = mesh_mod.make_mesh(tp=tp, sp=sp)
    got = run(m, shard_seq=sp > 1)
    assert got == ref


def test_sharded_generate_retrieval_runs():
    """Whole-generation lax.while_loop under an sp mesh (one dispatch)."""
    spec = SpecConfig(gamma=3, budget=16, chunk_size=4, draft_start_size=4,
                      draft_recent_size=12, temperature=0.6, top_p=0.9)
    prefill = 32
    t_params = llama.init_params(jax.random.PRNGKey(0), TP8_CFG,
                                 dtype=jnp.float32)
    m = mesh_mod.make_mesh(tp=2, sp=4)
    engine = Engine(TP8_CFG, spec, t_params, prefill=prefill,
                    max_cache_len=prefill + 32, dtype=jnp.float32,
                    prefill_chunk=16, donate=False, mesh=m, shard_seq=True)
    ids = jax.random.randint(jax.random.PRNGKey(2), (1, prefill), 0,
                             TP8_CFG.vocab_size)
    state = engine.init_state(jax.random.PRNGKey(7))
    state = engine.prefill_target(state, ids)
    state, buf, n, counters, _ = engine.generate(state, 8, mode="retrieval")
    assert int(n) >= 8
    toks = np.asarray(buf)[:int(n)]
    assert ((0 <= toks) & (toks < TP8_CFG.vocab_size)).all()


def test_sharded_forward_uses_stacked_zero_copy_path(monkeypatch):
    """The mesh'd target forward must hand the WHOLE stacked cache + a
    layer index to the sharded attention wrapper (zero-copy addressing on
    the kernel path) — NOT per-layer slab scan-xs, whose sliced operands
    XLA materialises as an HBM->HBM copy per layer (probes/_r2_scanxs.py,
    VERDICT r2 weak#5)."""
    from triforce_tpu.ops import sp_attention

    calls = []
    real = sp_attention.append_attention_sharded

    def spy(mesh, q, k_cache, v_cache, k_new, v_new, **kw):
        calls.append((k_cache.ndim, kw.get("layer") is not None))
        return real(mesh, q, k_cache, v_cache, k_new, v_new, **kw)

    monkeypatch.setattr("triforce_tpu.models.llama.append_attention_sharded",
                        spy)
    mesh = mesh_mod.make_mesh(tp=2, sp=4)
    params = llama.init_params(jax.random.PRNGKey(0), TP8_CFG,
                               dtype=jnp.float32)
    params = shard_mod.shard_params(params, mesh, TP8_CFG)
    kv = init_kv(TP8_CFG, 64, dtype=jnp.float32)
    kv = jax.device_put(kv, shard_mod.state_shardings(
        mesh, TP8_CFG, None, shard_seq=True).kv)
    ids = jax.random.randint(jax.random.PRNGKey(1), (1, 8), 0,
                             TP8_CFG.vocab_size)
    logits, kv, _ = llama.forward_append(TP8_CFG, params, ids, kv,
                                         mesh=mesh, shard_seq=True)
    assert calls, "sharded forward never reached the attention wrapper"
    assert all(ndim == 5 and has_layer for ndim, has_layer in calls), calls

    # the retrieval (middle) forward too
    from triforce_tpu.cache import init_retrieval
    calls.clear()
    spec = SpecConfig(gamma=2, budget=16, chunk_size=4)
    rkv = init_retrieval(TP8_CFG, spec, dtype=jnp.float32)
    rkv = jax.device_put(rkv, shard_mod.state_shardings(
        mesh, TP8_CFG, None, shard_seq=True).rkv)
    tok = jnp.zeros((1, spec.gamma + 1), jnp.int32)
    llama.forward_spec(TP8_CFG, params, tok, rkv, kv.seq_len, spec.budget,
                       commit=False, mesh=mesh)
    assert calls and all(n == 5 and h for n, h in calls), calls
