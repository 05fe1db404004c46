"""Profiling utilities: phase timers and planner measurement inputs."""

import jax
import jax.numpy as jnp
import numpy as np

from triforce_tpu import config as cfg_mod, profiling
from triforce_tpu.config import SpecConfig
from triforce_tpu.engine import Engine
from triforce_tpu.models import llama

TCFG = cfg_mod.TINY_TARGET
SPEC = SpecConfig(gamma=3, budget=16, chunk_size=4, draft_start_size=4,
                  draft_recent_size=12, temperature=0.8, top_p=0.9)


def test_timer_spans():
    t = profiling.Timer()
    with t.span("a"):
        pass
    with t.span("a"):
        pass
    rep = t.report()
    assert rep["a"]["count"] == 2
    assert rep["a"]["total_s"] >= 0
    assert "a" in t.pretty()


def test_measure_phase_times_tiny():
    params = llama.init_params(jax.random.PRNGKey(0), TCFG, dtype=jnp.float32)
    eng = Engine(TCFG, SPEC, params, prefill=32, max_cache_len=96,
                 dtype=jnp.float32, prefill_chunk=16, donate=False)
    ids = jax.random.randint(jax.random.PRNGKey(1), (1, 32), 0,
                             TCFG.vocab_size)
    state = eng.init_state(jax.random.PRNGKey(2))
    state = eng.prefill_target(state, ids)
    times = profiling.measure_phase_times(eng, state, iters=2)
    for k in ("target_verify", "middle_step", "ar_step", "retrieval_build"):
        assert k in times and times[k] > 0


def test_planner_cli_roundtrip(tmp_path):
    import json
    from triforce_tpu.tree import planner
    cfgp = tmp_path / "cfg.json"
    dst = str(tmp_path / "gm.json")
    json.dump({"acceptance_rate": 0.8, "max_branch": 3, "max_depth": 6,
               "valid_budget": [8, 12], "target_time": [0.1, 0.12],
               "draft_time": 0.01, "max_budget": 12, "dst": dst},
              open(cfgp, "w"))
    planner.main(["--config", str(cfgp)])
    gm = planner.GrowMap.load(dst)
    assert gm.size >= 2


def test_measure_acceptance_vector_fused():
    """The acceptance-vector measurement (one scanned device program) must
    return a valid planner vector: p[0] == 0, entries in [0, 1], total
    acceptance <= 1, deterministic under the same seed."""
    params = llama.init_params(jax.random.PRNGKey(0), TCFG, dtype=jnp.float32)

    def mk():
        return Engine(TCFG, SPEC, params, prefill=32, max_cache_len=256,
                      dtype=jnp.float32, prefill_chunk=16, donate=False)
    ids = jax.random.randint(jax.random.PRNGKey(1), (1, 32), 0,
                             TCFG.vocab_size)
    p1 = profiling.measure_acceptance_vector(mk(), ids, max_branch=3,
                                             steps=12, seed=5)
    p2 = profiling.measure_acceptance_vector(mk(), ids, max_branch=3,
                                             steps=12, seed=5)
    np.testing.assert_array_equal(p1, p2)
    assert p1.shape == (4,)
    assert p1[0] == 0.0
    assert (p1 >= 0).all() and p1.sum() <= 1.0 + 1e-6
    assert p1[1] > 0  # the first candidate accepts sometimes
