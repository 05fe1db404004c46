"""End-to-end TriForce hierarchy tests on tiny models, including the
losslessness oracle: the marginal distribution of the first emitted token of
a speculation step must equal the target model's own (top-p filtered)
conditional — the property the reference only argues by construction
(SURVEY.md §4).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from triforce_tpu import config as cfg_mod
from triforce_tpu.config import SpecConfig
from triforce_tpu.engine import Engine, JUNK_TOKEN
from triforce_tpu import decoding
from triforce_tpu.models import llama
from triforce_tpu.ops import sampling

TCFG = cfg_mod.TINY_TARGET
DCFG = cfg_mod.TINY_DRAFT
SPEC = SpecConfig(gamma=3, budget=16, chunk_size=4, draft_start_size=4,
                  draft_recent_size=12, temperature=0.8, top_p=0.9)
PREFILL = 32


@pytest.fixture(scope="module")
def setup():
    t_params = llama.init_params(jax.random.PRNGKey(0), TCFG,
                                 dtype=jnp.float32)
    d_params = llama.init_params(jax.random.PRNGKey(1), DCFG,
                                 dtype=jnp.float32)
    engine = Engine(TCFG, SPEC, t_params, draft_cfg=DCFG,
                    draft_params=d_params, prefill=PREFILL,
                    max_cache_len=PREFILL + 64, dtype=jnp.float32,
                    prefill_chunk=16, draft_prefill_chunk=8, donate=False)
    ids = jax.random.randint(jax.random.PRNGKey(2), (1, PREFILL), 0,
                             TCFG.vocab_size)
    return engine, ids, t_params


def test_triforce_generates(setup):
    engine, ids, _ = setup
    res = decoding.triforce(engine, ids, max_len=24, seed=7)
    assert res.steps >= 1
    assert len(res.tokens) >= 24
    assert all(0 <= t < TCFG.vocab_size for t in res.tokens)
    assert 0.0 <= res.acceptance_rate <= 1.0
    # every step proposes gamma or gamma+1 middle tokens
    assert res.avg_tokens_per_step >= 1.0


def test_retrieval_spec_generates(setup):
    engine, ids, _ = setup
    res = decoding.retrieval_spec(engine, ids, max_len=16, seed=3)
    assert len(res.tokens) >= 16
    assert all(0 <= t < TCFG.vocab_size for t in res.tokens)


def test_autoregressive_baseline(setup):
    engine, ids, _ = setup
    res = decoding.autoregressive(engine, ids, max_len=8, seed=5)
    assert res.steps == 8


def test_deterministic_given_key(setup):
    engine, ids, _ = setup
    r1 = decoding.triforce(engine, ids, max_len=16, seed=11)
    r2 = decoding.triforce(engine, ids, max_len=16, seed=11)
    assert r1.tokens == r2.tokens


def _first_token_distribution(engine, state, step_fn, n_runs, seed0):
    counts = np.zeros(engine.target_cfg.vocab_size, np.int64)
    for i in range(n_runs):
        s = state.replace(key=jax.random.PRNGKey(seed0 + i))
        _, stats = step_fn(s)
        counts[int(np.asarray(stats.tokens)[0])] += 1
    return counts / n_runs


@pytest.mark.parametrize("mode", ["retrieval_spec", "triforce"])
def test_lossless_first_token_marginal(setup, mode):
    """Empirical marginal of the first token a speculation step emits must
    match the target's top-p-filtered conditional: q(t)min(1,p/q) summed with
    the rejection-residual path equals p(t) exactly (Leviathan et al.), for
    ANY proposal q — including our middle model. TV distance ~ O(sqrt(V/N))
    under the null; we assert a loose bound that still catches real bugs
    (dropping the residual, wrong row indexing, biased accept test).
    """
    engine, ids, t_params = setup
    state = engine.init_state(jax.random.PRNGKey(100))
    state = engine.prefill_target(state, ids)
    if mode == "triforce":
        state = engine.prefill_draft(state, ids)
        step_fn = engine.triforce_step
    else:
        step_fn = engine.retrieval_spec_step

    # ground truth: target conditional given prefix + next_token
    logits, kv2, _ = llama.forward_append(
        TCFG, t_params, state.next_token[None].astype(jnp.int32), state.kv)
    p_true = np.asarray(sampling.norm_logits(
        logits[0, -1][None], SPEC.temperature, SPEC.top_k, SPEC.top_p)[0])

    n_runs = 1500
    emp = _first_token_distribution(engine, state, step_fn, n_runs, 10_000)
    tv = 0.5 * np.abs(emp - p_true).sum()
    # under H0 (multinomial sampling noise), E[TV] = 0.5 * sum_t E|emp_t-p_t|
    # ~ 0.5 * sum_t sqrt(2 p_t (1-p_t) / (pi N)). Bound at 1.5x the null
    # expectation (calibrated: engine measured at 0.97x null with N=4000).
    null_tv = 0.5 * np.sqrt(2 * p_true * (1 - p_true) / (np.pi * n_runs)).sum()
    assert tv < 1.5 * null_tv, (
        f"TV {tv:.4f} vs null expectation {null_tv:.4f} — spec decoding biased")
    # support check: emitted tokens must lie inside the target's top-p set
    assert (emp[p_true == 0] == 0).all(), "emitted token outside target support"


def test_kv_state_after_step(setup):
    """After a step, kv.seq_len == old + accepted + 1 (rollback contract,
    reference decoding.py:124)."""
    engine, ids, _ = setup
    state = engine.init_state(jax.random.PRNGKey(200))
    state = engine.prefill_target(state, ids)
    state = engine.prefill_draft(state, ids)
    old = int(state.kv.seq_len)
    new_state, stats = engine.triforce_step(state)
    assert int(new_state.kv.seq_len) == old + int(stats.accepted) + 1
    g2 = int(stats.gamma2)
    assert g2 in (SPEC.gamma, SPEC.gamma + 1)
    assert int(stats.n_emitted) == (int(stats.accepted) +
                                    int(stats.resampled) + int(stats.bonus))


def test_accepted_eos_keeps_next_token_uncommitted():
    """Accepted mid-stream EOS (unreachable in the reference, which always
    breaks on EOS): next_token must stay OUT of the kv cache. Regression:
    rollback used to keep the accepted EOS committed while also handing it
    back as next_token, so continuing past EOS re-appended it — a
    duplicated token and a position-shifted context for everything after.

    Deterministic construction: probe a normal run, pick a mid-stream
    ACCEPTED token from some step, then rebuild the engine with that token
    as eos_token_id — same keys, same proposals, so that step now accepts
    an EOS."""
    t_params = llama.init_params(jax.random.PRNGKey(0), TCFG,
                                 dtype=jnp.float32)

    def mk(eos_id):
        return Engine(TCFG, SPEC, t_params, prefill=PREFILL,
                      max_cache_len=PREFILL + 64, dtype=jnp.float32,
                      prefill_chunk=16, donate=False, eos_token_id=eos_id)

    ids = jax.random.randint(jax.random.PRNGKey(3), (1, PREFILL), 3,
                             TCFG.vocab_size)

    def run(eos_id, steps=6):
        eng = mk(eos_id)
        st = eng.init_state(jax.random.PRNGKey(9))
        st = eng.prefill_target(st, ids)
        recs = []
        for _ in range(steps):
            st, stats = eng.retrieval_spec_step(st)
            recs.append((np.asarray(stats.tokens).copy(),
                         int(stats.accepted), int(stats.n_emitted),
                         int(stats.resampled), int(stats.bonus),
                         bool(stats.eos), int(st.kv.seq_len),
                         int(st.next_token[0])))
        return recs

    probe = run(eos_id=-1)   # -1 never sampled: no EOS path taken
    # find a step with >= 2 accepted tokens and take its FIRST accepted
    # token (mid-stream: later accepts exist, so it is not the final pred)
    target = next(((i, r) for i, r in enumerate(probe) if r[1] >= 2), None)
    assert target is not None, "probe run never accepted 2+ tokens"
    step_i, rec = target
    eos_id = int(rec[0][0])

    recs = run(eos_id=eos_id)
    # same trajectory up to the EOS step (keys unchanged)
    for i in range(step_i):
        np.testing.assert_array_equal(recs[i][0], probe[i][0])
    toks, acc, n_em, resampled, bonus, eos, seq_len, nxt = recs[step_i]
    assert eos, "EOS flag must be set when an accepted token == eos_id"
    if resampled == 0 and bonus == 0 and nxt == eos_id:
        # the accepted-EOS-is-pred corner: the EOS must NOT be committed
        # (committed this step = prev pending + accepted MINUS the pending
        # EOS, i.e. seq advances by acc, not acc + 1)
        prev_seq = PREFILL if step_i == 0 else recs[step_i - 1][6]
        assert seq_len == prev_seq + acc, (seq_len, prev_seq, acc)
    # invariant for every step: seq_len == PREFILL + total emitted — each
    # step commits the previous pending token and leaves exactly its own
    # last emitted token pending, so emitted and committed stay in lockstep
    total_emitted = 0
    for toks_i, acc_i, n_i, _, _, _, seq_i, _ in recs:
        total_emitted += n_i
        assert seq_i == PREFILL + total_emitted, (seq_i, total_emitted)


# ---------------------------------------------------------------------------
# middle_chain > 1: chain drafting (k drafter tokens per middle verify)
# ---------------------------------------------------------------------------

CHAIN_SPEC = SpecConfig(gamma=3, budget=16, chunk_size=4, draft_start_size=4,
                        draft_recent_size=12, temperature=0.8, top_p=0.9,
                        middle_chain=3)


@pytest.fixture(scope="module")
def chain_setup():
    t_params = llama.init_params(jax.random.PRNGKey(0), TCFG,
                                 dtype=jnp.float32)
    d_params = llama.init_params(jax.random.PRNGKey(1), DCFG,
                                 dtype=jnp.float32)
    engine = Engine(TCFG, CHAIN_SPEC, t_params, draft_cfg=DCFG,
                    draft_params=d_params, prefill=PREFILL,
                    max_cache_len=PREFILL + 64, dtype=jnp.float32,
                    prefill_chunk=16, draft_prefill_chunk=8, donate=False)
    ids = jax.random.randint(jax.random.PRNGKey(2), (1, PREFILL), 0,
                             TCFG.vocab_size)
    return engine, ids, t_params


def test_chain_step_invariants(chain_setup):
    """Chain drafting keeps every per-step contract of the reference
    schedule: gamma2 in {gamma, gamma+1}, rollback arithmetic, emitted
    accounting."""
    engine, ids, _ = chain_setup
    state = engine.init_state(jax.random.PRNGKey(300))
    state = engine.prefill_target(state, ids)
    state = engine.prefill_draft(state, ids)
    for _ in range(5):
        old = int(state.kv.seq_len)
        state, stats = engine.triforce_step(state)
        assert int(stats.gamma2) in (CHAIN_SPEC.gamma, CHAIN_SPEC.gamma + 1)
        assert int(state.kv.seq_len) == old + int(stats.accepted) + 1
        assert int(stats.n_emitted) == (int(stats.accepted) +
                                        int(stats.resampled) +
                                        int(stats.bonus))
        assert int(stats.mid_draft) >= int(stats.mid_accept) >= 0
        toks = np.asarray(stats.tokens)
        n = int(stats.n_emitted)
        assert (toks[:n] != JUNK_TOKEN).all() or n == 0


def test_chain_forced_alpha1_fills_every_slot(chain_setup):
    """At coin alpha=1.0 a chain round accepts all k proposals + bonus, so
    the middle loop finishes in ceil(gamma/(k+1)) verifies and every outer
    step emits gamma+2 tokens."""
    engine, ids, _ = chain_setup
    state = engine.init_state(jax.random.PRNGKey(301))
    state = engine.prefill_target(state, ids)
    state = engine.prefill_draft(state, ids)
    state, buf, n, counters, _ = jax.tree.map(
        lambda x: x, engine.generate_forced(state, 20, 1.0, mode="triforce"))
    steps = int(counters[0])
    assert int(n) - 1 == steps * (CHAIN_SPEC.gamma + 2)
    # one fully-accepted chain of k=gamma + bonus covers the whole round
    assert int(counters[5]) == steps * CHAIN_SPEC.gamma   # mid_draft
    assert int(counters[6]) == steps * CHAIN_SPEC.gamma   # mid_accept


def test_chain_lossless_first_token_marginal(chain_setup):
    """The losslessness oracle must hold for ANY middle-level proposal
    schedule — chain drafting changes the proposal distribution, not the
    outer exact rejection test."""
    engine, ids, t_params = chain_setup
    state = engine.init_state(jax.random.PRNGKey(100))
    state = engine.prefill_target(state, ids)
    state = engine.prefill_draft(state, ids)

    logits, _, _ = llama.forward_append(
        TCFG, t_params, state.next_token[None].astype(jnp.int32), state.kv)
    p_true = np.asarray(sampling.norm_logits(
        logits[0, -1][None], CHAIN_SPEC.temperature, CHAIN_SPEC.top_k,
        CHAIN_SPEC.top_p)[0])

    n_runs = 1500
    emp = _first_token_distribution(engine, state, engine.triforce_step,
                                    n_runs, 50_000)
    tv = 0.5 * np.abs(emp - p_true).sum()
    null_tv = 0.5 * np.sqrt(
        2 * p_true * (1 - p_true) / (np.pi * n_runs)).sum()
    assert tv < 1.5 * null_tv, (
        f"TV {tv:.4f} vs null {null_tv:.4f} — chain drafting biased")
    assert (emp[p_true == 0] == 0).all()

def test_eos_tuple_matches_scalar():
    """Engine accepts a TUPLE of EOS ids like TreeEngine (the reference's
    tree path stops on 0 AND 2, SpecTree_TP.py:181). A tuple containing the
    single id plus a never-sampled id must behave exactly like the scalar
    form: same tokens, same eos flags, same stop behaviour."""
    t_params = llama.init_params(jax.random.PRNGKey(0), TCFG,
                                 dtype=jnp.float32)
    ids = jax.random.randint(jax.random.PRNGKey(3), (1, PREFILL), 3,
                             TCFG.vocab_size)

    def run(eos):
        eng = Engine(TCFG, SPEC, t_params, prefill=PREFILL,
                     max_cache_len=PREFILL + 64, dtype=jnp.float32,
                     prefill_chunk=16, donate=False, eos_token_id=eos)
        st = eng.init_state(jax.random.PRNGKey(9))
        st = eng.prefill_target(st, ids)
        recs = []
        for _ in range(5):
            st, stats = eng.retrieval_spec_step(st)
            recs.append((np.asarray(stats.tokens).copy(), bool(stats.eos)))
        return recs

    a = run(eos=1)               # token id 1 occurs in tiny-vocab samples
    b = run(eos=(1, TCFG.vocab_size + 7))   # second id never sampled
    for (ta, ea), (tb, eb) in zip(a, b):
        np.testing.assert_array_equal(ta, tb)
        assert ea == eb
    # a tuple whose SECOND id is the live one must also flag EOS
    c = run(eos=(TCFG.vocab_size + 7, 1))
    assert [e for _, e in c] == [e for _, e in a]


def test_generate_stop_on_eos_tuple():
    """Whole-generation loop honours stop_on_eos with a tuple: pick a token
    known to be emitted early, make it EOS, and check generation halts at
    it (reference decoding.py:107-121 breaks on EOS)."""
    t_params = llama.init_params(jax.random.PRNGKey(0), TCFG,
                                 dtype=jnp.float32)
    ids = jax.random.randint(jax.random.PRNGKey(4), (1, PREFILL), 3,
                             TCFG.vocab_size)

    def gen(eos, stop):
        eng = Engine(TCFG, SPEC, t_params, prefill=PREFILL,
                     max_cache_len=PREFILL + 96, dtype=jnp.float32,
                     prefill_chunk=16, donate=False, eos_token_id=eos)
        st = eng.init_state(jax.random.PRNGKey(5))
        st = eng.prefill_target(st, ids)
        st, buf, n, counters, stopped = eng.generate(
            st, 24, mode="retrieval", stop_on_eos=stop)
        return np.asarray(buf)[: int(n)].tolist(), bool(stopped)

    base, _ = gen(eos=-1, stop=True)
    assert len(base) >= 6
    eos_id = base[4]            # emitted mid-generation in the base run
    toks, stopped = gen(eos=(eos_id, TCFG.vocab_size + 7), stop=True)
    assert stopped
    assert len(toks) < len(base)
    # without stop_on_eos the same run continues past the EOS
    toks2, stopped2 = gen(eos=(eos_id, TCFG.vocab_size + 7), stop=False)
    assert not stopped2 and len(toks2) >= len(toks)
