"""Batched speculation must be EXACTLY the per-row single-sequence runs:
vmap of the fused step may not change any row's tokens, acceptance, or
cache state (the beyond-reference batching axis, VERDICT round 1 item 6)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from triforce_tpu import config as C
from triforce_tpu.config import SpecConfig
from triforce_tpu.engine import Engine
from triforce_tpu.models import llama
from triforce_tpu.batched_spec import BatchedSpecEngine, stack_states

SPEC = SpecConfig(gamma=3, budget=16, chunk_size=4, draft_start_size=4,
                  draft_recent_size=12, temperature=0.7, top_p=0.9)
TCFG = C.TINY_TARGET
PREFILL = 32
B = 3


def _mk_engine(mode):
    tcfg, dcfg = C.TINY_TARGET, C.TINY_DRAFT
    t_params = llama.init_params(jax.random.PRNGKey(0), tcfg,
                                 dtype=jnp.float32)
    kw = {}
    if mode == "triforce":
        kw = dict(draft_cfg=dcfg,
                  draft_params=llama.init_params(jax.random.PRNGKey(1),
                                                 dcfg, dtype=jnp.float32))
    return Engine(tcfg, SPEC, t_params, prefill=PREFILL,
                  max_cache_len=PREFILL + 32, dtype=jnp.float32,
                  prefill_chunk=16, draft_prefill_chunk=8, donate=False,
                  **kw)


def _prompts():
    return [jax.random.randint(jax.random.PRNGKey(100 + i), (1, PREFILL), 0,
                               C.TINY_TARGET.vocab_size) for i in range(B)]


@pytest.mark.parametrize("mode", ["retrieval", "triforce"])
def test_batched_rows_equal_single_runs(mode):
    eng = _mk_engine(mode)
    bat = BatchedSpecEngine(eng, mode=mode, donate=False)
    prompts = _prompts()
    seeds = [11, 22, 33]

    # single-sequence references, one per row
    ref_tokens, ref_states = [], []
    for ids, seed in zip(prompts, seeds):
        st = eng.init_state(jax.random.PRNGKey(seed))
        st = eng.prefill_target(st, ids)
        if mode == "triforce":
            st = eng.prefill_draft(st, ids)
        ref_states.append(st)
        toks = []
        for _ in range(3):
            st, stats = (eng.triforce_step(st) if mode == "triforce"
                         else eng.retrieval_spec_step(st))
            toks.append((np.asarray(stats.tokens),
                         int(stats.n_emitted), int(stats.accepted)))
        ref_tokens.append(toks)

    # batched run from the same stacked start states
    state = stack_states(ref_states)
    for step_i in range(3):
        state, stats = bat.step(state)
        for row in range(B):
            want_toks, want_n, want_acc = ref_tokens[row][step_i]
            np.testing.assert_array_equal(
                np.asarray(stats.tokens)[row], want_toks,
                err_msg=f"mode={mode} row={row} step={step_i}")
            assert int(stats.n_emitted[row]) == want_n
            assert int(stats.accepted[row]) == want_acc


def test_batched_rows_independent():
    """A row's stream must not depend on which rows share the batch."""
    eng = _mk_engine("retrieval")
    bat = BatchedSpecEngine(eng, mode="retrieval", donate=False)
    prompts = _prompts()

    def row_stream(states, steps=2):
        st = stack_states(states)
        out = []
        for _ in range(steps):
            st, stats = bat.step(st)
            out.append(np.asarray(stats.tokens))
        return out

    base_states = []
    for ids, seed in zip(prompts, [11, 22, 33]):
        st = eng.init_state(jax.random.PRNGKey(seed))
        base_states.append(eng.prefill_target(st, ids))

    full = row_stream(base_states)
    # same row 0 batched with different companions: stream must be identical
    alt = row_stream([base_states[0], base_states[2], base_states[1]])
    for a, b in zip(full, alt):
        np.testing.assert_array_equal(a[0], b[0])


@pytest.mark.parametrize("mode", ["retrieval", "triforce"])
def test_decode_fused_equals_stepped(mode):
    """decode() (whole multi-step generation in ONE dispatch) emits exactly
    the same per-row tokens as host-stepped step() calls."""
    eng = _mk_engine(mode)
    prompts = _prompts()
    seeds = [7, 8, 9]

    bat1 = BatchedSpecEngine(eng, mode=mode, donate=False)
    st = bat1.prefill_rows(prompts, seeds)
    want_toks, want_ns = [], []
    for _ in range(3):
        st, stats = bat1.step(st)
        want_toks.append(np.asarray(stats.tokens))
        want_ns.append(np.asarray(stats.n_emitted))
    want_toks = np.stack(want_toks, axis=1)
    want_ns = np.stack(want_ns, axis=1)

    bat2 = BatchedSpecEngine(eng, mode=mode, donate=False)
    st2 = bat2.prefill_rows(prompts, seeds)
    _, toks, ns, _c, _e = bat2.decode(st2, steps=3)
    np.testing.assert_array_equal(np.asarray(toks), want_toks)
    np.testing.assert_array_equal(np.asarray(ns), want_ns)


def test_batched_forced_acceptance():
    """force_accept=1.0 makes every row emit gamma accepts + the bonus
    token every step (like Engine.generate_forced at alpha=1)."""
    eng = _mk_engine("retrieval")
    bat = BatchedSpecEngine(eng, mode="retrieval", donate=False,
                            force_accept=1.0)
    st = bat.prefill_rows(_prompts(), [4, 5, 6])
    _, toks, ns, counters, _e = bat.decode(st, steps=2)
    assert np.asarray(ns).shape == (B, 2)
    assert (np.asarray(ns) == SPEC.gamma + 1).all()
    counters = np.asarray(counters)
    # alpha=1: every proposal accepted, per row
    assert (counters[:, 0] == counters[:, 1]).all() and counters[:, 1].all()


def test_fixed_trip_middle_loop_batched_equals_single():
    """middle_trips > 0 (lockstep batched middle loop): the fori-loop form
    must still match batched-vs-single bit equality, and a trip-exhausted
    row legitimately proposes fewer than gamma tokens (gamma2 < gamma is a
    valid outer-verify input)."""
    import dataclasses
    tcfg, dcfg = C.TINY_TARGET, C.TINY_DRAFT
    spec = dataclasses.replace(SPEC, middle_chain=2, middle_trips=2)
    t_params = llama.init_params(jax.random.PRNGKey(0), tcfg,
                                 dtype=jnp.float32)
    d_params = llama.init_params(jax.random.PRNGKey(1), dcfg,
                                 dtype=jnp.float32)
    eng = Engine(tcfg, spec, t_params, draft_cfg=dcfg, draft_params=d_params,
                 prefill=PREFILL, max_cache_len=PREFILL + 32,
                 dtype=jnp.float32, prefill_chunk=16, draft_prefill_chunk=8,
                 donate=False)
    prompts = _prompts()
    seeds = [11, 22, 33]

    ref_tokens, ref_states = [], []
    for ids, seed in zip(prompts, seeds):
        st = eng.init_state(jax.random.PRNGKey(seed))
        st = eng.prefill_target(st, ids)
        st = eng.prefill_draft(st, ids)
        ref_states.append(st)
        toks = []
        for _ in range(3):
            st, stats = eng.triforce_step(st)
            g2 = int(stats.gamma2)
            # trips=2 at chain=2: at most 2*(2+1) = 6 > gamma proposals, at
            # least 2 per step; never more than gamma+1
            assert 1 <= g2 <= SPEC.gamma + 1
            toks.append((np.asarray(stats.tokens), int(stats.n_emitted)))
        ref_tokens.append(toks)

    bat = BatchedSpecEngine(eng, mode="triforce", donate=False)
    state = stack_states(ref_states)
    for step_i in range(3):
        state, stats = bat.step(state)
        for row in range(B):
            want_toks, want_n = ref_tokens[row][step_i]
            np.testing.assert_array_equal(
                np.asarray(stats.tokens)[row], want_toks,
                err_msg=f"row={row} step={step_i}")
            assert int(stats.n_emitted[row]) == want_n


def test_fixed_trip_forced_full_acceptance_matches_while_loop_rate():
    """At force_accept=1.0 one trip of chain=gamma consumes gamma proposals
    + the middle bonus, so trips=1 reaches gamma+1 exactly — the fixed-trip
    program must emit the while_loop form's gamma+2 tokens per step (gamma+1
    accepted proposals + the outer bonus)."""
    import dataclasses
    tcfg, dcfg = C.TINY_TARGET, C.TINY_DRAFT
    t_params = llama.init_params(jax.random.PRNGKey(0), tcfg,
                                 dtype=jnp.float32)
    d_params = llama.init_params(jax.random.PRNGKey(1), dcfg,
                                 dtype=jnp.float32)
    ns_by_trips = {}
    for trips in (0, 1):
        spec = dataclasses.replace(SPEC, middle_chain=3, middle_trips=trips)
        eng = Engine(tcfg, spec, t_params, draft_cfg=dcfg,
                     draft_params=d_params, prefill=PREFILL,
                     max_cache_len=PREFILL + 32, dtype=jnp.float32,
                     prefill_chunk=16, draft_prefill_chunk=8, donate=False)
        bat = BatchedSpecEngine(eng, mode="triforce", donate=False,
                                force_accept=1.0)
        st = bat.prefill_rows(_prompts(), [4, 5, 6])
        _, toks, ns, counters, _e = bat.decode(st, steps=2)
        ns_by_trips[trips] = np.asarray(ns)
    assert (ns_by_trips[1] == SPEC.gamma + 2).all()
    np.testing.assert_array_equal(ns_by_trips[1], ns_by_trips[0])


@pytest.mark.skipif(len(jax.devices()) < 4, reason="needs 4 devices")
@pytest.mark.parametrize("mode", ["retrieval", "triforce"])
def test_dp_sharded_rows_equal_unsharded(mode):
    """Rows sharded over a dp mesh axis (data-parallel serving) emit
    exactly the unsharded batched outputs: shard_map runs each device's
    local rows through the same vmapped step."""
    from triforce_tpu.parallel import mesh as mesh_mod
    eng = _mk_engine(mode)
    prompts = _prompts() + [_prompts()[0]]          # B=4
    seeds = [11, 22, 33, 44]

    bat = BatchedSpecEngine(eng, mode=mode, donate=False)
    st = bat.prefill_rows(prompts, seeds)
    _, want_toks, want_ns, _c, _e = bat.decode(st, steps=3)

    mesh = mesh_mod.make_mesh(dp=4)
    bat_dp = BatchedSpecEngine(eng, mode=mode, donate=False, mesh=mesh)
    st2 = bat_dp.prefill_rows(prompts, seeds)
    _, toks, ns, _c, _e = bat_dp.decode(st2, steps=3)
    np.testing.assert_array_equal(np.asarray(toks), np.asarray(want_toks))
    np.testing.assert_array_equal(np.asarray(ns), np.asarray(want_ns))


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")
@pytest.mark.parametrize("mode", ["retrieval", "triforce"])
def test_dpxtp_composed_rows_equal_unsharded(mode):
    """The production mesh shape (VERDICT r2 weak#7): rows over dp, heads
    over tp, KV sequence over sp, ALL in one program — the engine carries a
    (dp=2, tp=2, sp=2) mesh and BatchedSpecEngine binds the row axis to dp
    via vmap(spmd_axis_name). Emitted tokens must equal the fully
    unsharded batched run."""
    from triforce_tpu.parallel import mesh as mesh_mod
    eng = _mk_engine(mode)
    prompts = _prompts() + [_prompts()[0]]          # B=4
    seeds = [11, 22, 33, 44]

    bat = BatchedSpecEngine(eng, mode=mode, donate=False)
    st = bat.prefill_rows(prompts, seeds)
    _, want_toks, want_ns, want_c, _e = bat.decode(st, steps=3)

    mesh = mesh_mod.make_mesh(dp=2, tp=2, sp=2)
    tcfg, dcfg = C.TINY_TARGET, C.TINY_DRAFT
    t_params = llama.init_params(jax.random.PRNGKey(0), tcfg,
                                 dtype=jnp.float32)
    kw = {}
    if mode == "triforce":
        kw = dict(draft_cfg=dcfg,
                  draft_params=llama.init_params(jax.random.PRNGKey(1),
                                                 dcfg, dtype=jnp.float32))
    eng_m = Engine(tcfg, SPEC, t_params, prefill=PREFILL,
                   max_cache_len=PREFILL + 32, dtype=jnp.float32,
                   prefill_chunk=16, draft_prefill_chunk=8, donate=False,
                   mesh=mesh, shard_seq=True, **kw)
    bat_m = BatchedSpecEngine(eng_m, mode=mode, donate=False)
    assert bat_m._composed and bat_m._dp == 2
    st2 = bat_m.prefill_rows(prompts, seeds)
    _, toks, ns, c, _e = bat_m.decode(st2, steps=3)
    np.testing.assert_array_equal(np.asarray(toks), np.asarray(want_toks))
    np.testing.assert_array_equal(np.asarray(ns), np.asarray(want_ns))
    np.testing.assert_array_equal(np.asarray(c), np.asarray(want_c))


def test_spec_scheduler_six_requests_four_slots():
    """Speculative continuous batching (VERDICT r4 item 5): 6 requests flow
    through 4 speculative slots (admit -> fused batched spec segments ->
    retire on length), and EVERY output equals its single-sequence run —
    the admission/retire machinery must not perturb any row."""
    from triforce_tpu.batched_spec import SpecScheduler
    from triforce_tpu.batching import Request
    from triforce_tpu import decoding

    t_params = llama.init_params(jax.random.PRNGKey(0), TCFG,
                                 dtype=jnp.float32)
    engine = Engine(TCFG, SPEC, t_params, prefill=PREFILL,
                    max_cache_len=PREFILL + 256, dtype=jnp.float32,
                    prefill_chunk=16, donate=True)
    max_new = 12
    prompts = [np.asarray(jax.random.randint(
        jax.random.PRNGKey(60 + i), (PREFILL,), 0, TCFG.vocab_size))
        for i in range(6)]

    sched = SpecScheduler(engine, mode="retrieval", slots=4, segment=2)
    for i, p in enumerate(prompts):
        sched.submit(Request(rid=i, prompt=p, max_new_tokens=max_new))
    done = sched.run(max_wall_s=600)
    assert len(done) == 6 and all(r.done for r in done)

    # single-sequence references: same seed (rid) -> identical trajectory
    for i, p in enumerate(prompts):
        solo = decoding.retrieval_spec(
            engine, jnp.asarray(p)[None], max_len=max_new + 8, seed=i)
        req = next(r for r in done if r.rid == i)
        assert req.out == solo.tokens[:max_new], (
            i, req.out, solo.tokens[:max_new])


def test_spec_scheduler_retires_on_eos():
    """A row whose stream hits an EOS id retires early, trimmed at the
    EOS, and its slot is reused by a queued request."""
    from triforce_tpu.batched_spec import SpecScheduler
    from triforce_tpu.batching import Request
    from triforce_tpu import decoding

    t_params = llama.init_params(jax.random.PRNGKey(0), TCFG,
                                 dtype=jnp.float32)
    prompt = np.asarray(jax.random.randint(
        jax.random.PRNGKey(77), (PREFILL,), 3, TCFG.vocab_size))

    # probe a run to find a token emitted mid-stream, then make it EOS
    probe_eng = Engine(TCFG, SPEC, t_params, prefill=PREFILL,
                       max_cache_len=PREFILL + 256, dtype=jnp.float32,
                       prefill_chunk=16, donate=True)
    solo = decoding.retrieval_spec(probe_eng, jnp.asarray(prompt)[None],
                                   max_len=16, seed=0)
    eos_id = solo.tokens[5]
    cut = solo.tokens.index(eos_id)        # first occurrence <= 5

    engine = Engine(TCFG, SPEC, t_params, prefill=PREFILL,
                    max_cache_len=PREFILL + 256, dtype=jnp.float32,
                    prefill_chunk=16, donate=True, eos_token_id=(eos_id,))
    sched = SpecScheduler(engine, mode="retrieval", slots=2, segment=2)
    for i in range(3):                     # 3 requests through 2 slots
        sched.submit(Request(rid=0 if i == 0 else 100 + i, prompt=prompt,
                             max_new_tokens=64))
    done = sched.run(max_wall_s=600)
    assert len(done) == 3
    req0 = next(r for r in done if r.rid == 0)
    # same PRNG as the probe run -> same stream, cut at the first EOS
    assert req0.out == solo.tokens[: cut + 1]
    assert req0.out[-1] == eos_id


def test_batched_deferred_writeback_across_budget_wrap():
    """The deferred-commit writeback (batched_commit_and_refresh) must stay
    bit-identical to per-row flat steps THROUGH the retrieval rolling-window
    wrap (generated tokens > budget): the wrap splits the per-row refresh
    into two slot blocks, which only long generations exercise."""
    eng = Engine(C.TINY_TARGET,
                 SPEC,  # budget 16 -> wraps after ~4 steps
                 llama.init_params(jax.random.PRNGKey(0), C.TINY_TARGET,
                                   dtype=jnp.float32),
                 prefill=PREFILL, max_cache_len=PREFILL + 192,
                 dtype=jnp.float32, prefill_chunk=16, donate=False)
    bat = BatchedSpecEngine(eng, mode="retrieval", donate=False)
    prompts = _prompts()
    seeds = [11, 22, 33]
    steps = 10       # ~3-4 tokens/step x 10 >> budget 16: several wraps

    refs = []
    for ids, seed in zip(prompts, seeds):
        st = eng.init_state(jax.random.PRNGKey(seed))
        st = eng.prefill_target(st, ids)
        toks = []
        for _ in range(steps):
            st, stats = eng.retrieval_spec_step(st)
            toks += np.asarray(stats.tokens)[:int(stats.n_emitted)].tolist()
        refs.append((toks, st))

    st = bat.prefill_rows(prompts, seeds)
    st, btoks, ns, _c, _e = bat.decode(st, steps)
    btoks, ns = np.asarray(btoks), np.asarray(ns)
    for r, (toks, ref_st) in enumerate(refs):
        got = [int(t) for s in range(steps) for t in btoks[r, s, :ns[r, s]]]
        assert got == toks, f"row {r} diverged past the wrap"
        # the retrieval cache itself must match slot-for-slot (the refresh
        # path is the wrap-sensitive part)
        np.testing.assert_array_equal(
            np.asarray(jax.tree.leaves(ref_st.rkv)[0]),
            np.asarray(jax.tree.leaves(st.rkv)[0][r]))


def test_spec_scheduler_dp_mesh():
    """Continuous batching over a data-parallel mesh: slot rows shard over
    dp=2 devices; every served output equals its single-sequence run."""
    from triforce_tpu.batched_spec import SpecScheduler
    from triforce_tpu.batching import Request
    from triforce_tpu.parallel import mesh as mesh_mod
    from triforce_tpu import decoding

    t_params = llama.init_params(jax.random.PRNGKey(0), TCFG,
                                 dtype=jnp.float32)
    engine = Engine(TCFG, SPEC, t_params, prefill=PREFILL,
                    max_cache_len=PREFILL + 256, dtype=jnp.float32,
                    prefill_chunk=16, donate=True)
    m = mesh_mod.make_mesh(dp=2)
    max_new = 8
    prompts = [np.asarray(jax.random.randint(
        jax.random.PRNGKey(90 + i), (PREFILL,), 0, TCFG.vocab_size))
        for i in range(4)]
    sched = SpecScheduler(engine, mode="retrieval", slots=2, segment=2,
                          mesh=m)
    for i, p in enumerate(prompts):
        sched.submit(Request(rid=i, prompt=p, max_new_tokens=max_new))
    done = sched.run(max_wall_s=600)
    assert len(done) == 4 and all(r.done for r in done)
    for i, p in enumerate(prompts):
        solo = decoding.retrieval_spec(
            engine, jnp.asarray(p)[None], max_len=max_new + 8, seed=i)
        req = next(r for r in done if r.rid == i)
        assert req.out == solo.tokens[:max_new], (i, req.out)


def test_prefill_partial_chained_equals_whole():
    """Chaining prefill_target_partial slices to completion is numerically
    identical to prefill_target (same chunk boundaries -> same programs)."""
    eng = _mk_engine("retrieval")
    ids = _prompts()[0]
    ref = eng.prefill_target(eng.init_state(jax.random.PRNGKey(5)), ids)

    st = eng.init_state(jax.random.PRNGKey(5))
    pos, done, slices = 0, False, 0
    while not done:
        st, pos, done = eng.prefill_target_partial(st, ids, pos, 1)
        slices += 1
    assert slices > 1          # actually exercised the interleave
    assert int(st.kv.seq_len) == int(ref.kv.seq_len)
    assert int(st.next_token[0]) == int(ref.next_token[0])
    np.testing.assert_allclose(np.asarray(st.kv.k, np.float32),
                               np.asarray(ref.kv.k, np.float32))
    np.testing.assert_allclose(np.asarray(st.rkv.k, np.float32),
                               np.asarray(ref.rkv.k, np.float32))


def test_spec_scheduler_chunked_admission_interleaves():
    """With admit_chunks=1 (one prefill chunk per cycle) admission spans
    multiple scheduler cycles and decode segments interleave with it; every
    output still equals its single-sequence run, and retired slots are
    GATED (kv.seq_len == 0 -> zero cache bytes streamed)."""
    from triforce_tpu.batched_spec import SpecScheduler
    from triforce_tpu.batching import Request
    from triforce_tpu import decoding

    t_params = llama.init_params(jax.random.PRNGKey(0), TCFG,
                                 dtype=jnp.float32)
    engine = Engine(TCFG, SPEC, t_params, prefill=PREFILL,
                    max_cache_len=PREFILL + 256, dtype=jnp.float32,
                    prefill_chunk=8, donate=True)
    max_new = 10
    prompts = [np.asarray(jax.random.randint(
        jax.random.PRNGKey(60 + i), (PREFILL,), 0, TCFG.vocab_size))
        for i in range(4)]

    sched = SpecScheduler(engine, mode="retrieval", slots=2, segment=2,
                          admit_chunks=1)
    for i, p in enumerate(prompts):
        sched.submit(Request(rid=i, prompt=p, max_new_tokens=max_new))
    done = sched.run(max_wall_s=600)
    assert len(done) == 4 and all(r.done for r in done)
    for i, p in enumerate(prompts):
        solo = decoding.retrieval_spec(
            engine, jnp.asarray(p)[None], max_len=max_new + 8, seed=i)
        req = next(r for r in done if r.rid == i)
        assert req.out == solo.tokens[:max_new], (
            i, req.out, solo.tokens[:max_new])
    # all slots retired -> gated AND frozen: dead rows pin at length 0
    lens = np.asarray(sched.state.kv.seq_len).tolist()
    assert lens == [0, 0], lens


def test_gated_row_streams_zero_and_stays_inert():
    """A dead row (kv.seq_len == 0) must not perturb live rows and its
    forwards read zero cache columns: run a 2-row batch where row 1 is
    cleared, and row 0's trajectory equals its solo run."""
    eng = _mk_engine("retrieval")
    bat = BatchedSpecEngine(eng, mode="retrieval", donate=False)
    prompts = _prompts()[:2]

    sts = []
    for ids, seed in zip(prompts, (11, 22)):
        st = eng.init_state(jax.random.PRNGKey(seed))
        st = eng.prefill_target(st, ids)
        sts.append(st)
    # solo reference for row 0
    solo = sts[0]
    solo_toks = []
    for _ in range(3):
        solo, stats = eng.retrieval_spec_step(solo)
        solo_toks.extend(np.asarray(
            stats.tokens)[: int(stats.n_emitted)].tolist())

    # batch with row 1 CLEARED (the scheduler's gating state)
    sts[1] = sts[1].replace(kv=sts[1].kv.replace(
        seq_len=jnp.zeros((), jnp.int32)))
    bst = stack_states(sts)
    got = []
    for _ in range(3):
        bst, stats = bat.step(bst)
        got.extend(np.asarray(
            stats.tokens[0])[: int(stats.n_emitted[0])].tolist())
    assert got == solo_toks
    # the dead row is FROZEN at zero (streams nothing, grows nothing)
    assert int(bst.kv.seq_len[1]) == 0
