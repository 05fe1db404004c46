"""Bench mode runners: ar / retrieval / triforce (flat), tree, planner,
batched, serve, and the 13b-proxy context row.

Each runner returns a JSON-able record; rows carry a ``methodology`` stamp
(VERDICT r4 item 10):

  raw-random-weights — real rejection test on random weights (benchmarks the
                       fixture's chaotic acceptance, not the system);
  forced-coin        — accept tests are coin flips at the QUOTED rate while
                       every real forward runs;
  calibrated         — coin rate searched so the REALIZED per-proposal
                       acceptance hits the target; the row is quoted AT the
                       realized value it actually measured.
"""

from __future__ import annotations

import copy
import time

import numpy as np

from .common import (ByteModel, add_bandwidth, build_engine, log, make_ids,
                     read_out, settle, timed_generation, timed_prefill)


def run_ar(engine, gen_len):
    """Autoregressive baseline tokens/s: whole token loop is one device
    dispatch (reference decoding.py:14-37 pays a host sync per token)."""
    state, prefill_s = timed_prefill(engine, seed=11, with_draft=False)
    kv, token, key = state.kv, state.next_token, state.key
    # warmup dispatch compiles; its OUTPUT feeds the timed run, so the timed
    # call can never be a memoized replay
    kv, token, key, buf = engine.generate_ar(kv, token, key, gen_len)
    _ = int(buf[-1])
    t0 = time.perf_counter()
    kv, token, key, buf = engine.generate_ar(kv, token, key, gen_len)
    _ = int(buf[-1])
    dt = time.perf_counter() - t0
    del kv, state
    tps = gen_len / dt
    import jax
    row = add_bandwidth(
        {"tokens_per_sec": tps, "ms_per_token": 1e3 * dt / gen_len,
         "prefill_s": prefill_s},
        ByteModel(engine).ar_token(engine.prefill + 1.5 * gen_len),
        jax.default_backend() == "tpu")
    log(f"[bench] AR: {tps:.2f} tok/s ({1e3 * dt / gen_len:.1f} ms/token, "
        f"{row['achieved_gbps']:.0f} GB/s"
        + (f" = {row['frac_of_peak']:.2f} of v5e peak)"
           if "frac_of_peak" in row else ")"))
    return row


def _calibrate(engine, state, gen_len, mode, target, with_draft,
               coin_seed=None):
    """Search the accept-coin rate whose REALIZED per-proposal acceptance
    hits ``target``, quoting the row from the accepted probe block itself.

    Every probe block is TIMED (3 same-shape runs aggregated, ~400+
    proposals -> sigma ~0.02): the block whose aggregated realized lands
    within +/-0.012 of the target becomes the quoted row, so the quoted
    acceptance is within tolerance BY CONSTRUCTION — the r3/r4 retrieval
    rows quoted 0.9 while realizing 0.878 because the final timed block
    re-rolled the acceptance after the bisection exited (VERDICT r4 item 7).
    If no block lands in tolerance after 8 probes, the closest block is
    quoted AT ITS REALIZED VALUE with ``calibration_hit: false``.

    ``coin_seed`` (from BENCH_PARTIAL coin cache) starts the search at the
    last known-good coin — typically the first block already lands.
    realized(coin) is monotone but STEEP near 1 (a rejection truncates the
    chain), so the search bisects a bracket (lo = target always realizes
    below target; hi ~ 1 realizes ~ 1)."""
    import jax
    lo, hi = target, 0.9995
    coin = coin_seed if coin_seed and lo < coin_seed < hi else 0.5 * (lo + hi)
    trace, best = [], None
    for _it in range(8):
        gen = steps = acc = prop = mid_d = mid_v = mid_l = 0
        dt = 0.0
        ctx0 = int(jax.device_get(state.kv.seq_len))
        for _r in range(3):
            state, n, counters, dt_r = timed_generation(
                lambda s: engine.generate_forced(s, gen_len, coin,
                                                 mode=mode),
                state, gen_len, warm=False)
            gen += n - 1
            steps += int(counters[0])
            acc += int(counters[1])
            prop += int(counters[2])
            mid_d += int(counters[5])
            mid_v += int(counters[7])
            mid_l += int(counters[8])
            dt += dt_r
        ctx1 = int(jax.device_get(state.kv.seq_len))
        realized = acc / max(prop, 1)
        block = {"coin": coin, "realized": realized, "gen": gen,
                 "steps": steps, "prop": prop, "mid_d": mid_d,
                 "mid_v": mid_v, "mid_l": mid_l, "dt": dt,
                 "ctx": 0.5 * (ctx0 + ctx1)}
        trace.append({"coin": round(coin, 4), "realized": round(realized, 4),
                      "tokens_per_sec": round(gen / dt, 2)})
        log(f"[bench] {mode} calibrate: coin={coin:.4f} -> realized "
            f"{realized:.3f} (target {target}), {gen / dt:.1f} tok/s")
        gap = abs(realized - target)
        if best is None or gap < abs(best["realized"] - target):
            best = block
        if gap <= 0.012:
            break
        if realized < target:
            lo = max(lo, coin)
        else:
            hi = min(hi, coin)
        coin = 0.5 * (lo + hi)

    b = best
    realized = b["realized"]
    row = {
        "methodology": "calibrated",
        "target_accept": target, "coin": round(b["coin"], 4),
        "calibration_hit": abs(realized - target) <= 0.012,
        "measured_accept": realized,
        # binomial error bar on the realized acceptance over the block's
        # proposals (the headline moves ~1x per 0.02 of acceptance at the
        # knee — VERDICT r3 weak#8)
        "measured_accept_sigma": round(
            float(np.sqrt(realized * (1 - realized) / max(b["prop"], 1))), 4),
        "n_proposals": b["prop"],
        "tokens_per_sec": b["gen"] / b["dt"],
        "ms_per_token": 1e3 * b["dt"] / max(b["gen"], 1),
        "tokens_per_step": b["gen"] / max(b["steps"], 1),
        "step_ms": 1e3 * b["dt"] / max(b["steps"], 1),
        "calibration_trace": trace}
    # analytic HBM traffic of the measured steps (byte model over the
    # engine's own shapes; mid verifies + drafter forwards from the device
    # counters; +1 drafter replay per step)
    bm = ByteModel(engine)
    drafts = (b["mid_d"] / max(b["steps"], 1) + 1) if with_draft else 0.0
    step_bytes = bm.spec_step(b["ctx"], b["mid_v"] / max(b["steps"], 1),
                              drafts,
                              mid_live=b["mid_l"] / max(b["steps"], 1))
    add_bandwidth(row, step_bytes / (b["gen"] / max(b["steps"], 1)),
                  jax.default_backend() == "tpu")
    log(f"[bench] {mode} CALIBRATED realized={realized:.3f} "
        f"(coin {b['coin']:.3f}, hit={row['calibration_hit']}): "
        f"{row['tokens_per_sec']:.2f} tok/s, "
        f"{row['tokens_per_step']:.2f} tok/step")
    return row, state


def run_spec(engine, gen_len, mode, alphas, with_draft,
             calibrate_to=None, coin_seed=None, keep_state=False,
             lean=False, seed=23):
    """Speculative decode: raw (real rejection test on random weights) +
    measured throughput at each forced acceptance alpha (+ calibrated row).
    ``lean`` skips the raw run (saves its whole-generation compile — used
    by the 13b context row, which only needs AR floor + calibrated spec).
    Returns (record, final_state_or_None)."""
    state, prefill_s = timed_prefill(engine, seed=seed, with_draft=with_draft,
                                     label=f" {mode}")

    res = {"prefill_s": prefill_s}
    if not lean:
        state, n, counters, dt = timed_generation(
            lambda s: engine.generate(s, gen_len, mode=mode), state, gen_len)
        gen = n - 1
        steps, accepted, proposed = int(counters[0]), int(counters[1]), \
            int(counters[2])
        res["raw"] = {
            "methodology": "raw-random-weights",
            "tokens_per_sec": gen / dt,
            "ms_per_token": 1e3 * dt / max(gen, 1),
            "acceptance_rate": accepted / max(proposed, 1),
            "tokens_per_step": gen / max(steps, 1),
            "step_ms": 1e3 * dt / max(steps, 1)}
        log(f"[bench] {mode} raw: {gen / dt:.2f} tok/s, acceptance "
            f"{res['raw']['acceptance_rate']:.3f}, step "
            f"{res['raw']['step_ms']:.1f} ms")
        settle()

    res["forced"] = {}
    for i, alpha in enumerate(alphas):
        # alpha is traced (one compile for all alphas): warm only the first
        state, n, counters, dt = timed_generation(
            lambda s: engine.generate_forced(s, gen_len, alpha, mode=mode),
            state, gen_len, warm=i == 0)
        gen = n - 1
        steps = int(counters[0])
        acc_rate = int(counters[1]) / max(int(counters[2]), 1)
        res["forced"][str(alpha)] = {
            "methodology": "forced-coin",
            "tokens_per_sec": gen / dt,
            "ms_per_token": 1e3 * dt / max(gen, 1),
            "tokens_per_step": gen / max(steps, 1),
            "step_ms": 1e3 * dt / max(steps, 1),
            "measured_accept": acc_rate}
        log(f"[bench] {mode} alpha={alpha}: {gen / dt:.2f} tok/s "
            f"({1e3 * dt / max(gen, 1):.1f} ms/token), "
            f"{gen / max(steps, 1):.2f} tok/step, step "
            f"{1e3 * dt / max(steps, 1):.1f} ms")

    if calibrate_to is not None:
        res["calibrated"], state = _calibrate(
            engine, state, gen_len, mode, calibrate_to, with_draft,
            coin_seed=coin_seed)
    if keep_state:
        return res, state
    del state
    return res, None


def run_planner(preset: str, args, engine=None, state=None):
    """Planner-driven tree operating point (VERDICT r4 item 4): measure the
    per-phase times and the acceptance vector ON THIS HARDWARE, let
    ``planner.choose_tree`` pick (tree_size, depth) from them, evaluate the
    planner's own flat-chain prediction, and RUN the chosen configuration —
    the tree's operating point is chosen by measured times, not by hand.

    ``engine``/``state``: a prefilled flat engine+state to BORROW (the
    triforce mode's final state) — skips this mode's own engine build and
    its second ~108 s prefill compile (VERDICT r4 item 1). The state is
    CONSUMED (donated to the acceptance measurement); the borrowed engine
    is left alive for the caller.

    Also records, through the same planner: (a) the plan from the
    reference's OWN measured offloading times (tree/config.json: draft
    27.2 ms, verify 1.066-1.19 s — the slow-verify regime Sequoia exists
    for, where it picks the reference-scale 512-node tree), and (b) a
    SLOW-VERIFY margin sweep over the measured on-chip times scaled by
    k in {2, 4, 8, 40} — an honest model of sp-sharded / offload-like
    verify costs (VERDICT r4 item 5), each with the tree-vs-flat margin."""
    import jax
    import jax.numpy as jnp
    from triforce_tpu import profiling
    from triforce_tpu.models import llama as llama_mod
    from triforce_tpu.tree import planner

    owns_engine = engine is None
    if owns_engine:
        engine, prefill, _ = build_engine(
            preset, args, with_draft=False,
            weight_quant=args.weights == "int8")
        _s, _ = timed_prefill(engine, seed=89, with_draft=False,
                              label=" planner warmup(compile)")
        del _s
        settle()
        state, prefill_s = timed_prefill(engine, seed=91, with_draft=False,
                                         label=" planner")
    else:
        assert state is not None
        prefill = engine.prefill
        prefill_s = None
        log("[bench] planner: reusing the flat engine's prefilled state "
            "(no second prefill compile)")
    on_tpu = jax.default_backend() == "tpu"
    iters = 16 if on_tpu else 3
    pt = profiling.measure_phase_times(engine, state, iters=iters)
    log("[bench] planner phase times: " + ", ".join(
        f"{k}={1e3 * v:.2f}ms" for k, v in sorted(pt.items())))

    # per-tree-size verify times: one full-cache forward of T=size tokens
    # (the tree verify adds only a mask to the same bandwidth-bound read)
    cfg = engine.target_cfg
    sizes = [8, 12, 16] if preset == "tiny" else [64, 128, 256, 512]

    def vbody(ids, params, kv):
        logits = llama_mod.forward_append(cfg, params, ids, kv)[0]
        nxt = jnp.argmax(logits[0, -1]).astype(jnp.int32)
        return (ids + nxt + 1) % cfg.vocab_size

    vt = []
    for size in sizes:
        ids0 = jnp.zeros((1, size), jnp.int32)
        vt.append(profiling._time_chained(
            vbody, ids0, (engine.t_params, state.kv),
            max(2, iters // 5), iters))
        log(f"[bench] planner verify(T={size}): {1e3 * vt[-1]:.2f} ms")

    # measured acceptance vector from the real hierarchy (random-weight
    # FIXTURE acceptance — recorded as such; the controlled-acceptance
    # comparison uses the modeled vector at --alpha). Consumes the state.
    p_meas = profiling.measure_acceptance_vector(
        engine, None, max_branch=4, steps=24 if on_tpu else 8, state=state)
    log(f"[bench] planner measured acceptance vector: "
        f"{[round(float(x), 3) for x in p_meas]}")

    res = {"phase_times_ms": {k: round(1e3 * v, 3) for k, v in pt.items()},
           "verify_ms_per_size": {str(s): round(1e3 * v, 3)
                                  for s, v in zip(sizes, vt)},
           "acceptance_vector_measured": [round(float(x), 4)
                                          for x in p_meas],
           "reused_flat_state": not owns_engine}
    if prefill_s is not None:
        res["prefill_s"] = prefill_s

    def flat_cost_at(p, gamma, mid=None):
        # the planner's own FLAT-chain prediction: flat retrieval mode is a
        # (gamma+1)-node branch-1 "tree" (gamma middle steps + 1 verify)
        mid = pt["middle_step"] if mid is None else mid
        T, _ = planner.plan_tree(p, gamma + 1, gamma + 1)
        e_flat = max(float(T[gamma + 1, gamma + 1, 1]), 1e-9)
        return (gamma * mid + pt["target_verify"]) / e_flat

    def decide(p, tag, vt_use=None, verify_scale=1.0):
        vts = [v * verify_scale for v in (vt_use or vt)]
        gm, cost, (m, depth) = planner.choose_tree(
            p, sizes, vts, draft_time=pt["middle_step"],
            max_depth=args.tree_depth)
        flat_cost = flat_cost_at(p, args.gamma)
        # the planner also CHOOSES the flat schedule's gamma from the same
        # measured times (the reference hand-picks gamma=6; here the
        # operating point is the planner's own output). In a slow-verify
        # regime the flat chain's verify is ALSO scaled.
        if verify_scale != 1.0:
            tv = pt["target_verify"] * verify_scale
            sweep = {g: (g * pt["middle_step"] + tv)
                     / max(float(planner.plan_tree(p, g + 1, g + 1)[0]
                                 [g + 1, g + 1, 1]), 1e-9)
                     for g in range(2, 17)}
            flat_cost = sweep[args.gamma]
        else:
            sweep = {g: flat_cost_at(p, g) for g in range(2, 17)}
        g_best = min(sweep, key=sweep.get)
        # the tree must beat the planner's BEST flat schedule (the sweep's
        # chosen gamma), not just the CLI gamma — otherwise "tree wins"
        # could contradict the sweep published in the same row
        best_flat = min(flat_cost, sweep[g_best])
        margin = (best_flat - cost) / max(best_flat, 1e-9)
        row = {"p": tag, "chosen_size": int(m), "chosen_depth": int(depth),
               "tree_pred_ms_per_token": round(1e3 * cost, 3),
               "flat_pred_ms_per_token": round(1e3 * flat_cost, 3),
               "flat_gamma_sweep_ms_per_token": {
                   str(g): round(1e3 * c, 3) for g, c in sweep.items()},
               "flat_best_gamma": int(g_best),
               "flat_best_pred_ms_per_token": round(1e3 * sweep[g_best], 3),
               "decision": "tree" if cost < best_flat else "flat",
               "margin_vs_best_flat": round(margin, 4)}
        log(f"[bench] planner[{tag}]: tree {m} nodes depth {depth} -> "
            f"{1e3 * cost:.2f} ms/tok vs best flat {1e3 * best_flat:.2f} "
            f"-> {row['decision'].upper()} wins by {100 * abs(margin):.1f}%")
        return row, gm, depth

    plans = []
    if p_meas[1] > 0:
        row, _, _ = decide(p_meas, "measured")
        plans.append(row)
    row_mod, gm_mod, depth_mod = decide(
        planner.modeled_acceptance_vector(args.alpha, 4),
        f"modeled_{args.alpha}")
    plans.append(row_mod)
    res["plans"] = plans

    # slow-verify regimes (VERDICT r4 item 5): the tree exists to amortize
    # an expensive verify (the reference's offloaded verify is ~40x its
    # draft). Scale the MEASURED on-chip verify times by k and re-decide:
    # the margin sweep shows where on this hardware's cost curve the tree
    # starts paying (sp-sharded or host-offload verify regimes).
    res["slow_verify_sweep"] = []
    for scale in (2.0, 4.0, 8.0, 40.0):
        row_s, _, _ = decide(planner.modeled_acceptance_vector(args.alpha, 4),
                             f"verify_x{scale:g}", verify_scale=scale)
        row_s["verify_scale"] = scale
        res["slow_verify_sweep"].append(row_s)

    # the reference's offloading regime, through the same planner: its own
    # measured draft/verify times (tree/config.json) — verify ~40x the
    # draft cost, so a LARGE tree amortizes it
    gm_ref, cost_ref, (m_ref, l_ref) = planner.choose_tree(
        planner.modeled_acceptance_vector(0.8, 4), [512, 576, 640, 768],
        [1.0659, 1.1067, 1.1467, 1.1907], draft_time=0.0272, max_depth=24)
    res["reference_offloading_regime"] = {
        "chosen_size": int(m_ref), "chosen_depth": int(l_ref),
        "pred_ms_per_token": round(1e3 * cost_ref, 3),
        "source": "reference tree/config.json measured times "
                  "(draft 27.2 ms, verify 1.066-1.19 s)"}
    log(f"[bench] planner[reference offloading times]: {m_ref} nodes "
        f"depth {l_ref} -> {1e3 * cost_ref:.1f} ms/tok predicted")

    if owns_engine:
        del engine
    del state
    settle(20)

    # RUN the planner-chosen on-chip configuration end to end (controlled
    # acceptance), so the recorded tree row's shape comes from measurement
    A = copy.copy(args)
    A.tree_size = row_mod["chosen_size"]
    A.tree_depth = max(int(depth_mod), 2)
    A.tree_budget = 4096 if preset != "tiny" else 16
    A.ssl = 0
    A.prefill = prefill   # same context as the phase measurements
    res["run"] = run_tree(preset, A, gm=gm_mod)
    res["run"]["config_source"] = "planner.choose_tree on measured times"
    return res


def run_tree(preset: str, args, gm=None):
    """Sequoia tree mode (TreeEngine) at the reference's own scale
    (tree_size 512, budget 12288, prefill 130048 —
    /root/reference/test/offloading_seqouia.py:71-77) with ssl hybrid
    layers and int8 weights: raw random-weight throughput PLUS the
    controlled-acceptance (forced per-child coin) sweep, mirroring the
    flat modes' methodology (TreeEngine.generate_forced)."""
    import jax
    import jax.numpy as jnp
    from triforce_tpu import config as C
    from triforce_tpu.models import llama
    from triforce_tpu.tree import planner
    from triforce_tpu.tree.spectree import TreeEngine

    if preset == "tiny":
        cfg, prefill, gen_len = C.TINY_TARGET, args.prefill or 64, \
            args.gen_len or 32
        budget, chunk, size, depth, ssl = 16, 4, 8, 4, 0
        dtype = jnp.float32
    else:
        cfg, gen_len = C.BENCH_7B_PROXY, args.gen_len or 128
        prefill = args.prefill or 130048      # offloading_seqouia.py:75
        budget, chunk = args.tree_budget, 8   # offloading_seqouia.py:74
        size, depth = args.tree_size, args.tree_depth
        ssl = args.ssl
        dtype = jnp.bfloat16

    if gm is None:
        pvec = planner.modeled_acceptance_vector(0.8, 4)
        T, choice = planner.plan_tree(pvec, size, depth)
        gm = planner.build_grow_map(T, choice, size, depth)
    log(f"[bench] tree: size {gm.size}, depth {int(gm.depth.max())}, "
        f"{gm.num_levels} grow levels, budget {budget}, ssl {ssl}, "
        f"prefill {prefill}")
    params = llama.init_params(jax.random.PRNGKey(0), cfg, dtype=dtype)
    jax.block_until_ready(params)
    engine = TreeEngine(
        cfg, gm, params, prefill=prefill,
        max_cache_len=prefill + 4 * (gen_len + 2 * gm.size),
        budget=budget, chunk_size=chunk, temperature=0.6, top_p=0.9,
        dtype=dtype, kv_quant=args.kv_dtype == "int8",
        weight_quant=args.weights == "int8", ssl=ssl,
        prefill_chunk=args.prefill_chunk)

    def one_prefill(seed):
        ids = jax.random.randint(jax.random.PRNGKey(seed), (1, prefill),
                                 0, cfg.vocab_size)
        t0 = time.perf_counter()
        st = engine.init_state(jax.random.PRNGKey(seed))
        st = engine.prefill_target(st, ids)
        _ = int(st.next_token[0])
        return st, time.perf_counter() - t0

    _st, _ = one_prefill(seed=3)   # compile warm-up, never timed
    del _st
    st, prefill_s = one_prefill(seed=31)
    st, *_ = read_out(engine.generate(st, gen_len))     # generate compile
    t0 = time.perf_counter()
    st, buf, n, counters, _ = read_out(engine.generate(st, gen_len))
    dt = time.perf_counter() - t0
    gen = n - 1
    steps, nodes = int(counters[0]), int(counters[1])
    res = {"prefill_s": prefill_s, "tree_size": gm.size,
           "depth": int(gm.depth.max()), "budget": budget, "ssl": ssl,
           "raw": {
               "methodology": "raw-random-weights",
               "tokens_per_sec": gen / dt,
               "ms_per_token": 1e3 * dt / max(gen, 1),
               "tokens_per_step": gen / max(steps, 1),
               "step_ms": 1e3 * dt / max(steps, 1),
               "accepted_nodes_per_step": nodes / max(steps, 1)}}
    log(f"[bench] tree raw: {gen / dt:.2f} tok/s, "
        f"{gen / max(steps, 1):.2f} tok/step, step "
        f"{1e3 * dt / max(steps, 1):.1f} ms (tree_size {gm.size})")

    res["forced"] = {}
    for i, alpha in enumerate(sorted({0.8, args.alpha})):
        # alpha traced: one compiled program for the whole sweep. The
        # headline alpha runs 3 repeats so the row carries a run-to-run
        # sigma — the planner's tree-vs-flat decision margin is only
        # meaningful against it (VERDICT r4 item 5)
        reps = 3 if alpha == args.alpha else 1
        tps_list = []
        gen = steps = nodes = 0
        dt = 0.0
        for r in range(reps):
            st, n, counters, dt_r = timed_generation(
                lambda s: engine.generate_forced(s, gen_len, alpha),
                st, gen_len, warm=i == 0 and r == 0)
            tps_list.append((n - 1) / dt_r)
            gen += n - 1
            steps += int(counters[0])
            nodes += int(counters[1])
            dt += dt_r
        row = {
            "methodology": "forced-coin",
            "tokens_per_sec": gen / dt,
            "ms_per_token": 1e3 * dt / max(gen, 1),
            "tokens_per_step": gen / max(steps, 1),
            "step_ms": 1e3 * dt / max(steps, 1),
            "accepted_nodes_per_step": nodes / max(steps, 1)}
        if reps > 1:
            row["tokens_per_sec_sigma"] = round(float(np.std(tps_list)), 2)
            row["runs"] = [round(x, 2) for x in tps_list]
        res["forced"][str(alpha)] = row
        log(f"[bench] tree forced alpha={alpha}: {gen / dt:.2f} tok/s"
            + (f" +/- {row['tokens_per_sec_sigma']}" if reps > 1 else "")
            + f", {gen / max(steps, 1):.2f} tok/step, step "
              f"{1e3 * dt / max(steps, 1):.1f} ms")
    del engine, params, st
    return res


def batched_args(args, preset: str):
    """Shared arg massaging for the batched/serve modes: shorter context (B
    caches must fit HBM) and a LOCKSTEP middle loop (the vmapped while_loop
    pays the MAX trip count over rows every step)."""
    A = copy.copy(args)
    A.prefill = 15872 if preset in ("7b-proxy", "13b-proxy") else 64
    A.gen_len = None
    if A.trips == 0:
        # one chain round + one retry covers a mid-chain rejection
        k = max(1, min(A.chain if A.chain > 0 else A.gamma, A.gamma))
        A.trips = -(-A.gamma // (k + 1)) + 1
    return A


def build_batched_engine(args, preset: str, serve_gen: int, segment: int = 8):
    """ONE engine for both the batched and serve modes (they share context
    and drafter; building two wastes an engine init + a ~1 min prefill
    compile). Cache headroom = max of the sweep's decode need and the
    scheduler's own (gated) growth bound; cache_pad 512 keeps the per-row
    cache ~17% leaner than the default 4096-pad so the B=8 deep-sharing
    row fits HBM (16896 slots still has a 2112 kernel block)."""
    from triforce_tpu.batched_spec import SpecScheduler
    A = batched_args(args, preset)
    # size for the steady-state serve row (16 x 256) too — one engine
    # serves the whole batched/serve suite
    headroom = max(1024,
                   SpecScheduler.required_headroom(max(serve_gen, 256),
                                                   segment, A.gamma))
    engine, prefill, _ = build_engine(preset, A, with_draft=True,
                                      weight_quant=args.weights == "int8",
                                      cache_headroom=headroom,
                                      cache_pad=512)
    return engine, A, prefill


def run_batched(engine, A, prefill, args, rows: int = 4,
                rows_max: int = 8):
    """Batched speculation (beyond-reference axis): aggregate decode
    throughput of B rows speculating together in one program vs one row,
    at a context where B caches fit one chip's HBM. Decode is
    bandwidth-bound, so rows share every weight read; the per-row KV
    streams are the irreducible cost. Runs the TRIFORCE schedule (chain
    drafting). The headline number is the SLOPE scaling (per-step cost with
    the fixed dispatch round trip cancelled — the production per-step cost;
    VERDICT r4 item 3); the aggregate including dispatch is reported
    alongside.

    Every B row also carries its BYTE-MODEL slope ceiling (per-step HBM
    bytes from the engine's own shapes and the run's OWN mid-verify
    counters / tokens): per-row KV streams bound scaling well below B, and
    the ceiling states that bound explicitly — at these shapes the B=4
    ceiling is ~1.8x (the r4 component-sum "2.18x" embedded B=1 overheads),
    so the sweep extends to B=8 where sharing is deeper. Returns
    (record, bat) — the B=rows BatchedSpecEngine is handed to the serve
    mode so its fused segment programs are reused."""
    import jax
    from triforce_tpu.batched_spec import BatchedSpecEngine

    steps = 24
    res = {"rows": rows, "prefill": prefill, "steps": steps,
           "mode": "triforce", "methodology": "forced-coin"}
    steps_lo = steps // 3
    bat_out = None
    bm = ByteModel(engine)
    sweep = [b for b in (1, rows, rows_max) if b]
    for b in dict.fromkeys(sweep):
        try:
            bat = BatchedSpecEngine(engine, mode="triforce",
                                    force_accept=args.alpha, donate=True)
            prompts = [make_ids(engine, 40 + i)[:, :prefill]
                       for i in range(b)]
            st = bat.prefill_rows(prompts, list(range(b)))
            st, toks, ns, _c, _e = bat.decode(st, steps)  # compile warm-up
            _ = int(np.asarray(ns)[0, -1])
        except Exception as e:
            if b > rows and ("RESOURCE_EXHAUSTED" in str(e)
                             or "Largest program" in str(e)):
                # the deeper-sharing row is best-effort: B caches must fit
                log(f"[bench] batched B={b}: does not fit HBM; skipping")
                res[f"b{b}"] = {"skipped": "RESOURCE_EXHAUSTED"}
                settle(20)
                continue
            raise
        # the short run also warms the steps_lo program, and its wall
        # gives the slope: (t_hi - t_lo)/(steps - steps_lo) is per-step
        # cost with the fused dispatch's fixed ~60-70 ms tunnel round trip
        # cancelled (at 24 steps that fixed cost is ~2.5 ms/step of the
        # aggregate number — production fuses whole generations, so the
        # slope is the production per-step cost)
        st, toks, ns, _c, _e = bat.decode(st, steps_lo)
        _ = int(np.asarray(ns)[0, -1])
        t0 = time.perf_counter()
        st, toks, ns, _c, _e = bat.decode(st, steps_lo)
        _ = int(np.asarray(ns)[0, -1])
        t_lo = time.perf_counter() - t0
        ctx0 = float(np.mean(jax.device_get(st.kv.seq_len)))
        t0 = time.perf_counter()
        st, toks, ns, c, _e = bat.decode(st, steps)
        total = int(np.asarray(ns).sum())
        dt = time.perf_counter() - t0
        ctx1 = float(np.mean(jax.device_get(st.kv.seq_len)))
        c = np.asarray(c, np.float64)
        slope_ms = 1e3 * (dt - t_lo) / (steps - steps_lo)
        # byte-model slope ceiling for THIS B: weights stream once per
        # step; every row pays its own ctx + live-rkv streams. drafts per
        # step = mid_draft/chain forwards + 1 replay (shared weight-bound
        # reads, counted once — the drafter rows batch on shared weights)
        mid_w = float(c[:, 2].max()) / steps          # lockstep trips
        mid_kv_rows = float(c[:, 3].sum()) / steps    # live rkv streams
        drafts = (mid_w * ((A.chain if A.chain > 0 else A.gamma)) + 1)
        step_bytes = (bm.w_bytes * (1 + mid_w)
                      + bm.kv_tok * 0.5 * (ctx0 + ctx1) * b
                      + bm.kv_tok * bm.budget * mid_kv_rows
                      + drafts * (bm.d_bytes + bm.d_win))
        ideal_ms = 1e3 * step_bytes / (819e9)
        res[f"b{b}"] = {"tokens_per_sec": total / dt,
                        "step_ms": 1e3 * dt / steps,
                        "step_ms_slope": round(slope_ms, 4),
                        "ideal_step_ms_byte_model": round(ideal_ms, 3),
                        "tokens": total}
        log(f"[bench] batched B={b}: {total / dt:.1f} tok/s aggregate "
            f"({1e3 * dt / steps:.1f} ms/step incl dispatch, "
            f"{slope_ms:.1f} ms/step slope vs {ideal_ms:.1f} byte-model "
            f"floor, {total} tokens)")
        del st
        if b == rows:
            bat_out = bat        # serve reuses its compiled programs
        else:
            del bat
        settle()
    for b in dict.fromkeys(sweep):
        if b == 1 or "skipped" in res.get(f"b{b}", {"skipped": 1}):
            continue
        res[f"scaling_b{b}"] = round(
            res[f"b{b}"]["tokens_per_sec"]
            / max(res["b1"]["tokens_per_sec"], 1e-9), 4)
        res[f"scaling_slope_b{b}"] = round(
            b * res["b1"]["step_ms_slope"]
            / max(res[f"b{b}"]["step_ms_slope"], 1e-9), 4)
        res[f"scaling_slope_ceiling_b{b}"] = round(
            b * res["b1"]["ideal_step_ms_byte_model"]
            / max(res[f"b{b}"]["ideal_step_ms_byte_model"], 1e-9), 4)
        log(f"[bench] batched scaling B={b}/B=1: "
            f"{res[f'scaling_b{b}']:.2f}x aggregate, "
            f"{res[f'scaling_slope_b{b}']:.2f}x by slope "
            f"(byte-model ceiling {res[f'scaling_slope_ceiling_b{b}']:.2f}x"
            f" at these shapes)")
    # back-compat headline fields (B=rows)
    res["scaling"] = res.get(f"scaling_b{rows}", 0.0)
    res["scaling_slope"] = res.get(f"scaling_slope_b{rows}", 0.0)
    return res, bat_out


def run_serve(engine, A, prefill, args, slots: int = None,
              n_requests: int = None, bat=None, segment: int = 8):
    """Continuous speculative batching (SpecScheduler): ``n_requests``
    requests flow through ``slots`` speculative slots — admission
    (single-row prefill + row write), fused batched spec segments, retire
    on length. Measures aggregate SERVING throughput including admission
    churn, at the same shorter context as run_batched (slot caches must
    fit HBM) and the same controlled acceptance. The fixed-batch
    run_batched number is the zero-churn ceiling; the reference has no
    serving story at all (bsz=1 assert, models/TP_llama.py:71).

    ``bat``: reuse the batched mode's B=slots BatchedSpecEngine so the
    fused segment program is already compiled (segment == the batched
    mode's short-run step count)."""
    from triforce_tpu.batched_spec import SpecScheduler
    from triforce_tpu.batching import Request

    slots = slots or args.serve_slots
    n_requests = n_requests or args.serve_requests
    gen_len = args.serve_gen or (64 if "13b" not in (args.preset or "")
                                 else 48)

    def submit_all(sched, n, max_new, rid0=300):
        for i in range(n):
            sched.submit(Request(
                rid=rid0 + i,
                prompt=np.asarray(make_ids(engine, rid0 + i)).reshape(-1),
                max_new_tokens=max_new))

    # ONE scheduler for warm-up AND the timed runs: the batched-step jit
    # closures live on the scheduler's BatchedSpecEngine instance, so a
    # fresh scheduler would recompile the fused segment program inside the
    # timed region (r4 serve-bench finding: 31.7 s "decode" was ~25 s of
    # compile)
    sched = SpecScheduler(engine, mode="triforce", slots=slots,
                          segment=segment, force_accept=args.alpha, bat=bat)
    submit_all(sched, 1, 4)
    sched.run(max_wall_s=1200)
    settle()

    def timed_serve(n_req, max_new, rid0):
        submit_all(sched, n_req, max_new, rid0)
        t0 = time.perf_counter()
        done = sched.run(max_wall_s=2400)
        wall = time.perf_counter() - t0
        total = sum(len(r.out) for r in done)
        # each request's out[0] is the PREFILL sample (produced during
        # admission, costed to admit_s) — exclude it from the
        # decode-segment numerator so the split stays honest
        seg_tokens = sum(max(len(r.out) - 1, 0) for r in done)
        st = sched.stats
        # admission (chunked prefill slices, interleaved between decode
        # segments) vs decode wall split: decode-segment throughput is
        # the number comparable to the fixed-batch ceiling; the overall
        # number counts all processed tokens
        rec = {"slots": slots, "n_requests": n_req, "prefill": prefill,
               "gen_len": max_new, "completed": len(done),
               "methodology": "forced-coin",
               "decode_tokens": seg_tokens,
               "prefill_tokens": st["prefill_tokens"],
               "wall_s": round(wall, 3),
               "admit_s": round(st["admit_s"], 3),
               "decode_s": round(st["decode_s"], 3),
               "decode_segment_tokens_per_sec":
                   round(seg_tokens / max(st["decode_s"], 1e-9), 2),
               "aggregate_decode_tokens_per_sec": round(total / wall, 2),
               "total_processed_tokens_per_sec":
                   round((total + st["prefill_tokens"]) / wall, 2)}
        log(f"[bench] serve {n_req}x{max_new}: {len(done)}/{n_req} "
            f"requests, {seg_tokens} decode + {st['prefill_tokens']} "
            f"prefill tokens in {wall:.1f}s ({st['admit_s']:.1f}s "
            f"admission, {st['decode_s']:.1f}s decode) -> decode segments "
            f"{seg_tokens / max(st['decode_s'], 1e-9):.1f} tok/s, total "
            f"processed {(total + st['prefill_tokens']) / wall:.0f} tok/s "
            f"({slots} slots)")
        return rec

    res = timed_serve(n_requests, gen_len, rid0=300)
    # steady-state row (the r4 round4_serve_steady comparison point:
    # 16 requests x 256 tokens through 4 slots, 22.6 s wall / 662 tok/s
    # decode segments pre-overlap+gating) — same scheduler, same programs
    settle()
    res["steady"] = timed_serve(16, 256, rid0=600)
    del sched
    return res


def run_13b(args, coin_seed=None):
    """13b-proxy context row (VERDICT r4 item 9): the reference publishes
    Llama2-13B-128K numbers (index.html:197-202, 13B KV:weights byte ratio
    ~3.8 at 128K vs the 7B's 4.6); ``BENCH_13B_PROXY`` mirrors the 7b
    proxy's byte-ratio construction at that ratio (config.py). The row is
    LEAN — AR floor + forced point + calibrated triforce at the headline
    prefill — validating that the headline methodology holds at a
    different KV:weights ratio."""
    A = copy.copy(args)
    A.prefill = None           # preset default 124928
    A.gen_len = None           # preset default 64 (keeps the row lean)
    A.preset = "13b-proxy"
    engine, prefill, gen_len = build_engine(
        "13b-proxy", A, with_draft=True,
        weight_quant=args.weights == "int8")
    _s, _ = timed_prefill(engine, seed=7, with_draft=True,
                          label=" 13b warmup(compile)")
    del _s
    settle()
    res = {"preset": "13b-proxy", "prefill": prefill, "gen_len": gen_len}
    res["ar"] = run_ar(engine, gen_len)
    settle()
    spec, _ = run_spec(engine, gen_len, "triforce", [args.alpha],
                       with_draft=True,
                       calibrate_to=args.alpha if args.calibrate else None,
                       coin_seed=coin_seed, lean=True, seed=29)
    res["triforce"] = spec
    head = spec.get("calibrated") or spec["forced"][str(args.alpha)]
    res["speedup_vs_ar"] = round(
        head["tokens_per_sec"] / res["ar"]["tokens_per_sec"], 4)
    log(f"[bench] 13b-proxy: {head['tokens_per_sec']:.1f} tok/s vs AR "
        f"{res['ar']['tokens_per_sec']:.1f} -> {res['speedup_vs_ar']:.2f}x")
    del engine
    return res
