"""Benchmark harness: decode speedup of TriForce speculation vs plain
autoregressive decoding at long context, on whatever backend is available.

Prints ONE JSON line on stdout:
    {"metric": ..., "value": N, "unit": ..., "vs_baseline": N, ...}
Progress goes to stderr.

Reference baseline (BASELINE.md): 2.2x E2E decode speedup vs autoregressive
for Llama2-7B-128K at 124K prefill on one A100 (reference README.md:49-55).
On one TPU chip we measure every phase on ``BENCH_7B_PROXY`` — the 7B
config's KV:weights byte ratio reproduced at single-chip scale (config.py) —
with a REAL chunked prefill, the retrieval self-speculation hierarchy
(2-level, BASELINE.json config 2) AND the full 3-level drafter hierarchy
(config 3, drafter = the reference's llama-68m architecture).

Headline metric: MEASURED end-to-end tokens/s at CONTROLLED acceptance.
Checkpoints are unreachable (no egress) and random weights cannot express
trained-model acceptance (deep random nets are chaotic — raw measured
acceptance here is ~0.05, which benchmarks the fixture, not the system). So
the accept test is forced to a coin flip at the reference's published
per-token rate (alpha, default 0.9) while EVERY real forward runs: drafter
steps, middle verifies over the retrieval cache, full-cache target verify,
rollback, tail refresh. Tokens-per-step is then measured, not composed from
a formula. A sensitivity sweep over alpha in {0.7, 0.8, 0.9} and the raw
random-weight run are reported alongside.

Timing methodology: compile is separated from run (a warm-up prefill with
different ids precedes every timed prefill); each timed generation consumes
the warm-up's output state so the dispatch can never be a memoized replay
(axon tunnel memoizes identical dispatches); host readbacks mark completion.
"""

from __future__ import annotations

import argparse
import json
import sys
import time

import numpy as np


def log(msg: str) -> None:
    print(msg, file=sys.stderr, flush=True)


# v5e HBM peak bandwidth (public spec: 819 GB/s/chip). Used only to anchor
# the achieved-GB/s fraction; on non-TPU backends frac_of_peak is omitted.
V5E_PEAK_GBPS = 819.0


def _nbytes(tree) -> int:
    import jax
    return int(sum(x.nbytes for x in jax.tree.leaves(tree)))


class ByteModel:
    """Analytic HBM-traffic model from the ENGINE'S OWN shapes/dtypes —
    makes the 'AR floor is near speed-of-light' claim auditable in the
    bench JSON (VERDICT r3 weak#3). Decode is read-dominated; writes
    (gamma+2 new KV slots) are <0.1% and ignored.

    Weights READ per forward = every matmul operand (stacked layers +
    lm_head + scale planes + final_norm); the embed table is a T-row
    gather, not a stream, so only lm_head-side bytes count.
    KV READ per token of context = codes + fp32 scale planes (int8 mode).
    """

    def __init__(self, engine):
        cfg = engine.target_cfg
        t = engine.t_params
        self.w_bytes = (_nbytes(t["layers"]) + t["lm_head"].nbytes
                        + t.get("lm_head_scale", np.zeros(())).nbytes
                        + t["final_norm"].nbytes)
        kv_item = 1 if engine.kv_quant else np.dtype(engine.dtype).itemsize
        self.kv_tok = cfg.num_layers * 2 * cfg.num_kv_heads * (
            cfg.head_dim * kv_item + (4 if engine.kv_quant else 0))
        self.budget = engine.spec.budget
        self.d_bytes = self.d_win = 0
        if engine.d_params is not None:
            d = engine.d_params
            dcfg = engine.draft_cfg
            self.d_bytes = (_nbytes(d["layers"]) + d["lm_head"].nbytes
                            + d.get("lm_head_scale",
                                    np.zeros(())).nbytes)
            win = (engine.spec.draft_start_size
                   + engine.spec.draft_recent_size + engine.spec.gamma + 3)
            ditem = np.dtype(engine.dtype).itemsize
            self.d_win = dcfg.num_layers * 2 * dcfg.num_kv_heads * \
                dcfg.head_dim * ditem * win

    def ar_token(self, avg_ctx: float) -> float:
        return self.w_bytes + self.kv_tok * avg_ctx

    def spec_step(self, avg_ctx: float, mid_verifies: float,
                  drafts: float) -> float:
        """Bytes of ONE spec step: 1 full-cache target verify +
        ``mid_verifies`` retrieval-cache middle verifies + ``drafts``
        drafter forwards (incl. the replay)."""
        return (self.w_bytes + self.kv_tok * avg_ctx
                + mid_verifies * (self.w_bytes + self.kv_tok * self.budget)
                + drafts * (self.d_bytes + self.d_win))


def add_bandwidth(row: dict, bytes_per_token: float, on_tpu: bool) -> dict:
    """Annotate a result row with achieved GB/s (+ fraction of v5e peak)."""
    gbps = bytes_per_token / (row["ms_per_token"] / 1e3) / 1e9
    row["bytes_per_token"] = round(bytes_per_token / 1e6, 2)  # MB
    row["achieved_gbps"] = round(gbps, 1)
    if on_tpu:
        row["frac_of_peak"] = round(gbps / V5E_PEAK_GBPS, 4)
    return row


def build_engine(preset: str, args, with_draft: bool,
                 weight_quant: bool = False, cache_headroom: int = None):
    import jax.numpy as jnp
    from triforce_tpu import config as C
    from triforce_tpu.config import SpecConfig
    from triforce_tpu.engine import Engine
    from triforce_tpu.models import llama
    import jax

    trips = getattr(args, "trips", 0)
    if preset == "tiny":
        cfg, dcfg = C.TINY_TARGET, C.TINY_DRAFT
        spec = SpecConfig(gamma=3, budget=16, chunk_size=4,
                          draft_start_size=4, draft_recent_size=12,
                          temperature=0.6, top_p=0.9,
                          middle_chain=args.chain, middle_trips=trips)
        prefill = args.prefill or 64
        gen_len = args.gen_len or 32
        dtype = jnp.float32
    elif preset == "7b-proxy":
        cfg, dcfg = C.BENCH_7B_PROXY, C.LLAMA_68M
        # reference on-chip config: gamma 6, budget 4096, chunk 8,
        # draft_cache_budget 266 -> recent = 266 - 16 - 6 (on_chip.py:77)
        spec = SpecConfig(gamma=args.gamma, budget=4096, chunk_size=8,
                          draft_start_size=16,
                          draft_recent_size=250 - args.gamma,
                          temperature=0.6, top_p=0.9,
                          middle_chain=args.chain, middle_trips=trips)
        # reference headline prefill (README.md:51). The proxy's 128K int8
        # cache is ~8.6 GB incl. scale planes — fits the 16 GB chip with
        # the donated single-cache-set discipline (HBM accounting in
        # NOTES_ROUND3.md).
        prefill = args.prefill or 124928
        gen_len = args.gen_len or 128
        dtype = jnp.bfloat16
    else:
        raise SystemExit(f"unknown preset {preset!r}")

    log(f"[bench] preset={preset} prefill={prefill} gen_len={gen_len} "
        f"budget={spec.budget} gamma={spec.gamma} draft={with_draft}")
    t0 = time.perf_counter()
    params = llama.init_params(jax.random.PRNGKey(0), cfg, dtype=dtype)
    jax.block_until_ready(params)
    d_params = d_cfg = None
    if with_draft:
        d_cfg = dcfg
        d_params = llama.init_params(jax.random.PRNGKey(1), dcfg,
                                     dtype=dtype)
        jax.block_until_ready(d_params)
    log(f"[bench] params initialised in {time.perf_counter() - t0:.1f}s")
    engine = Engine(cfg, spec, params, draft_cfg=d_cfg, draft_params=d_params,
                    prefill=prefill,
                    max_cache_len=prefill + (
                        cache_headroom
                        or 32 * (gen_len + spec.gamma + 2)),
                    dtype=dtype, prefill_chunk=args.prefill_chunk,
                    kv_quant=args.kv_dtype == "int8",
                    weight_quant=weight_quant, donate=True)
    return engine, prefill, gen_len


def make_ids(engine, seed):
    import jax
    return jax.random.randint(jax.random.PRNGKey(seed), (1, engine.prefill),
                              0, engine.target_cfg.vocab_size)


def timed_prefill(engine, seed, with_draft: bool, label=""):
    """One full prefill (target + optional drafter) ended by a host
    readback. Caller must have warmed compile with DIFFERENT ids first."""
    import jax
    ids = make_ids(engine, seed)
    t0 = time.perf_counter()
    state = engine.init_state(jax.random.PRNGKey(seed))
    state = engine.prefill_target(state, ids)
    if with_draft:
        state = engine.prefill_draft(state, ids)
    _ = int(state.next_token[0])
    dt = time.perf_counter() - t0
    log(f"[bench] prefill{label}({ids.shape[1]}) in {dt:.1f}s "
        f"({ids.shape[1] / dt:.0f} tok/s)")
    return state, dt


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


def _timed_generation(fn, state, gen_len, warm=True):
    """Optional warmup (compile) -> timed run from the warmup's output
    state. The engine donates cache buffers, so each call CONSUMES its
    input state and at most one cache set is live (the 7b-proxy cache is
    ~4.4 GB; keeping saved states OOMs the 16 GB chip). Returns the timed
    run's output state so the caller can chain further measurements."""
    if warm:
        state, *_ = _read(fn(state))
    t0 = time.perf_counter()
    state, buf, n, counters, _ = _read(fn(state))
    dt = time.perf_counter() - t0
    return state, n, counters, dt


def _settle(seconds: float = 10.0) -> None:
    """Give the device allocator time to process async frees between
    phases. Through the axon tunnel, buffer releases from a finished phase
    land asynchronously; launching the next phase's compile+dispatch
    immediately can transiently hold an extra cache set and OOM the chip."""
    import jax
    if jax.default_backend() == "tpu":
        time.sleep(seconds)


def _read(out):
    """Force completion via host readback of the token count."""
    state, buf, n, counters, stop = out
    n = int(n)
    return state, buf, n, np.asarray(counters), stop


def run_spec(engine, gen_len, mode, alphas, with_draft,
             calibrate_to=None):
    """Speculative decode: raw (real rejection test on random weights) +
    measured throughput at each forced acceptance alpha."""
    state, prefill_s = timed_prefill(engine, seed=23, with_draft=with_draft,
                                     label=f" {mode}")

    res = {"prefill_s": prefill_s}
    state, n, counters, dt = _timed_generation(
        lambda s: engine.generate(s, gen_len, mode=mode), state, gen_len)
    gen = n - 1
    steps, accepted, proposed = int(counters[0]), int(counters[1]), \
        int(counters[2])
    res["raw"] = {
        "tokens_per_sec": gen / dt, "ms_per_token": 1e3 * dt / max(gen, 1),
        "acceptance_rate": accepted / max(proposed, 1),
        "tokens_per_step": gen / max(steps, 1),
        "step_ms": 1e3 * dt / max(steps, 1)}
    log(f"[bench] {mode} raw: {gen / dt:.2f} tok/s, acceptance "
        f"{res['raw']['acceptance_rate']:.3f}, step "
        f"{res['raw']['step_ms']:.1f} ms")
    _settle()

    res["forced"] = {}
    for i, alpha in enumerate(alphas):
        # alpha is traced (one compile for all alphas): warm only the first
        state, n, counters, dt = _timed_generation(
            lambda s: engine.generate_forced(s, gen_len, alpha, mode=mode),
            state, gen_len, warm=i == 0)
        gen = n - 1
        steps = int(counters[0])
        acc_rate = int(counters[1]) / max(int(counters[2]), 1)
        res["forced"][str(alpha)] = {
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
        # search the coin rate whose REALIZED per-proposal acceptance hits
        # the target (a rejection truncates the chain, so realized < coin;
        # VERDICT r2 weak#6). alpha is traced: every probe reuses the one
        # compiled program. Secant-style update coin *= target/realized.
        target = calibrate_to
        # realized(coin) is monotone but STEEP near 1 (a rejection
        # truncates the chain), so bisect a bracket instead of a secant
        # (r3 try2: secant steps cycled between the clamp and undershoot).
        # lo = target always realizes below target; hi ~ 1 realizes ~ 1.
        # Each probe aggregates 3 same-shape runs (max_len is a STATIC arg
        # — a longer one would recompile the whole forced program) for
        # ~400+ proposals -> sigma ~ 0.02.
        lo, hi = target, 0.9995
        coin = realized = None
        for _ in range(6):
            coin = 0.5 * (lo + hi)
            acc = prop = 0
            for _r in range(3):
                state, n, counters, dt = _timed_generation(
                    lambda s: engine.generate_forced(s, gen_len, coin,
                                                     mode=mode),
                    state, gen_len, warm=False)
                acc += int(counters[1])
                prop += int(counters[2])
            realized = acc / max(prop, 1)
            log(f"[bench] {mode} calibrate: coin={coin:.4f} -> "
                f"realized {realized:.3f} (target {target})")
            if abs(realized - target) < 0.012:
                break
            if realized < target:
                lo = coin
            else:
                hi = coin
        # timed measurement at the calibrated coin, aggregated over 3
        # chained runs: a single 128-token run holds ~140 proposals, whose
        # realized-acceptance noise once produced a fluke realized=1.0 row
        # (gamma=8 r3 run) — aggregate the timing AND the acceptance
        gen = steps = acc = prop = mid_d = mid_v = 0
        dt = 0.0
        import jax
        ctx0 = int(jax.device_get(state.kv.seq_len))
        for _r in range(3):
            state, n, counters, dt_r = _timed_generation(
                lambda s: engine.generate_forced(s, gen_len, coin,
                                                 mode=mode),
                state, gen_len, warm=False)
            gen += n - 1
            steps += int(counters[0])
            acc += int(counters[1])
            prop += int(counters[2])
            mid_d += int(counters[5])
            mid_v += int(counters[7])
            dt += dt_r
        ctx1 = int(jax.device_get(state.kv.seq_len))
        realized = acc / max(prop, 1)
        res["calibrated"] = {
            "target_accept": target, "coin": round(coin, 4),
            "measured_accept": realized,
            # binomial error bar on the realized acceptance over the
            # aggregated proposals (the headline moves ~1x per 0.02 of
            # acceptance at the knee — VERDICT r3 weak#8)
            "measured_accept_sigma": round(
                float(np.sqrt(realized * (1 - realized) / max(prop, 1))), 4),
            "n_proposals": prop,
            "tokens_per_sec": gen / dt,
            "ms_per_token": 1e3 * dt / max(gen, 1),
            "tokens_per_step": gen / max(steps, 1),
            "step_ms": 1e3 * dt / max(steps, 1)}
        # analytic HBM traffic of the measured steps (byte model over the
        # engine's own shapes; mid verifies + drafter forwards from the
        # device counters; +1 drafter replay per step)
        bm = ByteModel(engine)
        drafts = (mid_d / max(steps, 1) + 1) if with_draft else 0.0
        step_bytes = bm.spec_step(0.5 * (ctx0 + ctx1),
                                  mid_v / max(steps, 1), drafts)
        add_bandwidth(res["calibrated"],
                      step_bytes / (gen / max(steps, 1)),
                      jax.default_backend() == "tpu")
        log(f"[bench] {mode} CALIBRATED realized="
            f"{res['calibrated']['measured_accept']:.3f} (coin {coin:.3f}):"
            f" {gen / dt:.2f} tok/s, {gen / max(steps, 1):.2f} tok/step")
    del state
    return res


def run_planner(preset: str, args):
    """Planner-driven tree operating point (VERDICT r4 item 4): measure the
    per-phase times and the acceptance vector ON THIS HARDWARE, let
    ``planner.choose_tree`` pick (tree_size, depth) from them, evaluate the
    planner's own flat-chain prediction, and RUN the chosen configuration —
    the tree's operating point is chosen by measured times, not by hand.
    Also records the plan the same planner produces from the reference's
    OWN measured offloading times (/root/reference/tree/config.json: draft
    27.2 ms, verify 1.066-1.19 s) — the slow-verify regime the Sequoia tree
    exists for, where it picks the reference-scale tree."""
    import copy

    import jax
    import jax.numpy as jnp
    from triforce_tpu import profiling
    from triforce_tpu.models import llama as llama_mod
    from triforce_tpu.tree import planner

    engine, prefill, gen_len = build_engine(
        preset, args, with_draft=False,
        weight_quant=args.weights == "int8")
    _s, _ = timed_prefill(engine, seed=89, with_draft=False,
                          label=" planner warmup(compile)")
    del _s
    _settle()
    state, prefill_s = timed_prefill(engine, seed=91, with_draft=False,
                                     label=" planner")
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
                                          for x in p_meas]}

    def flat_cost_at(p, gamma):
        # the planner's own FLAT-chain prediction: flat retrieval mode is a
        # (gamma+1)-node branch-1 "tree" (gamma middle steps + 1 verify)
        T, _ = planner.plan_tree(p, gamma + 1, gamma + 1)
        e_flat = max(float(T[gamma + 1, gamma + 1, 1]), 1e-9)
        return (gamma * pt["middle_step"] + pt["target_verify"]) / e_flat

    def decide(p, tag):
        gm, cost, (m, depth) = planner.choose_tree(
            p, sizes, vt, draft_time=pt["middle_step"],
            max_depth=args.tree_depth)
        flat_cost = flat_cost_at(p, args.gamma)
        # the planner also CHOOSES the flat schedule's gamma from the same
        # measured times (the reference hand-picks gamma=6; here the
        # operating point is the planner's own output)
        sweep = {g: flat_cost_at(p, g) for g in range(2, 17)}
        g_best = min(sweep, key=sweep.get)
        # the tree must beat the planner's BEST flat schedule (the sweep's
        # chosen gamma), not just the CLI gamma — otherwise "tree wins"
        # could contradict the sweep published in the same row
        best_flat = min(flat_cost, sweep[g_best])
        row = {"p": tag, "chosen_size": int(m), "chosen_depth": int(depth),
               "tree_pred_ms_per_token": round(1e3 * cost, 3),
               "flat_pred_ms_per_token": round(1e3 * flat_cost, 3),
               "flat_gamma_sweep_ms_per_token": {
                   str(g): round(1e3 * c, 3) for g, c in sweep.items()},
               "flat_best_gamma": int(g_best),
               "flat_best_pred_ms_per_token": round(1e3 * sweep[g_best], 3),
               "decision": "tree" if cost < best_flat else "flat"}
        log(f"[bench] planner[{tag}]: tree {m} nodes depth {depth} -> "
            f"{1e3 * cost:.2f} ms/tok vs best flat {1e3 * best_flat:.2f} "
            f"(gamma {g_best if sweep[g_best] < flat_cost else args.gamma})"
            f" -> {row['decision'].upper()} wins")
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

    del engine, state
    _settle(20)

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
    import jax, jax.numpy as jnp
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
    st, *_ = _read(engine.generate(st, gen_len))        # generate compile
    t0 = time.perf_counter()
    st, buf, n, counters, _ = _read(engine.generate(st, gen_len))
    dt = time.perf_counter() - t0
    gen = n - 1
    steps, nodes = int(counters[0]), int(counters[1])
    res = {"prefill_s": prefill_s, "tree_size": gm.size,
           "depth": int(gm.depth.max()), "budget": budget, "ssl": ssl,
           "raw": {
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
        # alpha traced: one compiled program for the whole sweep
        st, n, counters, dt = _timed_generation(
            lambda s: engine.generate_forced(s, gen_len, alpha),
            st, gen_len, warm=i == 0)
        gen, steps = n - 1, int(counters[0])
        res["forced"][str(alpha)] = {
            "tokens_per_sec": gen / dt,
            "ms_per_token": 1e3 * dt / max(gen, 1),
            "tokens_per_step": gen / max(steps, 1),
            "step_ms": 1e3 * dt / max(steps, 1),
            "accepted_nodes_per_step": int(counters[1]) / max(steps, 1)}
        log(f"[bench] tree forced alpha={alpha}: {gen / dt:.2f} tok/s, "
            f"{gen / max(steps, 1):.2f} tok/step, step "
            f"{1e3 * dt / max(steps, 1):.1f} ms")
    del engine, params, st
    return res


def run_batched(preset: str, args, rows: int = 4):
    """Batched speculation (beyond-reference axis): aggregate decode
    throughput of B rows speculating together in one program vs one row,
    at a context where B caches fit one chip's HBM. Decode is
    bandwidth-bound, so rows share every weight read; the per-row KV
    streams are the irreducible cost. Runs the TRIFORCE schedule (chain
    drafting): the retrieval schedule reads the full per-row budget gamma
    times per step, which caps batched scaling at ~2.3x regardless of B
    (probes/_r3_batched_small.py + round3_batched_hw model); the 3-level
    hierarchy's ~1.4 middle verifies/step leave the shared weight stream
    dominant."""
    from triforce_tpu.batched_spec import BatchedSpecEngine

    import copy
    A = copy.copy(args)   # same knobs, shorter context: B caches must fit
    A.prefill = 15872 if preset == "7b-proxy" else 64
    A.gen_len = None
    steps = 24
    if A.trips == 0:
        # lockstep middle loop for batched rows: the vmapped while_loop pays
        # the MAX trip count over rows every step (r3 finding: B=4 scaling
        # 1.07x vs ~2.3x model ceiling). One chain round + one retry covers
        # a mid-chain rejection.
        k = max(1, min(A.chain if A.chain > 0 else A.gamma, A.gamma))
        A.trips = -(-A.gamma // (k + 1)) + 1

    engine, prefill, _ = build_engine(preset, A, with_draft=True,
                                      weight_quant=args.weights == "int8")
    res = {"rows": rows, "prefill": prefill, "steps": steps,
           "mode": "triforce"}
    steps_lo = steps // 3
    for b in (1, rows):
        bat = BatchedSpecEngine(engine, mode="triforce",
                                force_accept=args.alpha, donate=True)
        prompts = [make_ids(engine, 40 + i)[:, :prefill] for i in range(b)]
        st = bat.prefill_rows(prompts, list(range(b)))
        st, toks, ns, _c, _e = bat.decode(st, steps)  # compile warm-up
        _ = int(np.asarray(ns)[0, -1])
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
        t0 = time.perf_counter()
        st, toks, ns, _c, _e = bat.decode(st, steps)
        total = int(np.asarray(ns).sum())
        dt = time.perf_counter() - t0
        slope_ms = 1e3 * (dt - t_lo) / (steps - steps_lo)
        res[f"b{b}"] = {"tokens_per_sec": total / dt,
                        "step_ms": 1e3 * dt / steps,
                        "step_ms_slope": round(slope_ms, 4),
                        "tokens": total}
        log(f"[bench] batched B={b}: {total / dt:.1f} tok/s aggregate "
            f"({1e3 * dt / steps:.1f} ms/step incl dispatch, "
            f"{slope_ms:.1f} ms/step slope, {total} tokens)")
        del st, bat
        _settle()
    res["scaling"] = res[f"b{rows}"]["tokens_per_sec"] / \
        max(res["b1"]["tokens_per_sec"], 1e-9)
    res["scaling_slope"] = round(
        rows * res["b1"]["step_ms_slope"]
        / max(res[f"b{rows}"]["step_ms_slope"], 1e-9), 4)
    log(f"[bench] batched scaling B={rows}/B=1: {res['scaling']:.2f}x "
        f"aggregate, {res['scaling_slope']:.2f}x by slope")
    del engine
    return res


def run_serve(preset: str, args, slots: int = None, n_requests: int = None):
    """Continuous speculative batching (SpecScheduler): ``n_requests``
    requests flow through ``slots`` speculative slots — admission
    (single-row prefill + row write), fused batched spec segments, retire
    on length. Measures aggregate SERVING throughput including admission
    churn, at the same shorter context as run_batched (slot caches must
    fit HBM) and the same controlled acceptance. The fixed-batch
    run_batched number is the zero-churn ceiling; the reference has no
    serving story at all (bsz=1 assert, models/TP_llama.py:71)."""
    import copy

    from triforce_tpu.batched_spec import SpecScheduler
    from triforce_tpu.batching import Request

    slots = slots or args.serve_slots
    n_requests = n_requests or args.serve_requests
    A = copy.copy(args)
    A.prefill = 15872 if preset == "7b-proxy" else 64
    A.gen_len = args.serve_gen or (64 if preset == "7b-proxy" else 12)
    if A.trips == 0:
        k = max(1, min(A.chain if A.chain > 0 else A.gamma, A.gamma))
        A.trips = -(-A.gamma // (k + 1)) + 1
    engine, prefill, gen_len = build_engine(
        preset, A, with_draft=True, weight_quant=args.weights == "int8",
        # the scheduler's own junk-growth bound, not the generic 32x
        # formula (which OOMs 4 slot caches at gen 256)
        cache_headroom=SpecScheduler.required_headroom(A.gen_len, 4,
                                                       A.gamma))

    def submit_all(sched, n, max_new):
        for i in range(n):
            sched.submit(Request(
                rid=300 + i,
                prompt=np.asarray(make_ids(engine, 300 + i)).reshape(-1),
                max_new_tokens=max_new))

    # ONE scheduler for warm-up AND the timed run: the batched-step jit
    # closures live on the scheduler's BatchedSpecEngine instance, so a
    # fresh scheduler would recompile the fused segment program inside the
    # timed region (r4 serve-bench finding: 31.7 s "decode" was ~25 s of
    # compile)
    sched = SpecScheduler(engine, mode="triforce", slots=slots,
                          force_accept=args.alpha)
    submit_all(sched, 1, 4)
    sched.run(max_wall_s=1200)
    _settle()
    submit_all(sched, n_requests, gen_len)
    t0 = time.perf_counter()
    done = sched.run(max_wall_s=2400)
    wall = time.perf_counter() - t0
    total = sum(len(r.out) for r in done)
    # each request's out[0] is the PREFILL sample (produced during
    # admission, costed to admit_s) — exclude it from the decode-segment
    # numerator so the split stays honest
    seg_tokens = sum(max(len(r.out) - 1, 0) for r in done)
    st = sched.stats
    # at long prompts the wall is ADMISSION-dominated (each admission
    # prefills a whole prompt: n_requests * prefill tokens processed vs
    # n_requests * gen_len decoded) — report the split so decode-segment
    # throughput is comparable to the fixed-batch ceiling and the overall
    # number counts all processed tokens
    res = {"slots": slots, "n_requests": n_requests, "prefill": prefill,
           "gen_len": gen_len, "completed": len(done),
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
    log(f"[bench] serve: {len(done)}/{n_requests} requests, {seg_tokens} "
        f"decode + {st['prefill_tokens']} prefill tokens in {wall:.1f}s "
        f"({st['admit_s']:.1f}s admission, {st['decode_s']:.1f}s decode) "
        f"-> decode segments "
        f"{seg_tokens / max(st['decode_s'], 1e-9):.1f} tok/s, "
        f"total processed {(total + st['prefill_tokens']) / wall:.0f} "
        f"tok/s ({slots} slots)")
    del engine, sched
    return res


def main() -> None:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--preset", default="auto",
                   choices=["auto", "tiny", "7b-proxy"])
    p.add_argument("--prefill", type=int, default=None)
    p.add_argument("--gen-len", type=int, default=None)
    p.add_argument("--prefill-chunk", type=int, default=512)
    p.add_argument("--kv-dtype", default="int8", choices=["bf16", "int8"],
                   help="KV-cache storage (int8 halves decode bytes and is "
                        "the framework's best configuration; the AR "
                        "baseline uses the SAME dtype, which is stronger "
                        "than the reference's fp16 baseline)")
    p.add_argument("--alpha", type=float, default=0.9,
                   help="headline acceptance (reference reports 0.9+ at "
                        "budget 4K / chunk 8)")
    p.add_argument("--weights", default="int8", choices=["bf16", "int8"],
                   help="weight storage for ALL engines (AR baseline AND "
                        "speculation — same dtype both sides, so the "
                        "speedup stays apples-to-apples; int8 halves the "
                        "weight stream, which the middle loop is bound by)")
    p.add_argument("--modes",
                   default="retrieval,triforce,batched,planner,serve",
                   help="comma list of retrieval | triforce | tree | "
                        "batched | planner | serve (continuous-batching "
                        "scheduler throughput). The default covers the headline "
                        "flat modes plus the beyond-reference batched row "
                        "and the measured-times planner decision (tree "
                        "at the reference's own 512/12288 scale is opt-in "
                        "via 'tree' — the planner row already runs the "
                        "measured-optimal tree)")
    p.add_argument("--tree-size", type=int, default=512,
                   help="tree mode: nodes (reference offloading_seqouia "
                        "runs 512)")
    p.add_argument("--tree-depth", type=int, default=24)
    p.add_argument("--tree-budget", type=int, default=12288,
                   help="tree mode retrieval budget (reference 12288)")
    p.add_argument("--ssl", type=int, default=4,
                   help="tree mode: grow layers < ssl attend the FULL "
                        "cache (reference hybrid attention)")
    p.add_argument("--gamma", type=int, default=6,
                   help="drafter lookahead (reference headline config: 6; "
                        "the r2 sweep measured gamma=8 ~4.5%% better)")
    p.add_argument("--trips", type=int, default=0,
                   help="middle-loop trip bound (SpecConfig.middle_trips): "
                        "0 = data-dependent while_loop (flat default). "
                        "Batched runs auto-pick ceil(gamma/(chain+1))+1 so "
                        "vmapped rows run in lockstep instead of paying the "
                        "max trip count over the batch")
    p.add_argument("--chain", type=int, default=0,
                   help="drafter tokens per middle verify "
                        "(SpecConfig.middle_chain): 0 = auto (gamma), "
                        "1 = the reference's one-draft-per-verify schedule. "
                        "The middle verify streams the full weight set, so "
                        "chaining is the main decode-latency lever "
                        "(NOTES_ROUND3.md)")
    p.add_argument("--calibrate", action="store_true", default=True,
                   help="search the accept-coin rate whose REALIZED "
                        "per-proposal acceptance hits --alpha, and quote "
                        "the headline there (the coin rate overstates "
                        "nothing: a rejection truncates the chain, so "
                        "realized < coin)")
    p.add_argument("--no-calibrate", dest="calibrate", action="store_false")
    p.add_argument("--weight-ar", action="store_true",
                   help="also measure the AR floor with int8 weight-only "
                        "quantization (extra engine + compile)")
    p.add_argument("--serve-slots", type=int, default=4,
                   help="serve mode: speculative slot count")
    p.add_argument("--serve-requests", type=int, default=8,
                   help="serve mode: number of requests")
    p.add_argument("--serve-gen", type=int, default=0,
                   help="serve mode: tokens per request (0 = preset "
                        "default; larger values measure steady state "
                        "closer to the zero-churn fixed-batch ceiling)")
    p.add_argument("--platform", default=None, choices=["cpu", "tpu"],
                   help="pin the JAX platform (the axon sitecustomize "
                        "force-registers the TPU regardless of "
                        "JAX_PLATFORMS, so --platform cpu is the only "
                        "reliable way to run the tiny preset off-chip)")
    args = p.parse_args()

    # The axon tunnel intermittently kills large remote compiles
    # ("response body closed before all bytes were read" — NOTES_ROUND3/4);
    # a flake mid-run invalidates nothing but wall time, so rebuild and
    # retry rather than dying. `done` carries each completed mode's record
    # across attempts so a flake late in a five-mode run (observed: during
    # the planner's tree run, after ~25 min of finished modes) only
    # re-measures what never finished.
    out = None
    done = {}
    for attempt in range(3):
        try:
            out = _run(args, done)
            break
        except Exception as e:
            flaky = any(m in str(e) for m in (
                "UNAVAILABLE", "transport", "response body closed",
                "remote_compile", "DEADLINE"))
            # a genuine HBM exhaustion also surfaces through the
            # remote-compile path (HTTP 500 + allocation report) — it is
            # deterministic, so retrying only wastes three compiles (r4
            # planner-bench OOM burned ~8 min before raising)
            if "RESOURCE_EXHAUSTED" in str(e) or "Largest program" in str(e):
                flaky = False
            if not flaky or attempt == 2:
                raise
            log(f"[bench] tunnel flake ({type(e).__name__}); rebuilding "
                f"and retrying (attempt {attempt + 1})")
            import gc
            gc.collect()
            time.sleep(30)
    print(json.dumps(out), flush=True)


def _run(args, done=None):
    import jax
    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    backend = jax.default_backend()
    preset = args.preset
    if preset == "auto":
        preset = "7b-proxy" if backend == "tpu" else "tiny"
    log(f"[bench] backend={backend} devices={jax.devices()}")

    alphas = sorted({0.7, 0.8, args.alpha})
    modes = args.modes.split(",")

    # `done` persists across flake retries: completed modes are kept, only
    # unfinished ones re-measure (their records only land in `done` AFTER
    # the mode finishes, so a flake mid-mode re-runs that whole mode)
    results = done if done is not None else {}
    if results:
        log(f"[bench] resuming; completed modes kept: "
            f"{sorted(results.keys())}")
    tree_mode = "tree" in modes
    batched_mode = "batched" in modes
    planner_mode = "planner" in modes
    serve_mode = "serve" in modes
    modes = [m for m in modes
             if m not in ("tree", "batched", "planner", "serve")]
    missing_flat = [m for m in modes if m not in results]
    engine = None
    # headline prefill/gen_len, independent of whether the engine build
    # runs on this attempt (resume may skip it)
    if preset == "7b-proxy":
        prefill = args.prefill or 124928
        gen_len = args.gen_len or 128
    else:
        prefill = args.prefill or 64
        gen_len = args.gen_len or 32
    if missing_flat or ((modes or tree_mode) and "ar" not in results):
        # flat/tree runs need the AR baseline at the preset prefill;
        # a batched-only run reports B-vs-1 scaling and skips it
        engine, prefill, gen_len = build_engine(
            preset, args, with_draft="triforce" in missing_flat,
            weight_quant=args.weights == "int8")
        # compile warm-up prefill with ids nobody times
        _state, _ = timed_prefill(engine, seed=7,
                                  with_draft="triforce" in missing_flat,
                                  label=" warmup(compile)")
        del _state
        _settle()
        if "ar" not in results:
            results["ar"] = run_ar(engine, gen_len)
    for mode in missing_flat:
        _settle()
        results[mode] = run_spec(
            engine, gen_len, mode, alphas,
            with_draft=mode == "triforce",
            calibrate_to=args.alpha if args.calibrate else None)

    if tree_mode and "tree" not in results:
        # fresh engine AFTER the flat modes so only one cache set is live
        del engine
        _settle(20)
        results["tree"] = run_tree(preset, args)
        engine = None

    if batched_mode and "batched" not in results:
        del engine
        _settle(20)
        results["batched"] = run_batched(preset, args)
        engine = None

    if planner_mode and "planner" not in results:
        del engine
        _settle(20)
        results["planner"] = run_planner(preset, args)
        engine = None

    if serve_mode and "serve" not in results:
        del engine
        _settle(20)
        results["serve"] = run_serve(preset, args)
        engine = None

    if args.weight_ar:
        # AR floor with int8 weight-only quantization (beyond-reference
        # config: halves the weight stream). Fresh engine; the headline
        # speedup ratio stays at matched bf16 weights for fairness.
        del engine
        _settle(20)
        log("[bench] building int8-weight engine for the AR floor run")
        w8_engine, _, _ = build_engine(preset, args, with_draft=False,
                                       weight_quant=True)
        _s, _ = timed_prefill(w8_engine, seed=5, with_draft=False,
                              label=" w8 warmup(compile)")
        del _s
        results["ar_w8"] = run_ar(w8_engine, gen_len)

    a = str(args.alpha)
    if modes:
        def _head_rec(m):
            r = results[m]
            return r.get("calibrated") or r["forced"][a]
        best_mode = max(modes,
                        key=lambda m: _head_rec(m)["tokens_per_sec"])
        head = _head_rec(best_mode)
    elif "tree" in results:
        # tree-only run: prefer the controlled-acceptance row (raw tree
        # throughput on random weights benchmarks the fixture's chaotic
        # acceptance, not the system)
        tr = results["tree"]
        best_mode = "tree"
        head = tr["forced"].get(a) or tr["raw"] if "forced" in tr \
            else tr["raw"]
    elif "planner" in results and "batched" not in results:
        # planner-only run: emit the planner's decision as its own metric
        pl = results["planner"]
        chosen = pl["plans"][-1]
        out = {"metric": "planner_tree_vs_flat_decision",
               "value": chosen["tree_pred_ms_per_token"], "unit": "ms/tok",
               "vs_baseline": round(chosen["tree_pred_ms_per_token"]
                                    / max(chosen["flat_pred_ms_per_token"],
                                          1e-9), 4),
               "detail": {"preset": preset, "backend": backend,
                          "planner": _round_tree(pl),
                          **({"serve": _round_tree(results["serve"])}
                             if "serve" in results else {})}}
        return out
    elif "serve" in results and "batched" not in results:
        sv = results["serve"]
        return {"metric": "serve_decode_segment_tokens_per_sec",
                "value": sv["decode_segment_tokens_per_sec"],
                "unit": "tok/s",
                "vs_baseline": 0.0,   # the reference cannot serve (bsz=1)
                "detail": {"preset": preset, "backend": backend,
                           "serve": _round_tree(sv)}}
    else:
        # batched-only run: the AR baseline was measured at the PRESET
        # prefill while run_batched uses a shorter context (B caches must
        # fit HBM), so a vs-AR ratio would conflate context with batching;
        # report the B-vs-1 scaling factor under its own metric instead
        bt = results["batched"]
        out = {"metric": "batched_spec_scaling_vs_single_row",
               "value": round(bt["scaling"], 4), "unit": "x",
               "vs_baseline": round(bt["scaling"] / bt["rows"], 4),
               "detail": {"kv_dtype": args.kv_dtype,
                          "weights": args.weights, "alpha": args.alpha,
                          "preset": preset, "backend": backend,
                          "batched": _round_tree(bt),
                          # combo runs: keep every measured mode's record
                          **({"planner": _round_tree(results["planner"])}
                             if "planner" in results else {}),
                          **({"serve": _round_tree(results["serve"])}
                             if "serve" in results else {})}}
        return out
    speedup = head["tokens_per_sec"] / results["ar"]["tokens_per_sec"]
    baseline = 2.2  # reference on-chip E2E speedup (README.md:49-55)
    realized = head.get("measured_accept")
    log(f"[bench] headline: {best_mode} at "
        f"{'realized' if 'coin' in head else 'coin'} alpha={a}"
        f"{'' if realized is None else f' (realized {realized:.3f})'}: "
        f"{head['tokens_per_sec']:.2f} tok/s vs AR "
        f"{results['ar']['tokens_per_sec']:.2f} -> {speedup:.2f}x "
        f"(reference 2.2x)")
    out = {
        "metric": "triforce_speedup_vs_ar_at_controlled_acceptance",
        "value": round(speedup, 4),
        "unit": "x",
        "vs_baseline": round(speedup / baseline, 4),
        "detail": {
            "kv_dtype": args.kv_dtype,
            "weights": args.weights,
            "alpha": args.alpha,
            "middle_chain": args.chain,
            "headline_mode": best_mode,
            "preset": preset,
            "backend": backend,
            "prefill": prefill,
            "gen_len": gen_len,
            "ar": {k: round(v, 4) for k, v in results["ar"].items()},
            **({"ar_w8": _round_tree(results["ar_w8"])}
               if "ar_w8" in results else {}),
            **{m: _round_tree(results[m]) for m in modes},
            **({"tree": _round_tree(results["tree"])}
               if "tree" in results else {}),
            **({"batched": _round_tree(results["batched"])}
               if "batched" in results else {}),
            **({"planner": _round_tree(results["planner"])}
               if "planner" in results else {}),
            **({"serve": _round_tree(results["serve"])}
               if "serve" in results else {}),
        },
    }
    return out


def _round_tree(x):
    if isinstance(x, dict):
        return {k: _round_tree(v) for k, v in x.items()}
    if isinstance(x, float):
        return round(x, 4)
    return x


if __name__ == "__main__":
    main()
