"""Shared bench helpers: logging, the engine builder, timed prefill /
generation primitives, and the analytic HBM byte model that makes the
"AR floor is near speed-of-light" claim auditable in the bench JSON."""

from __future__ import annotations

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
                  drafts: float, mid_live: float = None) -> float:
        """Bytes of ONE spec step: 1 full-cache target verify +
        ``mid_verifies`` middle verifies (each streams the weight set;
        only the ``mid_live`` LIVE ones also stream the retrieval budget —
        dead fixed-trip rounds gate their rkv read to zero columns,
        engine._middle_spec) + ``drafts`` drafter forwards (incl. the
        replay)."""
        if mid_live is None:
            mid_live = mid_verifies
        return (self.w_bytes + self.kv_tok * avg_ctx
                + mid_verifies * self.w_bytes
                + mid_live * self.kv_tok * self.budget
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
                 weight_quant: bool = False, cache_headroom: int = None,
                 cache_pad: int = None):
    import jax
    import jax.numpy as jnp
    from triforce_tpu import config as C
    from triforce_tpu.config import SpecConfig
    from triforce_tpu.engine import Engine
    from triforce_tpu.models import llama

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
    elif preset in ("7b-proxy", "13b-proxy"):
        cfg = C.BENCH_7B_PROXY if preset == "7b-proxy" else C.BENCH_13B_PROXY
        dcfg = C.LLAMA_68M
        # reference on-chip config: gamma 6, budget 4096, chunk 8,
        # draft_cache_budget 266 -> recent = 266 - 16 - 6 (on_chip.py:77)
        spec = SpecConfig(gamma=args.gamma, budget=4096, chunk_size=8,
                          draft_start_size=16,
                          draft_recent_size=250 - args.gamma,
                          temperature=0.6, top_p=0.9,
                          middle_chain=args.chain, middle_trips=trips,
                          mid_act_quant=getattr(args, "mid_aq", False))
        # reference headline prefill (README.md:51). The 7b proxy's 128K
        # int8 cache is ~8.6 GB incl. scale planes; the 13b proxy's is
        # ~11.4 GB — both fit the 16 GB chip with the donated
        # single-cache-set discipline (HBM accounting in NOTES_ROUND3.md).
        prefill = args.prefill or 124928
        gen_len = args.gen_len or (128 if preset == "7b-proxy" else 64)
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
                    weight_quant=weight_quant, donate=True,
                    cache_pad=cache_pad)
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


def timed_generation(fn, state, gen_len, warm=True):
    """Optional warmup (compile) -> timed run from the warmup's output
    state. The engine donates cache buffers, so each call CONSUMES its
    input state and at most one cache set is live (the 7b-proxy cache is
    ~4.4 GB; keeping saved states OOMs the 16 GB chip). Returns the timed
    run's output state so the caller can chain further measurements."""
    if warm:
        state, *_ = read_out(fn(state))
    t0 = time.perf_counter()
    state, buf, n, counters, _ = read_out(fn(state))
    dt = time.perf_counter() - t0
    return state, n, counters, dt


def settle(seconds: float = 10.0) -> None:
    """Give the device allocator time to process async frees between
    phases. Through the axon tunnel, buffer releases from a finished phase
    land asynchronously; launching the next phase's compile+dispatch
    immediately can transiently hold an extra cache set and OOM the chip."""
    import jax
    if jax.default_backend() == "tpu":
        time.sleep(seconds)


def read_out(out):
    """Force completion via host readback of the token count."""
    state, buf, n, counters, stop = out
    n = int(n)
    return state, buf, n, np.asarray(counters), stop


def round_tree(x):
    if isinstance(x, dict):
        return {k: round_tree(v) for k, v in x.items()}
    if isinstance(x, float):
        return round(x, 4)
    return x
