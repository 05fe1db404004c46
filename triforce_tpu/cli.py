"""Unified CLI: the parity surface of the reference's four entry scripts
(``test/on_chip.py``, ``test/offloading.py``, ``test/offloading_TP.py``,
``test/offloading_seqouia.py``) as one command:

    python -m triforce_tpu.cli --mode triforce  ...   # 3-level hierarchy
    python -m triforce_tpu.cli --mode retrieval ...   # self-spec (no drafter)
    python -m triforce_tpu.cli --mode ar        ...   # autoregressive baseline
    python -m triforce_tpu.cli --mode tree      ...   # Sequoia tree spec
    python -m triforce_tpu.cli --mode serve     ...   # continuous batching:
        --num_prompts requests flow through --batch speculative slots
        (admit -> fused batched spec segments -> retire on EOS/length)

Models are either preset names (random weights — for perf work without
checkpoints) or local HF checkpoint dirs / zoo names (models/hf.py). There is
no torchrun / NCCL / on_chip-layer knob: distribution is a mesh
(--tp/--sp), the same program on every host (SURVEY.md §5.8).
"""

from __future__ import annotations

import argparse


def parse_args(argv=None):
    p = argparse.ArgumentParser(
        prog="triforce_tpu",
        description="TPU-native TriForce: hierarchical speculative decoding")
    p.add_argument("--mode", default="triforce",
                   choices=["triforce", "retrieval", "ar", "tree", "serve"])
    p.add_argument("--serve_spec", "--serve-spec", default="retrieval",
                   choices=["retrieval", "triforce"], dest="serve_spec",
                   help="speculation hierarchy the serve slots run "
                        "(triforce adds the drafter level)")
    p.add_argument("--segment", type=int, default=4,
                   help="fused spec steps per scheduler poll (mode=serve): "
                        "admission/retire happen between segments")
    p.add_argument("--model", default="tiny-target",
                   help="config preset, HF checkpoint dir, or zoo name")
    p.add_argument("--draft", default="tiny-draft",
                   help="drafter preset / checkpoint (mode=triforce)")
    # reference shared knobs (on_chip.py:21-40, offloading_TP.py:26-44)
    p.add_argument("--prefill", type=int, default=4096)
    p.add_argument("--gen_len", "--gen-len", type=int, default=256,
                   dest="gen_len")
    p.add_argument("--gamma", type=int, default=6)
    p.add_argument("--middle_chain", "--middle-chain", type=int, default=1,
                   dest="middle_chain",
                   help="drafter tokens per middle verify (triforce mode): "
                        "1 = reference schedule (one draft per verify, "
                        "decoding.py:163-223); 0 = auto (gamma); k>1 "
                        "verifies a k-token drafter chain with ONE "
                        "weight-stream-bound middle forward — lossless "
                        "either way (outer rejection test unchanged)")
    p.add_argument("--middle_trips", "--middle-trips", type=int, default=0,
                   dest="middle_trips",
                   help="fixed middle-loop trip bound (0 = data-dependent "
                        "while_loop). Set with --batch so vmapped rows run "
                        "in lockstep instead of paying the batch's max trip "
                        "count; ceil(gamma/(middle_chain+1))+1 covers one "
                        "mid-chain rejection")
    p.add_argument("--budget", type=int, default=4096)
    p.add_argument("--chunk_size", "--chunk-size", type=int, default=8,
                   dest="chunk_size")
    p.add_argument("--draft_cache_budget", type=int, default=266)
    p.add_argument("--start_size", type=int, default=16)
    p.add_argument("--temp", type=float, default=0.6)
    p.add_argument("--top_p", type=float, default=0.9)
    p.add_argument("--dataset", default="synthetic",
                   choices=["synthetic", "128k", "gs", "one-shot", "demo",
                            "lwm"])
    p.add_argument("--data_dir", "--data-dir", default="data/pg19",
                   dest="data_dir",
                   help="local PG-19-format corpus dir for "
                        "--dataset 128k/gs/one-shot (reference data/pg19)")
    p.add_argument("--num_prompts", "--num-prompts", type=int, default=1,
                   dest="num_prompts",
                   help="evaluate N prompts and report the average "
                        "(the reference entry scripts average over 20, "
                        "test/on_chip.py:117-124); prompts cycle if the "
                        "dataset has fewer")
    p.add_argument("--eos", default="2",
                   help="comma-separated EOS token ids (the reference's "
                        "tree path stops on 0 AND 2, SpecTree_TP.py:181)")
    p.add_argument("--stop_on_eos", "--stop-on-eos", action="store_true",
                   dest="stop_on_eos",
                   help="stop generation at the first emitted EOS "
                        "(reference decoding.py:107-121 breaks on EOS "
                        "unconditionally)")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--verbose", action="store_true")
    p.add_argument("--file", default="", help="CSV log path (misc.log_csv)")
    p.add_argument("--dtype", default=None, help="bfloat16|float32")
    p.add_argument("--kv_dtype", "--kv-dtype", default="bf16",
                   choices=["bf16", "int8"], dest="kv_dtype",
                   help="KV-cache storage precision")
    p.add_argument("--weight_dtype", "--weight-dtype", default="bf16",
                   choices=["bf16", "int8"], dest="weight_dtype",
                   help="target weight precision (int8 = per-channel "
                        "weight-only quantization, halves the weight "
                        "stream; beyond-reference)")
    p.add_argument("--batch", type=int, default=1,
                   help="batched speculation: N prompts decode together in "
                        "one program (retrieval/triforce modes; "
                        "beyond-reference — the reference asserts bsz=1)")
    p.add_argument("--dp", type=int, default=1,
                   help="data-parallel devices for --batch: rows shard "
                        "over a dp mesh axis (batch %% dp == 0)")
    p.add_argument("--tp", type=int, default=1, help="tensor-parallel size")
    p.add_argument("--sp", type=int, default=1,
                   help="sequence-parallel size (shards the KV cache)")
    p.add_argument("--tree_size", type=int, default=64,
                   help="speculation-tree nodes (mode=tree)")
    p.add_argument("--tree_depth", type=int, default=8)
    p.add_argument("--tree_accept", type=float, default=0.8,
                   help="modeled acceptance rate for the tree planner")
    p.add_argument("--ssl", type=int, default=0,
                   help="self-speculation layers: during tree grow, layers "
                        "< ssl attend the FULL cache (reference "
                        "TP_llama_tree.py:405-425 hybrid attention)")
    p.add_argument("--grow_map", default="",
                   help="planned grow-map JSON (tree/planner.py); overrides "
                        "--tree_size/--tree_depth/--tree_accept")
    p.add_argument("--save_ckpt", "--save-ckpt", default="",
                   dest="save_ckpt",
                   help="after loading --model, save it as a native "
                        "sharded checkpoint (models/ckpt.py) at this dir; "
                        "later runs pass the dir as --model and restore "
                        "shards directly into device placement")
    return p.parse_args(argv)


def load_model(spec: str, dtype, drafter: bool = False):
    """Resolve preset name -> random params, else HF checkpoint."""
    import jax
    import jax.numpy as jnp
    from . import config as C
    from .models import ckpt as ckpt_mod
    from .models import hf, llama

    if spec in C.PRESETS:
        cfg = C.PRESETS[spec]
        params = llama.init_params(jax.random.PRNGKey(0), cfg, dtype=dtype)
        return cfg, params, None
    path = hf.resolve_checkpoint(spec)
    if ckpt_mod.is_native_checkpoint(path):
        # converted-once native sharded checkpoint (models/ckpt.py)
        cfg, params = ckpt_mod.load_checkpoint(path)
        # drafter semantics are a LOAD-TIME choice (StreamingLLM un-rotated
        # key storage — no HF/native config field encodes it), exactly as
        # in the hf.load_params path: --draft forces rope_on_slots
        if cfg.rope_on_slots != drafter:
            cfg = cfg.with_(rope_on_slots=drafter)
        # restore honors the requested compute dtype (a float32-saved
        # checkpoint must not hand fp32 params to a bf16 engine)
        jdt = jnp.dtype(dtype.dtype if hasattr(dtype, "dtype") else dtype)
        if any(jnp.issubdtype(x.dtype, jnp.floating) and x.dtype != jdt
               for x in jax.tree.leaves(params)):
            conv = jax.jit(lambda p: jax.tree.map(
                lambda x: x.astype(jdt)
                if jnp.issubdtype(x.dtype, jnp.floating) else x, p),
                donate_argnums=(0,))
            params = conv(params)
        tokenizer = None
        try:
            from transformers import AutoTokenizer
            tokenizer = AutoTokenizer.from_pretrained(path)
        except Exception:
            pass
        return cfg, params, tokenizer
    # drafter checkpoints need StreamingLLM re-rotation semantics
    # (un-rotated key storage) — a framework choice no HF field encodes
    dt = str(dtype.dtype if hasattr(dtype, "dtype") else dtype)
    try:
        # safetensors checkpoints stream tensor-by-tensor (host peak = one
        # layer tensor); torch .bin checkpoints fall back to the full read
        cfg, params = hf.load_params_streaming(path, dtype=dt,
                                               rope_on_slots=drafter)
    except FileNotFoundError as e:
        if "no safetensors shards" not in str(e):
            raise    # a MISSING shard mid-stream is a real error, not
            # "use the .bin path" — eager load would just host-OOM/KeyError
        cfg, params = hf.load_params(path, dtype=dt, rope_on_slots=drafter)
    tokenizer = None
    try:
        from transformers import AutoTokenizer
        tokenizer = AutoTokenizer.from_pretrained(path)
    except Exception:
        pass
    return cfg, params, tokenizer


def main(argv=None):
    args = parse_args(argv)

    import os

    import jax

    # the axon sitecustomize force-registers the TPU backend regardless of
    # JAX_PLATFORMS; when the caller asked for virtual host devices (testing
    # --tp/--sp without hardware), pin the cpu platform explicitly
    if "xla_force_host_platform_device_count" in os.environ.get(
            "XLA_FLAGS", ""):
        try:
            jax.config.update("jax_platforms", "cpu")
        except Exception:
            pass

    import jax.numpy as jnp
    import numpy as np

    from . import data as data_mod
    from . import decoding
    from .config import SpecConfig
    from .engine import Engine
    from .utils.misc import print_config, log_csv

    dtype = jnp.bfloat16 if (args.dtype or (
        "bfloat16" if jax.default_backend() == "tpu" else "float32"
    )) == "bfloat16" else jnp.float32

    # reference: recent_size = draft_cache_budget - start - gamma
    # (test/on_chip.py:77)
    recent = max(args.draft_cache_budget - args.start_size - args.gamma, 16)
    spec = SpecConfig(gamma=args.gamma, budget=args.budget,
                      chunk_size=args.chunk_size,
                      draft_start_size=args.start_size,
                      draft_recent_size=recent,
                      temperature=args.temp, top_p=args.top_p,
                      max_len=args.gen_len,
                      middle_chain=args.middle_chain,
                      middle_trips=args.middle_trips)

    if args.mode in ("triforce", "retrieval", "serve") and \
            args.gen_len > args.budget:
        print(f"[warn] gen_len {args.gen_len} exceeds budget "
              f"{args.budget}: the retrieval tail is a rolling window of "
              f"the most recent `budget` generated tokens, so older "
              f"generated tokens (and eventually the selected chunks) "
              f"rotate out of the middle model's view (losslessness "
              f"unaffected — the full-cache verify sees everything)")

    t_cfg, t_params, tokenizer = load_model(args.model, dtype)
    if args.save_ckpt:
        from .models import ckpt as ckpt_mod
        ckpt_mod.save_checkpoint(args.save_ckpt, t_cfg, t_params)
        print(f"[ckpt] saved native checkpoint to {args.save_ckpt}")

    # --tp/--sp: build the device mesh and shard params + decode state.
    # Replaces the reference's torchrun/NCCL launch (test/offloading_TP.py);
    # the same program runs on every host, sampling is replicated
    # (SURVEY.md §5.8) so there are zero broadcasts.
    mesh = None
    if args.tp * args.sp > 1:
        from .parallel import mesh as mesh_mod
        if t_cfg.num_kv_heads % args.tp != 0:
            raise SystemExit(
                f"--tp {args.tp} does not divide num_kv_heads "
                f"{t_cfg.num_kv_heads}; put the surplus on --sp instead")
        # --batch with model parallelism: ONE (dp, tp, sp) mesh — rows ride
        # dp via BatchedSpecEngine's vmap(spmd_axis_name), heads/sequence
        # shard inside the step (the production mesh shape)
        dp = args.dp if args.batch > 1 else 1
        mesh = mesh_mod.make_mesh(tp=args.tp, sp=args.sp, dp=dp)

    print_config(mode=args.mode, model=args.model, prefill=args.prefill,
                 gen_len=args.gen_len, gamma=args.gamma, budget=args.budget,
                 chunk_size=args.chunk_size, temp=args.temp,
                 top_p=args.top_p, dataset=args.dataset, seed=args.seed,
                 backend=jax.default_backend(), tp=args.tp, sp=args.sp)

    prompts = data_mod.get_dataset(args.dataset, tokenizer,
                                   datalen=args.prefill,
                                   vocab_size=t_cfg.vocab_size,
                                   seed=args.seed, data_dir=args.data_dir)
    if args.dataset == "synthetic" and args.num_prompts > 1:
        prompts = data_mod.synthetic_prompts(
            args.num_prompts, args.prefill, t_cfg.vocab_size, args.seed)
    eos_ids = tuple(int(e) for e in args.eos.split(","))
    prompt_ids = [jnp.asarray(data_mod.fit_prompt(
        prompts[i % len(prompts)], args.prefill))
        for i in range(args.num_prompts)]
    ids = prompt_ids[0]

    if args.mode == "tree":
        from .tree import planner
        from .tree.spectree import TreeEngine, tree_decode
        if args.grow_map:
            gm = planner.GrowMap.load(args.grow_map)
        else:
            pvec = planner.modeled_acceptance_vector(args.tree_accept, 4)
            T, choice = planner.plan_tree(pvec, args.tree_size,
                                          args.tree_depth)
            gm = planner.build_grow_map(T, choice, args.tree_size,
                                        args.tree_depth)
        engine = TreeEngine(
            t_cfg, gm, t_params, prefill=args.prefill,
            max_cache_len=args.prefill + args.gen_len + 2 * gm.size,
            budget=args.budget, chunk_size=args.chunk_size,
            temperature=args.temp, top_p=args.top_p, dtype=dtype,
            kv_quant=args.kv_dtype == "int8",
            weight_quant=args.weight_dtype == "int8", ssl=args.ssl,
            eos_ids=eos_ids, mesh=mesh, shard_seq=args.sp > 1)
        runs = [tree_decode(engine, pids, max_len=args.gen_len,
                            seed=args.seed + i)
                for i, pids in enumerate(prompt_ids)]
        res = runs[0]
    else:
        d_cfg = d_params = None
        with_draft = args.mode == "triforce" or (
            args.mode == "serve" and args.serve_spec == "triforce")
        if with_draft:
            d_cfg, d_params, _ = load_model(args.draft, dtype, drafter=True)
        if args.mode == "serve":
            # serve slots keep decoding junk while idle — the bound lives
            # with the scheduler whose no-gating design implies it
            from .batched_spec import SpecScheduler
            headroom = SpecScheduler.required_headroom(
                args.gen_len, args.segment, spec.gamma)
        else:
            headroom = 2 * (args.gen_len + spec.gamma + 2)
        engine = Engine(
            t_cfg, spec, t_params, draft_cfg=d_cfg, draft_params=d_params,
            prefill=args.prefill,
            max_cache_len=args.prefill + headroom,
            dtype=dtype, kv_quant=args.kv_dtype == "int8",
            weight_quant=args.weight_dtype == "int8",
            eos_token_id=eos_ids, mesh=mesh, shard_seq=args.sp > 1)
        if args.mode == "serve":
            return _run_serve(engine, args, prompt_ids)
        if args.batch > 1 and args.mode in ("retrieval", "triforce"):
            runs = [_run_batched(engine, args, prompts)]
            res = runs[0]
        else:
            fn = {"triforce": decoding.triforce,
                  "retrieval": decoding.retrieval_spec,
                  "ar": decoding.autoregressive}[args.mode]
            kw = {} if args.mode == "ar" else \
                {"stop_on_eos": args.stop_on_eos}
            runs = [fn(engine, pids, max_len=args.gen_len,
                       seed=args.seed + i, verbose=args.verbose,
                       tokenizer=tokenizer, **kw)
                    for i, pids in enumerate(prompt_ids)]
            res = runs[0]

    for i, r in enumerate(runs):
        print(f"\n[{args.mode}] prompt {i}: {r.tokens_per_sec:.2f} tokens/s "
              f"({1e3 / max(r.tokens_per_sec, 1e-9):.1f} ms/token), "
              f"acceptance {r.acceptance_rate:.3f}, "
              f"{r.avg_tokens_per_step:.2f} tokens/step, "
              f"{r.steps} steps, wall {r.wall_s:.1f}s")
    if len(runs) > 1:
        # aggregate like the reference's 20-prompt averages
        # (test/on_chip.py:117-124): latency averaged per token, acceptance
        # pooled over proposals
        import math
        tps = [r.tokens_per_sec for r in runs]
        accs = [r.acceptance_rate for r in runs
                if not math.isnan(r.acceptance_rate)]
        res = dataclasses_replace_mean(res, runs)
        print(f"\n[{args.mode}] AVERAGE over {len(runs)} prompts: "
              f"{res.tokens_per_sec:.2f} tokens/s "
              f"(per-prompt sigma {float(np.std(tps)):.2f}), acceptance "
              f"{res.acceptance_rate:.3f}"
              + (f" (sigma {float(np.std(accs)):.3f})" if accs else ""))

    if args.file:
        header = ("mode,model,prefill,gen_len,gamma,budget,chunk_size,temp,"
                  "top_p,dataset,seed,tokens_per_sec,acceptance_rate,"
                  "avg_tokens_per_step\n")
        entry = (f"{args.mode},{args.model},{args.prefill},{args.gen_len},"
                 f"{args.gamma},{args.budget},{args.chunk_size},{args.temp},"
                 f"{args.top_p},{args.dataset},{args.seed},"
                 f"{res.tokens_per_sec:.3f},{res.acceptance_rate:.4f},"
                 f"{res.avg_tokens_per_step:.3f}\n")
        log_csv(args.file, header, entry)
    return res


def dataclasses_replace_mean(res, runs):
    """Aggregate per-prompt DecodeResults into one average row.
    Throughput is TOKEN-WEIGHTED (sum tokens / sum wall): with unequal
    per-prompt walls an arithmetic mean of rates over-weights short
    prompts (ADVICE r4); acceptance pools proposals implicitly by
    averaging only over prompts that measured one."""
    import dataclasses
    import math
    n = len(runs)
    accs = [r.acceptance_rate for r in runs
            if not math.isnan(r.acceptance_rate)]
    tot_tokens = sum(r.tokens_per_sec * r.wall_s for r in runs)
    tot_wall = sum(r.wall_s for r in runs)
    return dataclasses.replace(
        res,
        tokens_per_sec=tot_tokens / max(tot_wall, 1e-9),
        acceptance_rate=sum(accs) / len(accs) if accs else float("nan"),
        avg_tokens_per_step=sum(r.avg_tokens_per_step for r in runs) / n,
        steps=sum(r.steps for r in runs),
        wall_s=tot_wall)


def _run_batched(engine, args, prompts):
    """--batch N: N rows speculate together (batched_spec). Aggregate
    tokens/s over all rows; acceptance/steps averaged."""
    import time
    import numpy as np
    import jax.numpy as jnp
    from . import data as data_mod
    from .batched_spec import BatchedSpecEngine
    from .decoding import DecodeResult

    b = args.batch
    dp_mesh = None
    if engine.mesh is None and args.dp > 1:
        # dp-only serving (no tp/sp): rows shard over a dedicated dp mesh
        from .parallel import mesh as mesh_mod
        dp_mesh = mesh_mod.make_mesh(dp=args.dp)
    # engine.mesh set: the (dp, tp, sp) composition — BatchedSpecEngine
    # picks the mesh up from the engine itself
    bat = BatchedSpecEngine(engine, mode=args.mode, mesh=dp_mesh)
    rows = [jnp.asarray(data_mod.fit_prompt(prompts[i % len(prompts)],
                                            args.prefill))
            for i in range(b)]
    state = bat.prefill_rows(rows, [args.seed + i for i in range(b)])
    # prefill completes BEFORE t0 (readback of one scalar forces it)
    _ = int(np.asarray(state.next_token).reshape(-1)[0])
    # fixed step count sized for ~gen_len tokens/row at >=1 token/step
    steps = args.gen_len
    t0 = time.perf_counter()
    state, toks, ns, counters, _eos = bat.decode(state, steps)
    ns = np.asarray(ns)
    wall = time.perf_counter() - t0
    total = int(ns.sum())
    counters = np.asarray(counters)
    # row 0's actual emitted stream: per step, the first n_emitted slots of
    # the (junk-padded) gamma+2 token buffer
    toks0 = np.asarray(toks)[0]
    row0 = [int(t) for s in range(steps) for t in toks0[s, :ns[0, s]]]
    return DecodeResult(
        tokens=row0,
        tokens_per_sec=total / wall,
        acceptance_rate=float(counters[:, 0].sum()) /
        max(int(counters[:, 1].sum()), 1),
        avg_tokens_per_step=total / (b * steps),
        steps=steps, wall_s=wall)


def _run_serve(engine, args, prompt_ids):
    """--mode serve: continuous speculative batching. ``--num_prompts``
    requests flow through ``--batch`` slots (SpecScheduler: admit ->
    ``--segment`` fused batched spec steps -> retire on EOS/length).
    Per-row trajectories equal their single-sequence runs (same rid seed)."""
    import time

    import numpy as np

    from .batched_spec import SpecScheduler
    from .batching import Request

    dp_mesh = None
    if engine.mesh is None and args.dp > 1:
        # data-parallel serving: slot rows shard over a dp mesh
        from .parallel import mesh as mesh_mod
        dp_mesh = mesh_mod.make_mesh(dp=args.dp)
    sched = SpecScheduler(engine, mode=args.serve_spec, slots=args.batch,
                          segment=args.segment, seed=args.seed,
                          mesh=dp_mesh)
    t0 = time.perf_counter()
    for i, pids in enumerate(prompt_ids):
        sched.submit(Request(rid=args.seed + i,
                             prompt=np.asarray(pids).reshape(-1),
                             max_new_tokens=args.gen_len))
    done = sched.run()
    wall = time.perf_counter() - t0
    total = sum(len(r.out) for r in done)
    for r in sorted(done, key=lambda r: r.rid):
        print(f"[serve] request {r.rid}: {len(r.out)} tokens"
              + (" (eos)" if len(r.out) < args.gen_len else ""))
    print(f"\n[serve] {len(done)}/{len(prompt_ids)} requests done, "
          f"{total} tokens in {wall:.1f}s = {total / wall:.2f} tokens/s "
          f"aggregate ({args.batch} slots, {args.serve_spec} spec, "
          f"segment {args.segment})")
    if args.file:
        # serve rows log like every other mode (--file was silently a
        # no-op for serve — ADVICE r4); per-request acceptance is not
        # defined for the aggregate, so those columns record nan
        header = ("mode,model,prefill,gen_len,gamma,budget,chunk_size,"
                  "temp,top_p,dataset,seed,tokens_per_sec,acceptance_rate,"
                  "avg_tokens_per_step\n")
        entry = (f"serve,{args.model},{args.prefill},{args.gen_len},"
                 f"{args.gamma},{args.budget},{args.chunk_size},"
                 f"{args.temp},{args.top_p},{args.dataset},{args.seed},"
                 f"{total / wall:.3f},nan,nan\n")
        log_csv(args.file, header, entry)
    return done


if __name__ == "__main__":
    main()
