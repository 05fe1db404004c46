"""Compile-only HBM analysis of the tree generation program at the
reference's full scale (tree 512 / budget 12288 / prefill 130048) — no
device buffers, no execution: lower with ShapeDtypeStructs and ask the
remote TPU compiler for the memory breakdown.

r3 finding this probes: at 130048 the tree step OOM'd with ~9.5 GB of
HLO-temp COPIES of the donated caches (layout-conversion: XLA assigned the
loop-internal cache layout {4,2,0,3,1} while inputs arrive default), on the
PRE-decomposition grow attention. This measures whether removing the
masked monolithic pass (commit dce9f7e) changes the layout choice.

Run: python probes/_r3_tree_mem.py [prefill]   (ONE TPU job at a time!)
"""
import sys

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

from triforce_tpu import config as C
from triforce_tpu.models import llama
from triforce_tpu.tree import planner
from triforce_tpu.tree.spectree import TreeEngine


def main():
    prefill = int(sys.argv[1]) if len(sys.argv) > 1 else 130048
    gen_len = 128
    cfg = C.BENCH_7B_PROXY
    pvec = planner.modeled_acceptance_vector(0.8, 4)
    T, choice = planner.plan_tree(pvec, 512, 24)
    gm = planner.build_grow_map(T, choice, 512, 24)

    # shape-only params (quantized, like the bench)
    params = jax.eval_shape(
        lambda k: llama.quantize_weights(
            llama.init_params(k, cfg, dtype=jnp.bfloat16)),
        jax.random.PRNGKey(0))
    engine = TreeEngine(
        cfg, gm, params, prefill=prefill,
        max_cache_len=prefill + 4 * (gen_len + 2 * gm.size),
        budget=12288, chunk_size=8, dtype=jnp.bfloat16, kv_quant=True,
        weight_quant=False,  # params already shaped as quantized
        ssl=4)
    state = jax.eval_shape(engine.init_state, jax.random.PRNGKey(1))
    print(f"[mem] lowering tree _gen at prefill={prefill} "
          f"(cache {engine.max_cache_len} slots)", flush=True)
    lowered = engine._gen.lower(gen_len, params, state)
    print("[mem] compiling (remote)...", flush=True)
    compiled = lowered.compile()
    ma = compiled.memory_analysis()
    print(f"[mem] {ma}", flush=True)


if __name__ == "__main__":
    main()
