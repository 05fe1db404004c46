"""TPU A/B: meshless engine vs single-device (dp=1,tp=1,sp=1) mesh engine.

Validates on HARDWARE what the CPU dryrun cannot (ADVICE r2 #1): inside
shard_map the flash-decode kernel actually executes on the TPU (the
_pallas_ok gate requires backend==tpu), and the stacked zero-copy layer
addressing survives the mesh — so the sharded step should match the
meshless step time (VERDICT r2 item 4's acceptance test) and emit the SAME
tokens under the same keys.

Run: python probes/_r3_mesh_ab.py   (ONE TPU job at a time!)
"""
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from triforce_tpu import config as C
from triforce_tpu.config import SpecConfig
from triforce_tpu.engine import Engine
from triforce_tpu.models import llama
from triforce_tpu.parallel import mesh as mesh_mod

PREFILL, GEN = 63488, 128


def build(params, mesh):
    spec = SpecConfig(gamma=6, budget=4096, chunk_size=8,
                      draft_start_size=16, draft_recent_size=244,
                      middle_chain=6)
    return Engine(C.BENCH_7B_PROXY, spec, params, prefill=PREFILL,
                  max_cache_len=PREFILL + 16 * (GEN + 8),
                  dtype=jnp.bfloat16, kv_quant=True, weight_quant=True,
                  mesh=mesh, shard_seq=mesh is not None, donate=True)


def run(eng, label):
    ids = jax.random.randint(jax.random.PRNGKey(7), (1, PREFILL), 0,
                             C.BENCH_7B_PROXY.vocab_size)
    st = eng.init_state(jax.random.PRNGKey(3))
    st = eng.prefill_target(st, ids)
    # one-step logits probe for numeric parity (bf16: the shard_map path
    # merges the new-token block outside the kernel, a different fp
    # summation order than the fused meshless kernel — bitwise equality is
    # not expected, closeness is)
    logits, _, _ = llama.forward_append(
        eng.target_cfg, eng.t_params, st.next_token[None].astype(jnp.int32),
        st.kv, mesh=eng.mesh, shard_seq=eng.shard_seq)
    probe = np.asarray(logits[0, -1], np.float32)
    kv, tok, key = st.kv, st.next_token, st.key
    kv, tok, key, buf = eng.generate_ar(kv, tok, key, GEN)  # compile
    _ = int(buf[-1])
    t0 = time.perf_counter()
    kv, tok, key, buf = eng.generate_ar(kv, tok, key, GEN)
    toks = np.asarray(buf)
    dt = time.perf_counter() - t0
    print(f"[ab] {label}: AR {1e3 * dt / GEN:.2f} ms/token", flush=True)
    del kv, st
    return toks, dt, probe


def main():
    print(f"[ab] backend={jax.default_backend()}", flush=True)
    params = llama.init_params(jax.random.PRNGKey(0), C.BENCH_7B_PROXY,
                               dtype=jnp.bfloat16)
    jax.block_until_ready(params)

    eng = build(params, None)
    toks_a, dt_a, probe_a = run(eng, "meshless")
    del eng
    time.sleep(10)

    mesh = mesh_mod.make_mesh(tp=1, sp=1, dp=1)
    eng = build(params, mesh)
    toks_b, dt_b, probe_b = run(eng, "mesh(1,1,1) shard_map")
    del eng

    div = int(np.argmax(toks_a != toks_b)) if (toks_a != toks_b).any() \
        else GEN
    rel = float(np.max(np.abs(probe_a - probe_b)) /
                max(float(np.max(np.abs(probe_a))), 1e-6))
    ratio = dt_b / dt_a
    print(f"[ab] first token divergence at {div}/{GEN}; one-step logits "
          f"max rel diff {rel:.2e}; mesh/meshless step ratio {ratio:.3f}",
          flush=True)
    # acceptance: sharded step at meshless speed (VERDICT r2 item 4) and
    # numerically the same forward (bf16-level agreement; exact token
    # trajectories diverge once a near-tied sample flips)
    assert ratio < 1.10, f"sharded step {ratio:.2f}x the meshless step"
    assert rel < 0.05, f"one-step logits disagree: rel {rel:.3e}"


if __name__ == "__main__":
    main()
