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
    jax.distributed.shutdown()


if __name__ == "__main__":
    main()
