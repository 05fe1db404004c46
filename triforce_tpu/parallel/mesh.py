"""Device mesh construction.

TPU-native replacement for the reference's process-group plumbing
(``/root/reference/models/TP_llama.py:19-25``: torchrun + NCCL, one process
per GPU). Here a single program runs over a ``jax.sharding.Mesh``; multi-host
is ``jax.distributed.initialize`` + the same mesh over all hosts' devices.
Axes:
  dp — data/batch (continuous batching; reference has none, bsz=1)
  tp — tensor parallel over ICI (reference: column/row-split + all_reduce)
  sp — sequence parallel for the 128K KV cache (replaces the reference's
       CPU-offloading tier, SURVEY.md §2.4/§5.7)
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

AXES = ("dp", "tp", "sp")


def make_mesh(tp: int = 1, sp: int = 1, dp: int = 1,
              devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    n = dp * tp * sp
    assert len(devices) >= n, f"need {n} devices, have {len(devices)}"
    arr = np.asarray(devices[:n]).reshape(dp, tp, sp)
    return Mesh(arr, AXES)


def single_device_mesh() -> Mesh:
    return make_mesh(1, 1, 1)


def named(mesh: Mesh, *spec) -> NamedSharding:
    return NamedSharding(mesh, P(*spec))


def init_distributed(coordinator_address: Optional[str] = None,
                     num_processes: Optional[int] = None,
                     process_id: Optional[int] = None) -> None:
    """Multi-host bring-up: one call per host before any jax device use.

    TPU-native replacement for the reference's torchrun + NCCL process-group
    init (models/TP_llama.py:19-25): after this, ``jax.devices()`` spans the
    whole pod slice and every host runs the SAME jitted programs over a
    global mesh — there is no rank-conditional code anywhere (SURVEY.md
    §5.8). On Cloud TPU the arguments are auto-detected from the metadata
    server; pass them explicitly elsewhere.
    """
    kwargs = {}
    if coordinator_address is not None:
        kwargs["coordinator_address"] = coordinator_address
    if num_processes is not None:
        kwargs["num_processes"] = num_processes
    if process_id is not None:
        kwargs["process_id"] = process_id
    jax.distributed.initialize(**kwargs)
