"""Native sharded checkpoint save/restore (orbax/tensorstore).

The reference reloads the WHOLE HF torch checkpoint on every rank at every
start (models/TP_llama.py:89-114 — staggered sleeps so ranks don't thrash
the page cache). Here conversion happens once: ingest the HF checkpoint
(``hf.load_params`` / ``load_params_streaming``), ``save_checkpoint`` the
stacked pytree, and every later start restores tensors DIRECTLY into
their target ``NamedSharding`` placement — each host reads only the
shards it owns (orbax/tensorstore ocdbt layout), which is the SURVEY §5.4
"orbax-style sharded param loading" subsystem.

Layout on disk::

    <dir>/triforce_config.json   ModelConfig (incl. RopeConfig) as JSON
    <dir>/params/                orbax StandardCheckpointer pytree
"""

from __future__ import annotations

import dataclasses
import json
import os
from typing import Optional, Tuple

import jax

from ..config import ModelConfig, RopeConfig

_CFG_FILE = "triforce_config.json"


def is_native_checkpoint(path: str) -> bool:
    return os.path.isfile(os.path.join(path, _CFG_FILE))


def _cfg_to_dict(cfg: ModelConfig) -> dict:
    d = dataclasses.asdict(cfg)
    return d


def _cfg_from_dict(d: dict) -> ModelConfig:
    rope = RopeConfig(**d.pop("rope"))
    return ModelConfig(rope=rope, **d)


def save_checkpoint(path: str, cfg: ModelConfig, params) -> None:
    """Write ``params`` (any jax pytree, possibly sharded across the mesh)
    plus its ModelConfig. Existing checkpoints are overwritten ATOMICALLY:
    params save to a temp dir that is renamed into place, and the config
    marker (which ``is_native_checkpoint`` keys on) is written LAST — a
    crash mid-save can never leave a dir the loader accepts but cannot
    restore, and never destroys a good checkpoint before the new one is
    complete (ADVICE r4)."""
    import shutil

    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    os.makedirs(path, exist_ok=True)
    ckptr = ocp.StandardCheckpointer()
    pdir = os.path.join(path, "params")
    tmp = pdir + ".tmp"
    if os.path.exists(tmp):
        shutil.rmtree(tmp)
    ckptr.save(tmp, params)
    ckptr.wait_until_finished()
    if os.path.exists(pdir):
        shutil.rmtree(pdir)
    os.rename(tmp, pdir)
    with open(os.path.join(path, _CFG_FILE), "w") as f:
        json.dump(_cfg_to_dict(cfg), f, indent=1)


def load_checkpoint(path: str, shardings=None,
                    ) -> Tuple[ModelConfig, dict]:
    """Restore (ModelConfig, params). With ``shardings`` (a NamedSharding
    pytree from ``parallel.sharding.param_shardings``) every tensor is
    restored straight into its sharded device placement — no host-side
    full copy, so >host-RAM models restore as long as the shards fit HBM.
    Without it, arrays restore onto the default device."""
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    with open(os.path.join(path, _CFG_FILE)) as f:
        cfg = _cfg_from_dict(json.load(f))
    ckptr = ocp.StandardCheckpointer()
    pdir = os.path.join(path, "params")
    meta = ckptr.metadata(pdir).item_metadata.tree

    def absify(m, sh=None):
        return jax.ShapeDtypeStruct(m.shape, m.dtype, sharding=sh)

    if shardings is None:
        abstract = jax.tree.map(absify, meta)
    else:
        abstract = jax.tree.map(absify, meta, shardings)
    params = ckptr.restore(pdir, abstract)
    return cfg, params


def convert_hf(model_dir: str, out_dir: str, dtype="bfloat16",
               rope_on_slots: bool = False, shardings=None,
               streaming: bool = True) -> Tuple[ModelConfig, dict]:
    """One-shot HF -> native conversion: stream-ingest the HF checkpoint
    and save it in the native sharded layout. Returns the loaded params
    (already device-resident) so conversion doubles as a load."""
    from . import hf

    if streaming:
        try:
            cfg, params = hf.load_params_streaming(
                model_dir, dtype=dtype, rope_on_slots=rope_on_slots,
                shardings=shardings)
        except FileNotFoundError as e:
            if "no safetensors shards" not in str(e):
                raise
            cfg, params = hf.load_params(model_dir, dtype=dtype,
                                         rope_on_slots=rope_on_slots)
    else:
        cfg, params = hf.load_params(model_dir, dtype=dtype,
                                     rope_on_slots=rope_on_slots)
    save_checkpoint(out_dir, cfg, params)
    return cfg, params
