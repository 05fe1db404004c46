"""HF checkpoint ingestion: config translation + weight conversion into the
stacked params pytree used by ``models/llama.py``.

Replaces the reference's runtime dependence on ``transformers``
``from_pretrained`` (test/on_chip.py:48-53, TP_llama.py:89-114: load the
whole torch model, then re-shard by hand). Here weights are read straight
from safetensors / torch checkpoints into numpy, transposed once into the
matmul-friendly [in, out] layout, stacked [L, ...] for the layer ``scan``,
and can then be device_put with NamedShardings (parallel/sharding.py) — the
GSPMD equivalent of the reference's staggered per-rank load.
"""

from __future__ import annotations

import json
import os
from typing import Optional, Tuple

import numpy as np

from ..config import ModelConfig, RopeConfig


def config_from_hf(cfg: dict, rope_on_slots: bool = False) -> ModelConfig:
    """Translate an HF Llama ``config.json`` dict (including the yarn
    ``rope_scaling`` schema of the reference's config_yarn.py:184-193).

    ``rope_on_slots``: set for DRAFTER checkpoints — it selects the
    StreamingLLM whole-window re-rotation semantics (un-rotated key
    storage, modeling_llama_68m.py:151-178), which is a framework-side
    choice no HF config field encodes."""
    rs = cfg.get("rope_scaling") or {}
    # modern transformers serialize the kind under 'rope_type'; older
    # configs (and the reference's config_yarn.py) use 'type'
    kind = rs.get("rope_type", rs.get("type", "llama"))
    if kind in ("yarn", "dynamic-yarn", "ntk-by-parts", "linear", "dynamic"):
        # every scaling type the reference's config validates
        # (config_yarn.py:184-193) maps to its own rope.py kind; the
        # dynamic kinds resolve their factor at table-build time
        # (rope._effective_scale)
        rope = RopeConfig(
            kind=kind,
            theta=float(cfg.get("rope_theta", 10000.0)),
            scaling_factor=float(rs.get("factor", 1.0)),
            original_max_position_embeddings=int(
                rs.get("original_max_position_embeddings", 4096)),
            beta_fast=float(rs.get("beta_fast", 32.0)),
            beta_slow=float(rs.get("beta_slow", 1.0)),
            extrapolation_factor=float(rs.get("extrapolation_factor", 1.0)),
            attn_factor=float(rs.get("attn_factor", 1.0)),
        )
    else:
        rope = RopeConfig(kind="llama",
                          theta=float(cfg.get("rope_theta", 10000.0)))
    num_heads = int(cfg["num_attention_heads"])
    return ModelConfig(
        vocab_size=int(cfg["vocab_size"]),
        hidden_size=int(cfg["hidden_size"]),
        intermediate_size=int(cfg["intermediate_size"]),
        num_layers=int(cfg["num_hidden_layers"]),
        num_heads=num_heads,
        num_kv_heads=int(cfg.get("num_key_value_heads", num_heads)),
        head_dim=int(cfg["hidden_size"]) // num_heads,
        max_position_embeddings=int(cfg.get("max_position_embeddings", 4096)),
        rms_norm_eps=float(cfg.get("rms_norm_eps", 1e-5)),
        rope=rope,
        rope_on_slots=rope_on_slots,
        tie_word_embeddings=bool(cfg.get("tie_word_embeddings", False)),
    )


def _read_state_dict(model_dir: str) -> dict:
    """Read all tensors (as numpy) from a local HF checkpoint directory —
    safetensors shards preferred, torch ``.bin`` fallback."""
    st_files = sorted(f for f in os.listdir(model_dir)
                      if f.endswith(".safetensors"))
    if st_files:
        from safetensors import safe_open
        out = {}
        for f in st_files:
            with safe_open(os.path.join(model_dir, f), framework="np") as sf:
                for k in sf.keys():
                    out[k] = sf.get_tensor(k)
        return out
    bin_files = sorted(f for f in os.listdir(model_dir)
                       if f.endswith(".bin") and "pytorch_model" in f)
    if not bin_files:
        raise FileNotFoundError(
            f"no safetensors/bin checkpoint shards in {model_dir}")
    import torch
    out = {}
    for f in bin_files:
        sd = torch.load(os.path.join(model_dir, f), map_location="cpu",
                        weights_only=True)
        for k, v in sd.items():
            out[k] = v.float().numpy()
    return out


def load_params(model_dir: str, dtype="bfloat16",
                cfg: Optional[ModelConfig] = None,
                rope_on_slots: bool = False,
                ) -> Tuple[ModelConfig, dict]:
    """Load a local HF Llama checkpoint into (ModelConfig, params pytree).

    Layout contract (must match llama.init_params): projection matrices are
    [in, out] (HF nn.Linear stores [out, in] -> transposed here), per-layer
    weights stacked on a leading [L] axis for the layer scan.
    """
    import jax.numpy as jnp

    with open(os.path.join(model_dir, "config.json")) as f:
        hf_cfg = json.load(f)
    if cfg is None:
        cfg = config_from_hf(hf_cfg, rope_on_slots=rope_on_slots)
    sd = _read_state_dict(model_dir)
    jdt = jnp.dtype(dtype)

    def get(name: str) -> np.ndarray:
        if name in sd:
            return np.asarray(sd[name])
        # some exports drop the "model." prefix
        alt = name.removeprefix("model.")
        return np.asarray(sd[alt])

    def stack_t(fmt: str) -> np.ndarray:
        """Stack layer weights, transposing [out,in] -> [in,out]."""
        return np.stack([get(fmt.format(i)).T
                         for i in range(cfg.num_layers)])

    def stack(fmt: str) -> np.ndarray:
        return np.stack([get(fmt.format(i))
                         for i in range(cfg.num_layers)])

    L = "model.layers.{}."
    params = {
        "embed": jnp.asarray(get("model.embed_tokens.weight"), jdt),
        "layers": {
            "wq": jnp.asarray(stack_t(L + "self_attn.q_proj.weight"), jdt),
            "wk": jnp.asarray(stack_t(L + "self_attn.k_proj.weight"), jdt),
            "wv": jnp.asarray(stack_t(L + "self_attn.v_proj.weight"), jdt),
            "wo": jnp.asarray(stack_t(L + "self_attn.o_proj.weight"), jdt),
            "w_gate": jnp.asarray(stack_t(L + "mlp.gate_proj.weight"), jdt),
            "w_up": jnp.asarray(stack_t(L + "mlp.up_proj.weight"), jdt),
            "w_down": jnp.asarray(stack_t(L + "mlp.down_proj.weight"), jdt),
            "ln_attn": jnp.asarray(stack(L + "input_layernorm.weight"), jdt),
            "ln_mlp": jnp.asarray(
                stack(L + "post_attention_layernorm.weight"), jdt),
        },
        "final_norm": jnp.asarray(get("model.norm.weight"), jdt),
    }
    if cfg.tie_word_embeddings or "lm_head.weight" not in sd:
        params["lm_head"] = params["embed"].T
    else:
        params["lm_head"] = jnp.asarray(get("lm_head.weight").T, jdt)
    return cfg, params


def _tensor_file_map(model_dir: str) -> dict:
    """Map tensor name -> absolute safetensors shard path.

    Prefers the HF ``model.safetensors.index.json`` weight map; falls back
    to scanning each shard's header (``safe_open`` reads only the header,
    not the payload)."""
    idx = os.path.join(model_dir, "model.safetensors.index.json")
    if os.path.isfile(idx):
        with open(idx) as f:
            wm = json.load(f)["weight_map"]
        return {k: os.path.join(model_dir, v) for k, v in wm.items()}
    from safetensors import safe_open
    out = {}
    for f in sorted(os.listdir(model_dir)):
        if not f.endswith(".safetensors"):
            continue
        p = os.path.join(model_dir, f)
        with safe_open(p, framework="np") as sf:
            for k in sf.keys():
                out[k] = p
    if not out:
        raise FileNotFoundError(
            f"no safetensors shards in {model_dir} (streaming load needs "
            f"safetensors; for torch .bin checkpoints use load_params)")
    return out


def load_params_streaming(model_dir: str, dtype="bfloat16",
                          cfg: Optional[ModelConfig] = None,
                          rope_on_slots: bool = False,
                          shardings=None,
                          ) -> Tuple[ModelConfig, dict]:
    """Stream a (sharded) HF safetensors checkpoint into the stacked params
    pytree WITHOUT materializing the whole state dict on host.

    ``load_params`` reads every tensor into host numpy first — fine for 7B,
    impossible for models larger than host RAM. Here each stacked leaf is
    allocated ONCE on device (under ``shardings`` when given — the
    NamedSharding pytree from ``parallel.sharding.param_shardings``) and
    filled layer-by-layer with donated in-place row writes, so peak host
    memory is ONE layer's largest tensor and peak device memory is the
    final (sharded) params plus one staging row. This is the GSPMD answer
    to the reference's staggered per-rank torch load
    (models/TP_llama.py:89-114: rank r sleeps r*x seconds, then loads the
    WHOLE model on every rank before slicing out its TP shard).
    """
    import jax
    import jax.numpy as jnp

    with open(os.path.join(model_dir, "config.json")) as f:
        hf_cfg = json.load(f)
    if cfg is None:
        cfg = config_from_hf(hf_cfg, rope_on_slots=rope_on_slots)
    jdt = jnp.dtype(dtype)
    fmap = _tensor_file_map(model_dir)
    from safetensors import safe_open

    def read(name: str) -> np.ndarray:
        if name not in fmap:
            name = name.removeprefix("model.")   # exports without prefix
        with safe_open(fmap[name], framework="np") as sf:
            return sf.get_tensor(name)

    def leaf_shard(path: str):
        if shardings is None:
            return None
        node = shardings
        for k in path.split("."):
            node = node[k]
        return node

    def put(path: str, arr: np.ndarray):
        """Place one whole (non-stacked) tensor, converting on device."""
        sh = leaf_shard(path)
        conv = jax.jit(lambda x: x.astype(jdt), out_shardings=sh)
        return conv(jnp.asarray(arr))

    def stream_stack(path: str, fmt: str, transpose: bool) -> jax.Array:
        """Build the [L, ...] stacked leaf by donated per-layer row writes
        into a device buffer allocated once under the leaf's sharding."""
        sh = leaf_shard(path)
        row0 = read(fmt.format(0))
        if transpose:
            row0 = row0.T
        shape = (cfg.num_layers,) + row0.shape
        buf = jax.jit(lambda: jnp.zeros(shape, jdt), out_shardings=sh)()
        write = jax.jit(
            lambda b, row, i: b.at[i].set(row.astype(jdt)),
            donate_argnums=(0,),
            **({} if sh is None else {"out_shardings": sh}))
        for i in range(cfg.num_layers):
            row = row0 if i == 0 else read(fmt.format(i))
            if transpose and i > 0:
                row = row.T
            buf = write(buf, jnp.asarray(np.ascontiguousarray(row)),
                        jnp.int32(i))
        return buf

    L = "model.layers.{}."
    layer_specs = {
        "wq": (L + "self_attn.q_proj.weight", True),
        "wk": (L + "self_attn.k_proj.weight", True),
        "wv": (L + "self_attn.v_proj.weight", True),
        "wo": (L + "self_attn.o_proj.weight", True),
        "w_gate": (L + "mlp.gate_proj.weight", True),
        "w_up": (L + "mlp.up_proj.weight", True),
        "w_down": (L + "mlp.down_proj.weight", True),
        "ln_attn": (L + "input_layernorm.weight", False),
        "ln_mlp": (L + "post_attention_layernorm.weight", False),
    }
    params = {
        "embed": put("embed", read("model.embed_tokens.weight")),
        "layers": {k: stream_stack(f"layers.{k}", fmt, tr)
                   for k, (fmt, tr) in layer_specs.items()},
        "final_norm": put("final_norm", read("model.norm.weight")),
    }
    if cfg.tie_word_embeddings or "lm_head.weight" not in fmap:
        tie = jax.jit(lambda e: e.T, out_shardings=leaf_shard("lm_head"))
        params["lm_head"] = tie(params["embed"])
    else:
        params["lm_head"] = put("lm_head", read("lm_head.weight").T)
    return cfg, params


# Reference model zoo (test/offloading_TP.py:56-65): name -> HF repo id.
MODEL_ZOO = {
    "llama-7b-128k": "NousResearch/Yarn-Llama-2-7b-128k",
    "llama-13b-128k": "NousResearch/Yarn-Llama-2-13b-128k",
    "lwm-128k": "LargeWorldModel/LWM-Text-128K",
    "lwm-chat-128k": "LargeWorldModel/LWM-Text-Chat-128K",
    "llama-68m": "JackFram/llama-68m",
    "tinyllama-1.1b-128k": "NousResearch/Yarn-Llama-2-7b-128k",  # arch proxy
}


def resolve_checkpoint(name_or_dir: str) -> str:
    """Resolve a zoo name or path to a local checkpoint directory, checking
    the HF cache layout. Raises with a clear message when the checkpoint is
    not available locally (this environment has no network egress)."""
    if os.path.isdir(name_or_dir):
        return name_or_dir
    repo = MODEL_ZOO.get(name_or_dir, name_or_dir)
    cache = os.environ.get(
        "HF_HOME", os.path.expanduser("~/.cache/huggingface"))
    repo_root = os.path.join(cache, "hub",
                             "models--" + repo.replace("/", "--"))
    snap_root = os.path.join(repo_root, "snapshots")
    if os.path.isdir(snap_root):
        # prefer the revision refs/main points at (hub cache layout);
        # fall back to newest-by-mtime — NOT lexicographic hash order,
        # which is unrelated to recency
        ref = os.path.join(repo_root, "refs", "main")
        if os.path.isfile(ref):
            with open(ref) as f:
                rev = f.read().strip()
            cand = os.path.join(snap_root, rev)
            if os.path.isdir(cand):
                return cand
        snaps = sorted(os.listdir(snap_root),
                       key=lambda s: os.path.getmtime(
                           os.path.join(snap_root, s)))
        if snaps:
            return os.path.join(snap_root, snaps[-1])
    raise FileNotFoundError(
        f"checkpoint {name_or_dir!r} (repo {repo!r}) not found locally; "
        f"download it to the HF cache or pass a directory path")
