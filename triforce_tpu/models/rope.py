"""Rotary position embeddings: classic Llama RoPE and YaRN NTK-by-parts.

TPU-native re-design of the reference rotary modules
(``/root/reference/models/modeling_llama.py:21-130``): tables are pure
functions of the config, precomputed once in fp32 on host, and applied with a
vectorised rotate-half — no nn.Module state, no per-forward recompute.
"""

from __future__ import annotations

import functools
import math

import jax.numpy as jnp
import numpy as np

from ..config import ModelConfig, RopeConfig


def _yarn_get_mscale(scale: float) -> float:
    # reference: models/modeling_llama.py:50-53
    if scale <= 1:
        return 1.0
    return 0.1 * math.log(scale) + 1.0


def _yarn_find_correction_dim(num_rotations, dim, base, max_pos):
    # reference: models/modeling_llama.py:55-56
    return (dim * math.log(max_pos / (num_rotations * 2 * math.pi))) / (
        2 * math.log(base))


def _yarn_find_correction_range(low_rot, high_rot, dim, base, max_pos):
    # reference: models/modeling_llama.py:58-63
    low = math.floor(_yarn_find_correction_dim(low_rot, dim, base, max_pos))
    high = math.ceil(_yarn_find_correction_dim(high_rot, dim, base, max_pos))
    return max(low, 0), min(high, dim - 1)


def _yarn_linear_ramp(lo: float, hi: float, dim: int) -> np.ndarray:
    # reference: models/modeling_llama.py:65-71
    if lo == hi:
        hi += 0.001
    ramp = (np.arange(dim, dtype=np.float32) - lo) / (hi - lo)
    return np.clip(ramp, 0.0, 1.0)


def _effective_scale(rope: RopeConfig, max_len: int | None) -> float:
    """Scaling factor, with the DYNAMIC kinds resolved at table-build time.

    The reference validates 'dynamic'/'dynamic-yarn' in its config
    (config_yarn.py:184-193) but its modeling only implements classic +
    static yarn; HF's dynamic variants recompute tables as the context
    grows — which is inconsistent with rotated-key caches (earlier
    positions' rotations would change under the cache). The static-shape
    TPU design resolves the dynamic factor ONCE from the maximum planned
    context (the cos/sin table length), which is both jit-friendly and
    cache-consistent."""
    if rope.kind in ("dynamic", "dynamic-yarn") and max_len:
        return max(float(max_len) / rope.original_max_position_embeddings,
                   1.0)
    return rope.scaling_factor


def inv_freq_for(rope: RopeConfig, head_dim: int,
                 max_len: int | None = None) -> np.ndarray:
    """Per-pair inverse frequencies, fp32, shape [head_dim // 2]."""
    pos_freqs = rope.theta ** (
        np.arange(0, head_dim, 2, dtype=np.float32) / head_dim)
    scale = _effective_scale(rope, max_len)
    if rope.kind == "llama":
        return 1.0 / pos_freqs
    if rope.kind == "linear":
        # HF linear position interpolation: positions divided by scale
        return 1.0 / (scale * pos_freqs)
    if rope.kind == "dynamic":
        # NTK-aware dynamic scaling, resolved once at table-build time with
        # the HF formula: base *= (factor * seq/orig - (factor - 1))^(d/(d-2))
        # — the checkpoint's configured factor enters the multiplier, it is
        # NOT just seq/orig (transformers modeling_llama dynamic NTK)
        orig = rope.original_max_position_embeddings
        seq = max(max_len, orig)
        mult = max(rope.scaling_factor * seq / orig
                   - (rope.scaling_factor - 1.0), 1.0)
        base = rope.theta * (mult ** (head_dim / (head_dim - 2)))
        return 1.0 / (base ** (
            np.arange(0, head_dim, 2, dtype=np.float32) / head_dim))
    if rope.kind in ("yarn", "dynamic-yarn", "ntk-by-parts"):
        # reference: models/modeling_llama.py:97-105 (NTK-by-parts ramp;
        # yarn = ntk-by-parts + mscale attention scaling)
        inv_extra = 1.0 / pos_freqs
        inv_interp = 1.0 / (scale * pos_freqs)
        low, high = _yarn_find_correction_range(
            rope.beta_fast, rope.beta_slow, head_dim, rope.theta,
            rope.original_max_position_embeddings)
        mask = (1.0 - _yarn_linear_ramp(low, high, head_dim // 2)
                ) * rope.extrapolation_factor
        return inv_interp * (1.0 - mask) + inv_extra * mask
    raise ValueError(f"Unknown RoPE kind {rope.kind!r}")


def mscale_for(rope: RopeConfig, max_len: int | None = None) -> float:
    if rope.kind in ("yarn", "dynamic-yarn"):
        # reference: models/modeling_llama.py:92; ntk-by-parts is the same
        # interpolation WITHOUT the attention mscale
        return float(_yarn_get_mscale(_effective_scale(rope, max_len))
                     * rope.attn_factor)
    return 1.0


@functools.lru_cache(maxsize=16)
def _cos_sin_tables_np(rope: RopeConfig, head_dim: int, max_len: int):
    inv_freq = inv_freq_for(rope, head_dim, max_len=max_len)
    t = np.arange(max_len, dtype=np.float32)
    freqs = np.outer(t, inv_freq)                      # [S, D/2]
    emb = np.concatenate([freqs, freqs], axis=-1)      # [S, D]
    m = mscale_for(rope, max_len=max_len)
    return (np.cos(emb) * m).astype(np.float32), (np.sin(emb) * m).astype(
        np.float32)


def cos_sin_tables(config: ModelConfig, max_len: int | None = None,
                   dtype=jnp.float32):
    """Full [max_len, head_dim] cos/sin tables (YaRN mscale folded in).

    The reference precomputes to 131072 and casts to fp16
    (models/modeling_llama.py:108-124); we keep fp32 by default and let the
    caller choose the application dtype.
    """
    max_len = max_len or config.max_position_embeddings
    cos, sin = _cos_sin_tables_np(config.rope, config.head_dim, max_len)
    return jnp.asarray(cos, dtype=dtype), jnp.asarray(sin, dtype=dtype)


def rotate_half(x: jnp.ndarray) -> jnp.ndarray:
    half = x.shape[-1] // 2
    x1, x2 = x[..., :half], x[..., half:]
    return jnp.concatenate([-x2, x1], axis=-1)


def apply_rope(x: jnp.ndarray, cos: jnp.ndarray, sin: jnp.ndarray,
               positions: jnp.ndarray) -> jnp.ndarray:
    """Rotate ``x`` ([..., T, D] with heads anywhere broadcastable).

    ``positions``: [T] (or broadcastable to x's T axis). cos/sin: [S, D]
    tables; gathered rows are broadcast over leading axes.
    """
    c = jnp.take(cos, positions, axis=0)  # [T, D]
    s = jnp.take(sin, positions, axis=0)
    c = c.astype(x.dtype)
    s = s.astype(x.dtype)
    return x * c + rotate_half(x) * s
