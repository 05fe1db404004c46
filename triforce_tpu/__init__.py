"""triforce-tpu: TPU-native hierarchical speculative decoding for long-context
Llama models (TriForce capabilities, re-designed for JAX/XLA/Pallas/pjit)."""

import os as _os

if "xla_force_host_platform_device_count" in _os.environ.get(
        "XLA_FLAGS", ""):
    # the caller asked for virtual host devices (multi-chip logic without
    # hardware); pin the cpu platform BEFORE any submodule touches a jax
    # backend — some environments force-register a TPU backend regardless
    # of JAX_PLATFORMS
    import jax as _jax
    try:
        _jax.config.update("jax_platforms", "cpu")
    except Exception:
        pass

from . import config
from .config import ModelConfig, RopeConfig, SpecConfig, PRESETS

# subpackage surface (lazy-ish: these are light modules; heavy jax work
# happens only when functions are called)
from . import cache, data, decoding, engine, profiling
from .engine import Engine, TriForceState
from .decoding import autoregressive, retrieval_spec, triforce

__version__ = "0.1.0"
