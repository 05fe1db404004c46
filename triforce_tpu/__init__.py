"""triforce-tpu: TPU-native hierarchical speculative decoding for long-context
Llama models (TriForce capabilities, re-designed for JAX/XLA/Pallas/pjit)."""

from . import config
from .config import ModelConfig, RopeConfig, SpecConfig, PRESETS

# subpackage surface (lazy-ish: these are light modules; heavy jax work
# happens only when functions are called)
from . import cache, data, decoding, engine, profiling
from .engine import Engine, TriForceState
from .decoding import autoregressive, retrieval_spec, triforce

__version__ = "0.1.0"
