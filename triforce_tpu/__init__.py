"""triforce-tpu: TPU-native hierarchical speculative decoding for long-context
Llama models (TriForce capabilities, re-designed for JAX/XLA/Pallas/pjit)."""

from . import config
from .config import ModelConfig, RopeConfig, SpecConfig, PRESETS

__version__ = "0.1.0"
