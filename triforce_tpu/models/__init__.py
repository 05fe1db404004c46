from . import llama, rope
