from . import ckpt, hf, llama, rope
