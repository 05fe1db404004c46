"""Model / cache / speculation configuration for triforce-tpu.

Replaces the reference's scattered argparse + HF-config plumbing
(`/root/reference/models/config_yarn.py`, `test/on_chip.py:21-40`) with frozen
dataclasses usable as static jit arguments.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class RopeConfig:
    """Rotary embedding config.

    ``kind='llama'`` is the classic RoPE; ``kind='yarn'`` is YaRN NTK-by-parts
    (reference: ``models/modeling_llama.py:50-130``).
    """

    kind: str = "llama"  # "llama" | "yarn"
    theta: float = 10000.0
    # YaRN-only knobs
    scaling_factor: float = 1.0
    original_max_position_embeddings: int = 4096
    beta_fast: float = 32.0
    beta_slow: float = 1.0
    extrapolation_factor: float = 1.0
    attn_factor: float = 1.0


@dataclasses.dataclass(frozen=True)
class ModelConfig:
    """Llama-family architecture description (static under jit)."""

    vocab_size: int = 32000
    hidden_size: int = 4096
    intermediate_size: int = 11008
    num_layers: int = 32
    num_heads: int = 32
    num_kv_heads: int = 32
    head_dim: int = 128
    max_position_embeddings: int = 131072
    rms_norm_eps: float = 1e-5
    rope: RopeConfig = dataclasses.field(default_factory=RopeConfig)
    # Drafter-style attention: keys cached UN-rotated; RoPE re-applied to the
    # whole visible window each step with slot-index positions
    # (reference: models/modeling_llama_68m.py:151-178). Target models cache
    # rotated keys (reference: models/modeling_llama.py:221-230).
    rope_on_slots: bool = False
    tie_word_embeddings: bool = False

    @property
    def num_kv_groups(self) -> int:
        return self.num_heads // self.num_kv_heads

    def with_(self, **kw) -> "ModelConfig":
        return dataclasses.replace(self, **kw)


@dataclasses.dataclass(frozen=True)
class SpecConfig:
    """Speculation hyper-parameters (reference: test/on_chip.py:21-40)."""

    gamma: int = 6                # drafter lookahead per middle round
    budget: int = 4096            # retrieval cache budget (selected tokens)
    chunk_size: int = 8           # retrieval chunk granularity
    # drafter tokens verified per middle forward (engine._middle_spec).
    # 1 = the reference schedule (one drafter step per middle verify,
    # decoding.py:163-223). k>1 drafts k tokens autoregressively and walks
    # the chain after ONE middle verify: the middle verify streams the whole
    # target weight set (it IS the target over the retrieval cache) while a
    # drafter forward is ~10x cheaper, so fewer verifies per step is the
    # dominant decode-latency lever at int8 weights (NOTES_ROUND3.md).
    middle_chain: int = 1
    # middle-loop trip bound: 0 = loop until gamma proposals (data-dependent
    # lax.while_loop — free on one row). Under BATCHED speculation the
    # vmapped while_loop runs the MAX trip count over all rows every step
    # (one unlucky row stalls the batch); a small fixed trip count runs rows
    # in lockstep — a row whose chains truncate simply proposes fewer than
    # gamma tokens to the target that step (gamma2 is data-dependent
    # downstream anyway), bounding step latency at a small tokens-per-step
    # cost. ceil(gamma / (middle_chain+1)) + 1 covers one mid-chain
    # rejection; BatchedSpecEngine defaults to that when this is 0.
    middle_trips: int = 0
    # int8 x int8 MXU for the MIDDLE verify's matmuls (dynamic per-token
    # activation quant, llama._wmm aq path — no per-matmul int8->bf16
    # weight convert). The middle level is a PROPOSAL distribution: its
    # p_rows are consumed consistently (sampled from AND handed to the
    # outer exact rejection test as q), so losslessness is untouched —
    # same argument as the tree GROW's act-quant (NOTES_ROUND4 item 2).
    # The full-cache target verify always stays exact.
    mid_act_quant: bool = False
    draft_start_size: int = 16    # StreamingLLM sink
    draft_recent_size: int = 250  # StreamingLLM window
    temperature: float = 0.6
    top_p: float = 0.9
    top_k: int = -1
    max_len: int = 256            # generation length


# ---------------------------------------------------------------------------
# Presets mirroring the reference's model zoo (test/offloading_TP.py:56-65).
# ---------------------------------------------------------------------------

LLAMA_68M = ModelConfig(
    vocab_size=32000,
    hidden_size=768,
    intermediate_size=3072,
    num_layers=2,
    num_heads=12,
    num_kv_heads=12,
    head_dim=64,
    max_position_embeddings=2048,
    rms_norm_eps=1e-6,
    rope=RopeConfig(kind="llama", theta=10000.0),
    rope_on_slots=True,  # drafter: StreamingLLM slot-position semantics
)

# NousResearch/Yarn-Llama-2-7b-128k
LLAMA2_7B_128K = ModelConfig(
    vocab_size=32000,
    hidden_size=4096,
    intermediate_size=11008,
    num_layers=32,
    num_heads=32,
    num_kv_heads=32,
    head_dim=128,
    max_position_embeddings=131072,
    rms_norm_eps=1e-5,
    rope=RopeConfig(
        kind="yarn",
        theta=10000.0,
        scaling_factor=32.0,
        original_max_position_embeddings=4096,
    ),
)

# NousResearch/Yarn-Llama-2-13b-128k
LLAMA2_13B_128K = LLAMA2_7B_128K.with_(
    hidden_size=5120,
    intermediate_size=13824,
    num_layers=40,
    num_heads=40,
    num_kv_heads=40,
)

# LargeWorldModel/LWM-Text-Chat-128K: plain RoPE with a large theta.
LWM_TEXT_CHAT_128K = LLAMA2_7B_128K.with_(
    rope=RopeConfig(kind="llama", theta=10_000_000.0),
)

# A GQA long-context config that fits a single v5e chip at 128K
# (22 layers x 4 KV heads x 64 dim -> ~46 KB/token of KV): used for the
# single-chip 128K benchmark where Llama2-7B's 64 GB MHA cache cannot fit
# without the multi-chip mesh.
TINYLLAMA_1_1B_128K = ModelConfig(
    vocab_size=32000,
    hidden_size=2048,
    intermediate_size=5632,
    num_layers=22,
    num_heads=32,
    num_kv_heads=4,
    head_dim=64,
    max_position_embeddings=131072,
    rms_norm_eps=1e-5,
    rope=RopeConfig(
        kind="yarn",
        theta=10000.0,
        scaling_factor=64.0,
        original_max_position_embeddings=2048,
    ),
)

# Single-chip benchmark proxy: Llama-7B-128K's *memory regime* scaled to one
# v5e chip (16 GB HBM). The reference's headline config is KV-bound:
# 64 GB KV vs 14 GB weights (ratio 4.6, index.html:146). This model keeps
# that ratio on one chip: MHA 16 heads x 128 dim x 16 layers -> 128 KB/token
# of KV (8.0 GB at 64K context) vs ~1.9 GB bf16 weights (ratio 4.2), so the
# measured TriForce-vs-AR speedup exercises the same bandwidth economics the
# reference reports, without a multi-chip mesh.
BENCH_7B_PROXY = ModelConfig(
    vocab_size=32000,
    hidden_size=2048,
    intermediate_size=5632,
    num_layers=16,
    num_heads=16,
    num_kv_heads=16,
    head_dim=128,
    max_position_embeddings=131072,
    rms_norm_eps=1e-5,
    rope=RopeConfig(
        kind="yarn",
        theta=10000.0,
        scaling_factor=32.0,
        original_max_position_embeddings=4096,
    ),
)

# Single-chip proxy for the reference's Llama2-13B-128K row
# (index.html:197-202, BASELINE.json). Mirrors BENCH_7B_PROXY's
# construction at the 13B model's byte ratio: 13B at 128K is ~98 GB KV vs
# ~26 GB fp16 weights (KV:weights ~ 3.8, vs the 7B's 4.6). This model
# reproduces that ratio under the same convention the 7b proxy used
# (KV at 64K vs bf16 weights): 17 MHA layers x 20 heads x 128 dim
# -> 160 KB/token of KV (11.4 GB at 64K) vs ~3.0 GB bf16 weights
# (ratio 3.8). int8 KV at 124928 prefill is ~11 GB — fits one v5e with the
# donated single-cache-set discipline.
BENCH_13B_PROXY = ModelConfig(
    vocab_size=32000,
    hidden_size=2560,
    intermediate_size=6912,
    num_layers=17,
    num_heads=20,
    num_kv_heads=20,
    head_dim=128,
    max_position_embeddings=131072,
    rms_norm_eps=1e-5,
    rope=RopeConfig(
        kind="yarn",
        theta=10000.0,
        scaling_factor=32.0,
        original_max_position_embeddings=4096,
    ),
)

# Tiny configs for CPU unit tests.
TINY_TARGET = ModelConfig(
    vocab_size=199,
    hidden_size=64,
    intermediate_size=128,
    num_layers=2,
    num_heads=4,
    num_kv_heads=2,
    head_dim=16,
    max_position_embeddings=4096,
    rms_norm_eps=1e-5,
    rope=RopeConfig(kind="yarn", theta=10000.0, scaling_factor=4.0,
                    original_max_position_embeddings=1024),
)

TINY_DRAFT = ModelConfig(
    vocab_size=199,
    hidden_size=32,
    intermediate_size=64,
    num_layers=2,
    num_heads=2,
    num_kv_heads=2,
    head_dim=16,
    max_position_embeddings=2048,
    rms_norm_eps=1e-6,
    rope=RopeConfig(kind="llama", theta=10000.0),
    rope_on_slots=True,
)

PRESETS = {
    "llama-68m": LLAMA_68M,
    "llama2-7b-128k": LLAMA2_7B_128K,
    "llama2-13b-128k": LLAMA2_13B_128K,
    "lwm-text-chat-128k": LWM_TEXT_CHAT_128K,
    "tinyllama-1.1b-128k": TINYLLAMA_1_1B_128K,
    "bench-7b-proxy": BENCH_7B_PROXY,
    "bench-13b-proxy": BENCH_13B_PROXY,
    "tiny-target": TINY_TARGET,
    "tiny-draft": TINY_DRAFT,
}

DEFAULT_DTYPE = jnp.bfloat16
