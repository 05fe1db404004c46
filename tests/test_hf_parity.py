"""HF checkpoint conversion + logits parity against transformers' Llama —
the oracle SURVEY.md §7.2 step 1 calls for ("HF logits parity on short
contexts"). Runs fully offline: a tiny randomly-initialised HF model is
saved to disk and re-ingested through triforce_tpu.models.hf.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from triforce_tpu.models import hf, llama
from triforce_tpu.cache import init_kv

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")


@pytest.fixture(scope="module")
def hf_checkpoint(tmp_path_factory):
    d = tmp_path_factory.mktemp("hf_tiny")
    cfg = transformers.LlamaConfig(
        vocab_size=128, hidden_size=32, intermediate_size=64,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=512, rms_norm_eps=1e-5, rope_theta=10000.0,
        tie_word_embeddings=False)
    torch.manual_seed(0)
    model = transformers.LlamaForCausalLM(cfg).eval().float()
    model.save_pretrained(str(d))
    return str(d), model


def test_config_translation(hf_checkpoint):
    path, _ = hf_checkpoint
    cfg, params = hf.load_params(path, dtype="float32")
    assert cfg.vocab_size == 128
    assert cfg.num_layers == 2
    assert cfg.num_kv_heads == 2
    assert cfg.head_dim == 8
    assert params["layers"]["wq"].shape == (2, 32, 32)
    assert params["layers"]["wk"].shape == (2, 32, 16)
    assert params["lm_head"].shape == (32, 128)


def test_logits_parity_with_transformers(hf_checkpoint):
    path, model = hf_checkpoint
    cfg, params = hf.load_params(path, dtype="float32")

    rng = np.random.default_rng(3)
    ids = rng.integers(0, cfg.vocab_size, size=(1, 24))

    with torch.no_grad():
        want = model(torch.tensor(ids)).logits.numpy()

    kv = init_kv(cfg, max_len=32, dtype=jnp.float32)
    got, kv, _ = llama.forward_append(cfg, params, jnp.asarray(ids), kv)
    got = np.asarray(got)

    np.testing.assert_allclose(got, want, atol=2e-3, rtol=2e-3)


def test_incremental_decode_matches_hf(hf_checkpoint):
    """Chunked prefill + 1-token appends must equal HF's full forward."""
    path, model = hf_checkpoint
    cfg, params = hf.load_params(path, dtype="float32")
    rng = np.random.default_rng(5)
    ids = rng.integers(0, cfg.vocab_size, size=(1, 20))

    with torch.no_grad():
        want = model(torch.tensor(ids)).logits.numpy()

    kv = init_kv(cfg, max_len=32, dtype=jnp.float32)
    _, kv, _ = llama.forward_append(cfg, params, jnp.asarray(ids[:, :9]), kv)
    _, kv, _ = llama.forward_append(cfg, params, jnp.asarray(ids[:, 9:16]),
                                    kv)
    outs = []
    for i in range(16, 20):
        lg, kv, _ = llama.forward_append(cfg, params,
                                         jnp.asarray(ids[:, i:i + 1]), kv)
        outs.append(np.asarray(lg)[0, -1])
    np.testing.assert_allclose(np.stack(outs), want[0, 16:20],
                               atol=2e-3, rtol=2e-3)


def test_yarn_config_translation():
    cfg = hf.config_from_hf({
        "vocab_size": 32000, "hidden_size": 4096,
        "intermediate_size": 11008, "num_hidden_layers": 32,
        "num_attention_heads": 32, "max_position_embeddings": 131072,
        "rms_norm_eps": 1e-5, "rope_theta": 10000.0,
        "rope_scaling": {"type": "yarn", "factor": 32.0,
                         "original_max_position_embeddings": 4096},
    })
    assert cfg.rope.kind == "yarn"
    assert cfg.rope.scaling_factor == 32.0
    assert cfg.rope.original_max_position_embeddings == 4096
    assert cfg.head_dim == 128
