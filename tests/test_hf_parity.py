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


def test_streaming_load_matches_eager(hf_checkpoint):
    """load_params_streaming (per-tensor safetensors reads + donated
    per-layer device writes) must produce the exact pytree load_params
    builds from the full host state dict."""
    path, _ = hf_checkpoint
    cfg_e, eager = hf.load_params(path, dtype="float32")
    cfg_s, streamed = hf.load_params_streaming(path, dtype="float32")
    assert cfg_s == cfg_e
    flat_e = jax.tree_util.tree_leaves_with_path(eager)
    flat_s = dict(jax.tree_util.tree_leaves_with_path(streamed))
    assert len(flat_e) == len(flat_s)
    for key, leaf in flat_e:
        np.testing.assert_array_equal(np.asarray(leaf),
                                      np.asarray(flat_s[key]),
                                      err_msg=str(key))


def test_streaming_load_sharded_mesh(hf_checkpoint):
    """Streaming load under param_shardings commits every leaf to its
    NamedSharding on the 8-device mesh (tp splits fall back to replicated
    when a dim does not divide — the tiny model's 32-wide hidden divides
    by 8, so projection leaves must actually be tp-split)."""
    from triforce_tpu.parallel import mesh as mesh_mod
    from triforce_tpu.parallel.sharding import param_shardings

    path, _ = hf_checkpoint
    m = mesh_mod.make_mesh(tp=8)
    cfg, ref = hf.load_params(path, dtype="float32")
    shardings = param_shardings(m, cfg)
    _, streamed = hf.load_params_streaming(path, dtype="float32",
                                           shardings=shardings)
    flat_ref = jax.tree_util.tree_leaves_with_path(ref)
    flat_s = dict(jax.tree_util.tree_leaves_with_path(streamed))
    flat_sh = dict(jax.tree_util.tree_leaves_with_path(shardings))
    for key, leaf in flat_ref:
        got = flat_s[key]
        assert got.sharding == flat_sh[key], key
        np.testing.assert_array_equal(np.asarray(got), np.asarray(leaf),
                                      err_msg=str(key))
    # the wq column split really lands on the tp axis (not replicated)
    wq = streamed["layers"]["wq"]
    assert len(wq.sharding.device_set) == 8
    assert wq.addressable_shards[0].data.shape[-1] == wq.shape[-1] // 8


def test_streaming_load_indexed_shards(hf_checkpoint, tmp_path):
    """The model.safetensors.index.json path: tensors split across two
    shard files resolve through the weight map and load identically."""
    import json as _json
    from safetensors.numpy import save_file

    path, _ = hf_checkpoint
    _, ref = hf.load_params(path, dtype="float32")
    # re-export the single-file checkpoint as two indexed shards
    from safetensors import safe_open
    src = [f for f in __import__("os").listdir(path)
           if f.endswith(".safetensors")][0]
    with safe_open(f"{path}/{src}", framework="np") as sf:
        names = sorted(sf.keys())
        tensors = {k: sf.get_tensor(k) for k in names}
    half = len(names) // 2
    shards = {"model-00001-of-00002.safetensors": names[:half],
              "model-00002-of-00002.safetensors": names[half:]}
    d = tmp_path / "sharded"
    d.mkdir()
    wm = {}
    for fname, ks in shards.items():
        save_file({k: tensors[k] for k in ks}, str(d / fname))
        wm.update({k: fname for k in ks})
    (d / "model.safetensors.index.json").write_text(
        _json.dumps({"weight_map": wm}))
    (d / "config.json").write_text(
        open(f"{path}/config.json").read())
    _, streamed = hf.load_params_streaming(str(d), dtype="float32")
    flat_ref = jax.tree_util.tree_leaves_with_path(ref)
    flat_s = dict(jax.tree_util.tree_leaves_with_path(streamed))
    for key, leaf in flat_ref:
        np.testing.assert_array_equal(np.asarray(leaf),
                                      np.asarray(flat_s[key]),
                                      err_msg=str(key))
