"""Native sharded checkpoint (orbax) save/restore: roundtrip equality,
restore-into-NamedSharding placement, HF conversion path, CLI surface.
(SURVEY.md §5.4: "orbax-style sharded param loading from converted HF
checkpoints".)"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from triforce_tpu import config as C
from triforce_tpu.models import ckpt, llama
from triforce_tpu.parallel import mesh as mesh_mod
from triforce_tpu.parallel.sharding import param_shardings


@pytest.fixture(scope="module")
def saved(tmp_path_factory):
    cfg = C.TINY_TARGET
    params = llama.init_params(jax.random.PRNGKey(0), cfg,
                               dtype=jnp.float32)
    d = str(tmp_path_factory.mktemp("native") / "ck")
    ckpt.save_checkpoint(d, cfg, params)
    return d, cfg, params


def test_roundtrip_equality(saved):
    d, cfg, params = saved
    assert ckpt.is_native_checkpoint(d)
    cfg2, p2 = ckpt.load_checkpoint(d)
    assert cfg2 == cfg
    flat = dict(jax.tree_util.tree_leaves_with_path(p2))
    for key, leaf in jax.tree_util.tree_leaves_with_path(params):
        np.testing.assert_array_equal(np.asarray(leaf),
                                      np.asarray(flat[key]), err_msg=str(key))


def test_restore_into_shardings(saved):
    d, cfg, params = saved
    m = mesh_mod.make_mesh(tp=8)
    sh = param_shardings(m, cfg)
    _, p3 = ckpt.load_checkpoint(d, shardings=sh)
    flat_sh = dict(jax.tree_util.tree_leaves_with_path(sh))
    for key, leaf in jax.tree_util.tree_leaves_with_path(p3):
        assert leaf.sharding == flat_sh[key], key
    wq = p3["layers"]["wq"]
    assert wq.addressable_shards[0].data.shape[-1] == wq.shape[-1] // 8
    np.testing.assert_array_equal(np.asarray(wq),
                                  np.asarray(params["layers"]["wq"]))


def test_convert_hf_and_cli_load(tmp_path):
    torch = pytest.importorskip("torch")
    transformers = pytest.importorskip("transformers")
    src = tmp_path / "hf"
    hcfg = transformers.LlamaConfig(
        vocab_size=128, hidden_size=32, intermediate_size=64,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=512)
    torch.manual_seed(0)
    transformers.LlamaForCausalLM(hcfg).eval().float().save_pretrained(
        str(src))
    out = str(tmp_path / "native")
    cfg, params = ckpt.convert_hf(str(src), out, dtype="float32")
    cfg2, p2 = ckpt.load_checkpoint(out)
    assert cfg2 == cfg
    np.testing.assert_array_equal(np.asarray(params["layers"]["wq"]),
                                  np.asarray(p2["layers"]["wq"]))
    # CLI loads the native dir end to end
    from triforce_tpu import cli
    res = cli.main(["--mode", "ar", "--model", out, "--prefill", "32",
                    "--gen_len", "4", "--budget", "16", "--chunk_size", "4",
                    "--dataset", "synthetic"])
    assert res.steps == 4
