"""CLI smoke: each mode runs end to end on tiny configs (the parity surface
of the reference's four entry scripts)."""

import pytest

from triforce_tpu import cli

COMMON = ["--model", "tiny-target", "--prefill", "64", "--gen_len", "12",
          "--gamma", "3", "--budget", "16", "--chunk_size", "4",
          "--dataset", "synthetic"]


def test_cli_retrieval(tmp_path):
    csv = str(tmp_path / "log.csv")
    res = cli.main(["--mode", "retrieval", *COMMON, "--file", csv])
    assert res.tokens_per_sec > 0
    assert open(csv).read().count("\n") == 2  # header + entry


def test_cli_ar():
    res = cli.main(["--mode", "ar", *COMMON])
    assert res.steps == 12


def test_cli_tree():
    res = cli.main(["--mode", "tree", *COMMON, "--tree_size", "8",
                    "--tree_depth", "4"])
    assert len(res.tokens) >= 2


def test_cli_triforce():
    res = cli.main(["--mode", "triforce", "--draft", "tiny-draft", *COMMON,
                    "--draft_cache_budget", "36", "--start_size", "4"])
    assert len(res.tokens) >= 12


def test_cli_middle_chain():
    res = cli.main(["--mode", "triforce", *COMMON, "--draft", "tiny-draft",
                    "--middle_chain", "0"])   # 0 = auto (gamma)
    assert res.tokens_per_sec > 0 and len(res.tokens) >= 12


def test_cli_batched_dpxtpxsp():
    """--batch with the full (dp, tp, sp) mesh: the production serving
    shape, end to end through the CLI (needs 8 virtual devices)."""
    import jax
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 devices")
    res = cli.main(["--mode", "retrieval", *COMMON, "--batch", "4",
                    "--dp", "2", "--tp", "2", "--sp", "2"])
    assert res.tokens_per_sec > 0
    assert 0.0 <= res.acceptance_rate <= 1.0   # real rate, not NaN


def test_cli_serve():
    """Continuous-batching mode: 5 requests through 2 speculative slots,
    every request completes at its requested length."""
    done = cli.main(["--mode", "serve", *COMMON, "--num_prompts", "5",
                     "--batch", "2", "--segment", "2",
                     "--start_size", "4", "--draft_cache_budget", "19"])
    assert len(done) == 5
    assert all(r.done and len(r.out) == 12 for r in done)
