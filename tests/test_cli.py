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
