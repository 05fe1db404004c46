"""Data layer: prompt sources and fitting (reference data/dataset.py)."""

import json
import numpy as np

from triforce_tpu import data


def test_synthetic_deterministic():
    a = data.synthetic_prompts(2, 256, vocab_size=1000, seed=3)
    b = data.synthetic_prompts(2, 256, vocab_size=1000, seed=3)
    assert len(a) == 2
    for x, y in zip(a, b):
        assert x.shape == (1, 256)
        np.testing.assert_array_equal(x, y)
        assert x.min() >= 0 and x.max() < 1000


def test_fit_prompt_trim_and_tile():
    ids = np.arange(10)[None]
    out = data.fit_prompt(ids, 4)
    np.testing.assert_array_equal(out, [[0, 1, 2, 3]])
    out = data.fit_prompt(ids, 25)
    assert out.shape == (1, 25)
    np.testing.assert_array_equal(out[0, :10], np.arange(10))
    np.testing.assert_array_equal(out[0, 10:20], np.arange(10))


class _Tok:
    def encode(self, text):
        return [ord(c) % 100 for c in text]

    def decode(self, ids, **kw):
        return "".join(chr(97 + (i % 26)) for i in ids)


def test_pg19_local_json(tmp_path):
    d = tmp_path / "pg19"
    d.mkdir()
    with open(d / "a.json", "w") as f:
        for t in ["hello world", "second text"]:
            f.write(json.dumps({"text": t}) + "\n")
    prompts = data.get_dataset("one-shot", _Tok(), data_dir=str(d))
    assert len(prompts) == 1
    assert prompts[0].shape[1] == len("hello world")
    prompts = data.get_dataset("gs", _Tok(), data_dir=str(d))
    assert len(prompts) == 2


FIXTURE_DIR = __file__.rsplit("/", 1)[0] + "/fixtures"


def test_pg19_vendored_fixture_all_variants():
    """The vendored PG-19-FORMAT fixture drives every offline branch of the
    registry (reference data/dataset.py:17-52): '128k' (no limit), 'gs'
    (limit 20), 'one-shot' (limit 1)."""
    for name, want in [("128k", 2), ("gs", 2), ("one-shot", 1)]:
        prompts = data.get_dataset(name, _Tok(), data_dir=FIXTURE_DIR)
        assert len(prompts) == want, name
        for p in prompts:
            assert p.shape[0] == 1 and p.shape[1] > 50
            assert p.dtype == np.int64


def test_cli_runs_pg19_fixture(monkeypatch):
    """End-to-end: the CLI consumes the vendored PG-19 fixture through a
    stub tokenizer (the parity path that had never executed)."""
    from triforce_tpu import cli

    real = cli.load_model

    def fake_load(spec, dtype, drafter=False):
        cfg, params, _ = real(spec, dtype, drafter=drafter)
        return cfg, params, _Tok()
    monkeypatch.setattr(cli, "load_model", fake_load)
    res = cli.main(["--mode", "retrieval", "--model", "tiny-target",
                    "--prefill", "64", "--gen_len", "8", "--gamma", "3",
                    "--budget", "16", "--chunk_size", "4",
                    "--dataset", "one-shot", "--data_dir", FIXTURE_DIR])
    assert res.tokens_per_sec > 0


def test_lwm_chat_template():
    ids = data.build_chat_input_lwm(_Tok(), "x" * 500, prefill=300)
    assert ids.shape[0] == 1
    assert ids.shape[1] > 100


def test_narrativeqa_fixture_demo_lwm():
    """The NarrativeQA-format fixture drives the 'demo'/'lwm' branches
    offline: the LWM chat template (reference data/dataset.py:9-15) wraps
    each fixture document; 'demo' takes one, 'lwm' takes all available."""
    demo = data.get_dataset("demo", _Tok(), data_dir=FIXTURE_DIR)
    assert len(demo) == 1
    lwm = data.get_dataset("lwm", _Tok(), data_dir=FIXTURE_DIR)
    assert len(lwm) == 2
    for p in demo + lwm:
        assert p.shape[0] == 1 and p.shape[1] > 100
    # the template's fixed frame must surround the excerpt
    enc_frame = data.build_chat_input_lwm(_Tok(), "x")
    assert enc_frame.shape[1] > 80
