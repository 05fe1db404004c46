"""bench.py composition + persistence logic (no TPU, no model runs):
the composed record must be valid for ANY completion prefix (it is echoed
after every mode and emitted on SIGTERM), and partial records must be
keyed/stamped so stale or cross-build numbers can never be quoted."""

import argparse
import json
import os

import bench
from benchlib import persist


def _args(**kw):
    ns = argparse.Namespace(
        preset="7b-proxy", prefill=None, gen_len=None, prefill_chunk=512,
        kv_dtype="int8", alpha=0.9, weights="int8", gamma=6, trips=0,
        chain=0, calibrate=True, tree_size=512, tree_depth=24,
        tree_budget=12288, ssl=4, serve_slots=4, serve_requests=8,
        serve_gen=0, mid_aq=False, modes="retrieval,triforce")
    for k, v in kw.items():
        setattr(ns, k, v)
    return ns


AR = {"tokens_per_sec": 76.0, "ms_per_token": 13.1}
TRI = {"forced": {"0.9": {"tokens_per_sec": 300.0}},
       "calibrated": {"tokens_per_sec": 360.0, "measured_accept": 0.9,
                      "coin": 0.97}}


def test_compose_headline_and_partial_flag():
    args = _args()
    req = ["retrieval", "triforce", "batched"]
    out = bench.compose(args, {"ar": AR, "triforce": TRI}, "7b-proxy",
                        "tpu", req, [0.9])
    assert out["metric"] == "triforce_speedup_vs_ar_at_controlled_acceptance"
    assert abs(out["value"] - 360.0 / 76.0) < 1e-3  # rounded to 4dp
    assert out["detail"]["headline_mode"] == "triforce"
    # missing modes are declared
    assert out["detail"]["partial"] == ["retrieval", "batched"]

    done = bench.compose(args, {"ar": AR, "triforce": TRI,
                                "retrieval": TRI, "batched": {
                                    "rows": 4, "scaling_slope": 1.7,
                                    "scaling": 1.8}},
                         "7b-proxy", "tpu", req, [0.9])
    assert "partial" not in done["detail"]


def test_compose_every_prefix_is_valid():
    args = _args()
    req = ["retrieval", "triforce"]
    for results in ({}, {"ar": AR},
                    {"batched": {"rows": 4, "scaling_slope": 1.7,
                                 "scaling": 1.8}},
                    {"serve": {"decode_segment_tokens_per_sec": 650.0}},
                    {"13b": {"speedup_vs_ar": 4.0}}):
        out = bench.compose(args, dict(results), "7b-proxy", "tpu", req,
                            [0.9])
        json.dumps(out)   # always serializable
        assert set(out) >= {"metric", "value", "unit", "vs_baseline",
                            "detail"}


def test_persist_roundtrip_and_stamp(tmp_path):
    path = str(tmp_path / "partial.json")
    fp = persist.fingerprint(_args(), "tpu:7b-proxy")
    rec = persist.stamp({"x": 1}, wall_s=12.3)
    persist.save(fp, {"triforce": rec}, {"triforce": 0.97}, path=path)
    records, seeds = persist.load(fp, path=path)
    assert records["triforce"]["x"] == 1
    assert records["triforce"]["wall_s"] == 12.3
    assert seeds == {"triforce": 0.97}
    # a different config fingerprint sees nothing
    fp2 = persist.fingerprint(_args(alpha=0.8), "tpu:7b-proxy")
    records2, _ = persist.load(fp2, path=path)
    assert records2 == {}
    # stale records are dropped (seeds persist — they only affect speed)
    old = persist.stamp({"x": 2}, wall_s=1.0)
    old["_measured_unix"] -= (persist.MAX_AGE_H + 1) * 3600
    persist.save(fp, {"triforce": old}, {"triforce": 0.97}, path=path)
    records3, seeds3 = persist.load(fp, path=path)
    assert records3 == {} and seeds3 == {"triforce": 0.97}
