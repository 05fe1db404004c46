"""Per-mode bench persistence (VERDICT r4 item 1).

Every completed mode's record is written to ``BENCH_PARTIAL.json``
immediately, keyed by a fingerprint of the measurement-relevant knobs, so

  * a tunnel flake mid-run only re-measures the unfinished mode,
  * a FRESH ``python bench.py`` invocation (e.g. the driver's, after a
    builder pre-run, or a re-run after a timeout kill) RESUMES from the
    completed modes instead of restarting the ~40 min composed run.

Records are self-describing: each carries ``measured_at`` (ISO timestamp)
and ``wall_s``; stale records (> MAX_AGE_H hours) are ignored so the file
can never serve a different build's numbers. Calibrated accept-coin values
are cached separately and reused as bisection SEEDS regardless of age
(a seed only affects convergence speed, never the quoted number).
"""

from __future__ import annotations

import hashlib
import json
import os
import time

from .common import log

PARTIAL_PATH = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "BENCH_PARTIAL.json")
MAX_AGE_H = 48.0

# knobs that change what a mode measures; anything else (modes list,
# resume flags) does not invalidate records
_FP_KEYS = ("preset", "prefill", "gen_len", "prefill_chunk", "kv_dtype",
            "alpha", "weights", "gamma", "trips", "chain", "calibrate",
            "tree_size", "tree_depth", "tree_budget", "ssl",
            "serve_slots", "serve_requests", "serve_gen", "mid_aq")


def _code_rev() -> str:
    """Last commit touching the MEASURED code (package + harness): a code
    change invalidates cached records — resuming across a code change
    would quote numbers the current build never produced. Doc/record-only
    commits (README, BENCH_*.json) do not invalidate."""
    import subprocess
    try:
        out = subprocess.run(
            ["git", "log", "-1", "--format=%H", "--",
             "triforce_tpu", "benchlib", "bench.py"],
            cwd=os.path.dirname(PARTIAL_PATH), capture_output=True,
            text=True, timeout=10)
        return out.stdout.strip() or "unknown"
    except Exception:
        return "unknown"


def fingerprint(args, backend: str) -> str:
    blob = json.dumps({k: getattr(args, k, None) for k in _FP_KEYS}
                      | {"backend": backend, "code": _code_rev()},
                      sort_keys=True)
    return hashlib.sha1(blob.encode()).hexdigest()[:16]


def load(fp: str, path: str = None) -> tuple[dict, dict]:
    """Returns (records, coin_seeds) for this fingerprint; fresh records
    only, seeds always."""
    path = path or PARTIAL_PATH
    try:
        with open(path) as f:
            data = json.load(f)
    except (OSError, ValueError):
        return {}, {}
    ent = data.get(fp) or {}
    now = time.time()
    records = {}
    for mode, rec in (ent.get("records") or {}).items():
        age_h = (now - rec.get("_measured_unix", 0)) / 3600.0
        if age_h <= MAX_AGE_H:
            records[mode] = rec
        else:
            log(f"[bench] partial record for '{mode}' is {age_h:.0f}h old "
                f"(> {MAX_AGE_H:.0f}h); re-measuring")
    return records, dict(ent.get("coin_seeds") or {})


def save(fp: str, records: dict, coin_seeds: dict, path: str = None) -> None:
    """Atomic write (tmp + rename); keeps other fingerprints' entries."""
    path = path or PARTIAL_PATH
    try:
        with open(path) as f:
            data = json.load(f)
    except (OSError, ValueError):
        data = {}
    data[fp] = {"records": records, "coin_seeds": coin_seeds,
                "saved_at": time.strftime("%Y-%m-%dT%H:%M:%S")}
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(data, f, indent=1)
    os.replace(tmp, path)


def stamp(rec: dict, wall_s: float) -> dict:
    rec["_measured_unix"] = time.time()
    rec["measured_at"] = time.strftime("%Y-%m-%dT%H:%M:%S")
    rec["wall_s"] = round(wall_s, 1)
    return rec
