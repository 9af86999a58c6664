"""Sweep round-2 ELL knob ablations on the poisson config (regression
hunt): one subprocess per knob set since knobs are read at import/plan
time. Prints one line per set."""

import json
import os
import subprocess
import sys

HERE = os.path.dirname(os.path.abspath(__file__))

SETS = [
    ("default", {}),
    ("lcol16", {"ELLSPMV_TPU_LCOL8": "0"}),
    ("lcol32", {"ELLSPMV_TPU_LCOL8": "0", "ELLSPMV_TPU_LCOL16": "0"}),
    ("tree-scan", {"ELLSPMV_TPU_SELECT_TREE": "1"}),
    ("no-slotsort", {"ELLSPMV_TPU_SLOTSORT": "0"}),
    ("no-slotks", {"ELLSPMV_TPU_SLOT_KS": "0"}),
    ("no-super", {"ELLSPMV_TPU_SUB": "1"}),
    ("nacc1", {"ELLSPMV_TPU_NACC": "1"}),
    ("no-super-n1", {"ELLSPMV_TPU_SUB": "1", "ELLSPMV_TPU_NACC": "1"}),
    ("round1-ish", {"ELLSPMV_TPU_LCOL8": "0", "ELLSPMV_TPU_SELECT_TREE": "1",
                    "ELLSPMV_TPU_SLOTSORT": "0", "ELLSPMV_TPU_SLOT_KS": "0",
                    "ELLSPMV_TPU_SUB": "1", "ELLSPMV_TPU_NACC": "1"}),
]


def main() -> int:
    names = sys.argv[1:]
    for name, env in SETS:
        if names and name not in names:
            continue
        e = dict(os.environ)
        e.update(env)
        p = subprocess.run(
            [sys.executable, os.path.join(HERE, "bench_poisson_ell.py")],
            env=e, capture_output=True, text=True, timeout=1200)
        line = (p.stdout.strip().splitlines() or ["{}"])[-1]
        try:
            d = json.loads(line)
        except ValueError:
            print(f"{name:12s} FAILED: {p.stderr.strip()[-300:]}",
                  flush=True)
            continue
        pl = d.get("plan", {})
        print(f"{name:12s} {d['best_ms']:.3f} ms  "
              f"{d['min_gb_per_s']:.0f} GB/s  {100*d['roofline']:.1f}%  "
              f"S={pl.get('S')} KS={pl.get('KS')} ks={pl.get('ks_mean')} "
              f"lcol={pl.get('lcol_dtype')} static={pl.get('static_window')}",
              flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
