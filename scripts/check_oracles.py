"""Drive-by-hand oracle check (verify-skill surface): thin alias over
tools/parity.py — runs every queries()/oracle_sql() pair (or the named subset)
at sf0.01 and prints ok/FAIL per query."""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from tools.parity import run_gate

if __name__ == "__main__":
    only = set(sys.argv[1:]) or None
    raise SystemExit(1 if run_gate("/root/testdata/sf0.01", only) else 0)
