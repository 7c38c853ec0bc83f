#!/usr/bin/env python3
"""Run the DuckDB oracle gate (scripts/check.py logic) on a corpus and
emit a machine-readable parity map for scaleup_report.py.

Usage: python3 scripts/parity_map.py <sfDir> <verifyOutDir> <out.json> [query ...]
"""
import json
import subprocess
import sys


def main():
    sf_dir, out_dir, out_path = sys.argv[1], sys.argv[2], sys.argv[3]
    queries = sys.argv[4:]
    proc = subprocess.run(
        [sys.executable, "scripts/check.py", sf_dir, out_dir] + queries,
        capture_output=True, text=True)
    parity = {}
    for line in proc.stdout.splitlines():
        parts = line.split()
        if len(parts) >= 2 and parts[0] in ("PASS", "FAIL", "MISS"):
            parity[parts[1].rstrip(":")] = parts[0].lower()
    with open(out_path, "w") as f:
        json.dump(parity, f, indent=1, sort_keys=True)
    print(f"wrote {out_path}: "
          f"{sum(1 for v in parity.values() if v == 'pass')} pass / "
          f"{len(parity)} checked")
    sys.stdout.write(proc.stdout[-2000:])


if __name__ == "__main__":
    main()
