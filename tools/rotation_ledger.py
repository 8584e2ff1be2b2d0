"""Driver-evidence rotation ledger.

The external driver checks a 50-query prefix of the registry per round
(`registry._PRIORITY`) and records per-query gate results in
`CORRECTNESS_r{N}.json`. This tool unions those files into a per-query
"last driver-green round" table so each round's window rotation can be
chosen mechanically: never-checked queries first, then stalest
evidence, and the displacement comments in `registry.py` stay honest.

Usage:
    python tools/rotation_ledger.py            # summary + stalest 60
    python tools/rotation_ledger.py --all      # every query
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from spark_streaming_with_debezium_spark.registry import load_all  # noqa: E402


def ledger(repo_root: str = ".") -> dict[str, dict]:
    """name -> {last_green, last_seen, rounds_green} from every
    CORRECTNESS_r*.json present. 'green' = all three gates passed (or
    rows-only ran without error for queries that declare no oracle)."""
    out: dict[str, dict] = {}
    for path in sorted(glob.glob(os.path.join(repo_root, "CORRECTNESS_r*.json"))):
        m = re.search(r"CORRECTNESS_r(\d+)\.json$", path)
        if not m:
            continue
        rnd = int(m.group(1))
        try:
            data = json.load(open(path))
        except (OSError, json.JSONDecodeError):
            continue
        for name, row in data.items():
            rec = out.setdefault(
                name, {"last_green": None, "last_seen": None, "rounds_green": []}
            )
            rec["last_seen"] = rnd
            green = bool(row.get("hash_match")) or (
                row.get("err") == "no_oracle" and row.get("spark_rows") is not None
            )
            if green:
                rec["last_green"] = rnd
                rec["rounds_green"].append(rnd)
    return out


def main() -> None:
    show_all = "--all" in sys.argv
    led = ledger(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    names = list(load_all())
    never = [n for n in names if n not in led]
    staleness = sorted(
        ((led[n]["last_green"] or -1, n) for n in names if n in led),
    )
    print(f"registry: {len(names)} queries; driver-checked ever: {len(led)}; "
          f"never-checked: {len(never)}")
    if never:
        print("never-checked (lead the next window):")
        for n in never:
            print(f"  {n}")
    print("stalest driver evidence first:")
    rows = staleness if show_all else staleness[:60]
    for last, n in rows:
        print(f"  r{last:02d}  {n}")


if __name__ == "__main__":
    main()
