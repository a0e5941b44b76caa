#!/usr/bin/env python
"""Verification-window budget report: which registered queries have no
valid green driver row (never verified, or source/oracle/dep edited
since — digest mismatch against verified.json), plus the per-round age
histogram of the still-valid evidence.

Run BEFORE and AFTER editing shared operator code: the stale count is
the number of driver verification slots (of 50/round) the current
working tree will consume; the remainder rotates the oldest evidence.

    python scripts/stale_report.py            # summary + stale names
    python scripts/stale_report.py --names    # stale names only, one line
"""

from __future__ import annotations

import sys
from collections import Counter
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from rclabsapi_spark.registry import (  # noqa: E402
    _load_verified,
    get_registry,
    spec_digest,
)


def main() -> None:
    reg = get_registry()
    ver = _load_verified()
    stale, ages = [], Counter()
    for name, spec in reg.items():
        rec = ver.get(name)
        if rec is None or rec["digest"] != spec_digest(spec):
            stale.append(name)
        else:
            ages[rec["round"]] += 1
    stale.sort()
    if "--names" in sys.argv:
        print(" ".join(stale))
        return
    print(f"{len(stale)} stale/new of {len(reg)} registered "
          f"({50 - len(stale)} rotation slots if <= 50)")
    for n in stale:
        print(f"  {n}")
    print("valid evidence by round:",
          dict(sorted(ages.items())))


if __name__ == "__main__":
    main()
