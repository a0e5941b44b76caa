"""Record driver-verified queries after a round's CORRECTNESS file lands.

Usage (from the repo root, IMMEDIATELY after a round — i.e. before any
query's source or oracle is edited, so the current digest still describes
the code the driver actually ran):

    python scripts/record_verified.py <round>

Reads ``CORRECTNESS_r{round}.json``, and for every green row (no error,
rows + schema + hash all matching; rows-only checks have null hash) stores
``{"digest": spec_digest(spec), "round": round}`` in
``rclabsapi_spark/verified.json``. Existing records for other queries are
kept as-is — their digests were computed when *their* green rows landed,
so a later edit to one of those queries still auto-invalidates it.
Records for queries no longer in the registry are dropped.

``get_registry`` orders the registry by (invalid-or-missing record first,
then oldest round), which is exactly the driver's verification priority.
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from rclabsapi_spark.registry import (  # noqa: E402
    _VERIFIED_PATH,
    get_registry,
    spec_digest,
)


def is_green(row: dict) -> bool:
    return (
        row.get("err") is None
        and row.get("rows_match") is True
        and row.get("schema_match") is not False
        and row.get("hash_match") is not False
    )


def restamp() -> None:
    """Recompute every existing ledger digest under the *current*
    ``spec_digest`` algorithm, keeping evidence rounds. ONLY valid when
    the ledger is zero-stale and no query/operator source has changed
    since the evidence landed — i.e. immediately after a digest-algorithm
    change, before any code edit. Anything else would launder staleness."""
    reg = get_registry()
    verified = json.loads(_VERIFIED_PATH.read_text())
    for name, rec in verified.items():
        if name in reg:
            rec["digest"] = spec_digest(reg[name])
    _VERIFIED_PATH.write_text(
        json.dumps(verified, indent=1, sort_keys=True) + "\n"
    )
    print(f"restamped {len(verified)} records under current digest algorithm")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("round", nargs="?", type=int)
    ap.add_argument("--restamp", action="store_true")
    args = ap.parse_args()

    if args.restamp:
        restamp()
        return
    if args.round is None:
        ap.error("round is required unless --restamp")

    reg = get_registry()
    rows = json.loads(
        Path(f"CORRECTNESS_r{args.round:02d}.json").read_text()
    )
    verified = (
        json.loads(_VERIFIED_PATH.read_text())
        if _VERIFIED_PATH.exists()
        else {}
    )

    updated = 0
    for name, row in rows.items():
        if name in reg and is_green(row):
            verified[name] = {
                "digest": spec_digest(reg[name]),
                "round": args.round,
            }
            updated += 1
    verified = {k: v for k, v in verified.items() if k in reg}

    _VERIFIED_PATH.write_text(
        json.dumps(verified, indent=1, sort_keys=True) + "\n"
    )
    print(f"recorded {updated} green rows; {len(verified)} total verified")


if __name__ == "__main__":
    main()
