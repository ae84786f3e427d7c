"""Freshness-rotation helper: recompute the deterministic correctness
window from the CORRECTNESS_r*.json ledger and diff it against
``suite.PRIORITY``.

The driver checks the FIRST 50 registry entries each round, so the
front of the registry rotates by the rule: 2 fixed anchors
(q1_pricing_summary, cdc_replay_summary), then every other registered
query ordered by (latest green driver round, name) ascending — a query
never driver-checked sorts as round 0 and leads. This script is the
single source of truth for "what should PRIORITY be":

    python scripts/rotation_check.py            # check current PRIORITY
    python scripts/rotation_check.py --next     # window AFTER the staged
                                                # one goes green (staging
                                                # comment material)

Exit 0 when PRIORITY matches the recomputed window, 1 otherwise (with
a readable diff). Run it at round start (catches a stale swap after the
driver lands CORRECTNESS_r{N}.json) and after any new @q registration
(new queries must LEAD the next window).
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

ANCHORS = ["q1_pricing_summary", "cdc_replay_summary"]
WINDOW = 50


def ledger() -> dict[str, int]:
    """Latest GREEN driver round per query (red/errored rows ignored —
    the rule keys on the most recent successful check)."""
    latest: dict[str, int] = {}
    for p in sorted(glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json"))):
        rnd = int(re.search(r"r(\d+)", os.path.basename(p)).group(1))
        for q, rec in json.load(open(p)).items():
            if (
                rec.get("rows_match")
                and rec.get("schema_match")
                and not rec.get("err")
            ):
                latest[q] = max(latest.get(q, 0), rnd)
    return latest


def expected_window(latest: dict[str, int], names: list[str]) -> list[str]:
    rest = sorted((latest.get(n, 0), n) for n in names if n not in ANCHORS)
    return ANCHORS + [n for _, n in rest][: WINDOW - len(ANCHORS)]


def main() -> None:
    from milvus_cdc_spark import suite

    names = list(suite.QUERIES)
    latest = ledger()
    if "--next" in sys.argv:
        # simulate the staged window going green at (max round + 1)
        nxt = max(latest.values(), default=0) + 1
        for n in suite.PRIORITY:
            if n in names:
                latest[n] = nxt
        want = expected_window(latest, names)
        print("window AFTER the staged one goes green:")
        for n in want:
            print(f"  {latest.get(n, 0):>2} {n}")
        return
    want = expected_window(latest, names)
    got = [n for n in suite.PRIORITY if n in names][:WINDOW]
    if got == want:
        print(
            f"PRIORITY matches the recomputed window ({len(want)} queries; "
            f"oldest non-anchor cohort r{latest.get(want[-1], 0)})"
        )
        return
    print("PRIORITY does NOT match the recomputed window:", file=sys.stderr)
    for i, (g, w) in enumerate(zip(got, want)):
        if g != w:
            print(f"  pos {i}: PRIORITY has {g!r}, ledger wants {w!r}",
                  file=sys.stderr)
    missing = [n for n in want if n not in got]
    extra = [n for n in got if n not in want]
    if missing:
        print(f"  ledger wants but PRIORITY lacks: {missing}", file=sys.stderr)
    if extra:
        print(f"  PRIORITY has but ledger rejects: {extra}", file=sys.stderr)
    sys.exit(1)


if __name__ == "__main__":
    main()
