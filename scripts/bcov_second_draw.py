"""Second draw of a PREVIOUS round's bcov window, by exact name list.

The bcov rotation times a moving 39-query window of the never-timed
set; a single draw is coverage, not an anchor. Cross-round comparison
needs a SECOND draw of the same names on the next round's tree
(BCOV_r13.json did this for the r12 offset-0 window). Registry growth
shifts the alphabetical offsets (r14: paragraph_near_dup displaced
pk_get_by_ids inside the 39..78 span), so this runner replays the
window by the NAME LIST recorded in a prior detail file instead of by
offset arithmetic.

Usage:
    python scripts/bcov_second_draw.py [detail_json] [sf_dir]

Reads ``bcov_queries`` keys from detail_json (default the sealed
BENCH_DETAIL.json) and replays exactly those queries through
``bench.run_segment_mode`` in this fresh session — the SAME code path
and one-line JSON contract as ``bench.py --segment bcov``, so contract
changes there (new canary fields, timing discipline) reach second
draws automatically.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    detail_path = (
        sys.argv[1] if len(sys.argv) > 1 else "/root/repo/BENCH_DETAIL.json"
    )
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    names = list(json.load(open(detail_path)).get("bcov_queries", {}))
    if not names:
        print(f"no bcov_queries in {detail_path}", file=sys.stderr)
        sys.exit(2)

    import bench

    bench.run_segment_mode("bcov", sf_dir, bench._parse_sf(sf_dir), names)


if __name__ == "__main__":
    main()
