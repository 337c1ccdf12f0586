#!/usr/bin/env python3
"""Differential fixture for interval condensation: call the
REFERENCE's condense_locations (interpro/oracle/matches.py:60-103,
imported read-only) on random multi-fragment location lists and dump
(input, expected spans) pairs for IntervalsSpec's differential test.

Usage: python3 tools/gen_condense_fixture.py > src/test/resources/condense_fixture.json
"""
import json
import random
import sys

sys.path.insert(0, "tools")
from gen_matchmerge_fixture import load_reference_matches  # noqa: E402


def main():
    m, _ = load_reference_matches()
    rng = random.Random(424242)
    cases = []
    for _ in range(360):
        n_locs = rng.randint(1, 12)
        locations = []
        for _ in range(n_locs):
            n_frags = 1 if rng.random() < 0.7 else rng.randint(2, 4)
            frags = []
            pos = rng.randint(1, 400)
            for _ in range(n_frags):
                start = pos + rng.randint(0, 30)
                end = start + rng.randint(0, 120)
                frags.append({"start": start, "end": end})
                pos = start + rng.randint(1, 40)
            # fragments sorted by (start, end) — the reference's input
            # contract (it assumes sorted fragments per location)
            frags.sort(key=lambda f: (f["start"], f["end"]))
            locations.append(frags)
        expected = m.condense_locations(locations)
        cases.append({
            "locations": [[[f["start"], f["end"]] for f in loc]
                          for loc in locations],
            "expected": [[s, e] for s, e in expected],
        })
    json.dump({"cases": cases}, sys.stdout, indent=1)


if __name__ == "__main__":
    main()
