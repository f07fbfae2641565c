"""Driver-sample rotation guard: the driver checks the FIRST ~50 registry
entries each round, and the registry order is now DERIVED from the
committed CORRECTNESS_r*.json records (never-driver-green first, then
stalest-green-first) instead of a hand-kept list. This test re-derives
the expected order from the raw JSON independently and asserts the
registry follows it — so the 50-entry driver sample provably consists of
the entries most in need of a fresh driver verification.
"""

import glob
import json
import os
import re

import __spark_entry__ as entry_mod

REPO = os.path.dirname(os.path.abspath(entry_mod.__file__))


def _latest_green() -> dict[str, int]:
    latest: dict[str, int] = {}
    for path in sorted(glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json"))):
        rnd = int(re.search(r"r(\d+)", os.path.basename(path)).group(1))
        with open(path) as f:
            rec = json.load(f)
        for name, row in rec.items():
            if (isinstance(row, dict) and row.get("rows_match")
                    and row.get("schema_match") and row.get("hash_match")):
                latest[name] = max(latest.get(name, 0), rnd)
    return latest


def test_registry_front_loads_never_green_then_stalest():
    names = list(entry_mod.queries())
    green = _latest_green()
    rounds = [green.get(n, -1) for n in names]
    # never-green entries (round -1) all precede any green entry, and
    # green entries appear oldest-round-first: the whole sequence is
    # non-decreasing in last-green round
    assert rounds == sorted(rounds), (
        "registry order must be non-decreasing in last-driver-green round; "
        f"first violation near {[n for n, a, b in zip(names, rounds, sorted(rounds)) if a != b][:5]}")


def test_driver_sample_is_the_neediest_50():
    names = list(entry_mod.queries())
    green = _latest_green()
    sample = set(names[:50])
    never = {n for n in names if n not in green}
    assert never <= sample, f"never-green entries outside sample: {never - sample}"
    # every green entry inside the sample is at least as stale as every
    # green entry outside it
    in_rounds = [green[n] for n in names[:50] if n in green]
    out_rounds = [green[n] for n in names[50:] if n in green]
    if in_rounds and out_rounds:
        assert max(in_rounds) <= min(out_rounds)
