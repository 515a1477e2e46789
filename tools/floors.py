#!/usr/bin/env python3
"""Per-entry bench floors: build them from recorded sweeps, gate on them.

The repo's perf regression rule (BASELINE.md) is "no entry above 1.5x
its protocol-era floor without a written cause". Until now the floors
lived in prose and the comparison was manual; this makes both
mechanical:

  # extend/refresh floors from one or more sf0.1 bench JSONs
  python3 tools/floors.py --update BENCH_FLOORS.json BENCH_LATEST.json ...

  # gate: every entry in the sweep must be <= factor * floor
  python3 tools/floors.py --check BENCH_FLOORS.json BENCH_LATEST.json

Floors only ever DECREASE (min over history), so a noisy slow sweep can
never relax the gate; entries without a floor yet (first sweep after
they land) are reported and adopted on the next --update. Only sf0.1
sweeps are accepted — a decade-replica run (or a sweep that does not
declare its scale at all) would poison every floor. --check also fails
on floored entries MISSING from the sweep and on a non-empty `errors`
array: an entry that regressed into an error vanishes from `queries`,
which is the worst regression, not a pass.
"""
import json
import sys

# Entries measuring ONE-TIME setup work rather than a query plan: their
# absolute time depends on what a prior run left in the warehouse (a
# fingerprint-marker hit costs ~0s, a cold rebuild 16-25s), so a floor
# recorded on a warm run would flag every cold run. Reported, never
# failed.
EXEMPT = {"g0_medallion_build"}


def load(path):
    with open(path) as f:
        d = json.load(f)
    # Accept both spellings the drivers have used: a path ending in
    # "sf0.1" and the bare scale number 0.1 / "0.1". Anything else —
    # including a MISSING sf field — is refused: an undeclared scale
    # must never min() into the floors.
    sf = str(d.get("sf", "<missing>"))
    if not (sf.endswith("sf0.1") or sf == "0.1"):
        raise SystemExit(f"{path}: sf={sf!r} is not an sf0.1 sweep — refusing")
    qs = d.get("queries", {})
    if not qs:
        raise SystemExit(f"{path}: no queries section")
    return qs, d.get("errors", [])


def main(argv):
    if len(argv) < 3 or argv[0] not in ("--update", "--check"):
        print(__doc__)
        return 2
    mode, floors_path, bench_paths = argv[0], argv[1], argv[2:]
    factor = 1.5
    if "--factor" in bench_paths:
        i = bench_paths.index("--factor")
        if i + 1 >= len(bench_paths):
            print("--factor needs a value\n" + __doc__)
            return 2
        try:
            factor = float(bench_paths[i + 1])
        except ValueError:
            print(f"--factor value {bench_paths[i + 1]!r} is not a number")
            return 2
        bench_paths = bench_paths[:i] + bench_paths[i + 2:]
    try:
        with open(floors_path) as f:
            floors = json.load(f)
    except FileNotFoundError:
        floors = {}

    if mode == "--update":
        added, lowered, suspect = 0, 0, 0
        for p in bench_paths:
            qs, _ = load(p)
            for name, sec in qs.items():
                if name not in floors:
                    floors[name] = sec
                    added += 1
                elif sec < floors[name] / 3:
                    # A reading BELOW A THIRD of an established floor is
                    # a freak minimum (cache/tenancy fluke), not a plan
                    # improvement — adopting it would flag every later
                    # NORMAL run (the r14 g6 incident: one 0.10 s read
                    # against a four-round 0.75 s floor). Report, don't
                    # adopt; a real 3x plan win re-measures consistently
                    # and can be adopted by hand with its adjudication.
                    suspect += 1
                    print(f"SUSPECT {name}: {sec:.2f}s is < floor/3 "
                          f"({floors[name]:.2f}s) — not adopted; if this "
                          "is a real plan win, re-measure and adopt by "
                          "hand with a BASELINE.md adjudication")
                elif sec < floors[name]:
                    floors[name] = sec
                    lowered += 1
        with open(floors_path, "w") as f:
            json.dump(dict(sorted(floors.items())), f, indent=1)
            f.write("\n")
        print(f"floors: {len(floors)} entries ({added} added, "
              f"{lowered} lowered, {suspect} suspect-skipped) "
              f"-> {floors_path}")
        return 0

    # --check
    rc = 0
    for p in bench_paths:
        qs, errors = load(p)
        bad, new, exempt_over, within = [], [], 0, 0
        for name, sec in qs.items():
            if name in EXEMPT:
                if name in floors and sec > factor * floors[name]:
                    exempt_over += 1
                    print(f"note {name}: {sec:.2f}s over floor but exempt "
                          f"(one-time setup cost)")
            elif name not in floors:
                new.append(name)
            elif sec > factor * floors[name]:
                bad.append((name, sec, floors[name]))
            else:
                within += 1
        # An EXEMPT entry is exempt from the FLOOR rule, not from
        # existing: one that vanishes from `queries` (renamed, or
        # regressed into an error a driver failed to record) must still
        # flag — compute `gone` over ALL floored entries.
        gone = sorted(set(floors) - set(qs))
        for name, sec, fl in sorted(bad, key=lambda x: -x[1] / x[2]):
            print(f"FAIL {name}: {sec:.2f}s > {factor}x floor {fl:.2f}s "
                  f"({sec / fl:.2f}x)")
            rc = 1
        for name in gone:
            print(f"GONE {name}: has a floor but is missing from the sweep "
                  f"(renamed, or regressed into an error)")
            rc = 1
        if errors:
            print(f"FAIL {p}: sweep reports errors: {errors}")
            rc = 1
        for name in sorted(new):
            print(f"NEW  {name}: no floor yet (adopt with --update)")
        print(f"{p}: {len(bad)} over-floor, {len(gone)} gone, "
              f"{len(new)} new, {exempt_over} exempt-over, {within} within "
              f"{factor}x")
    return rc


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
