#!/usr/bin/env python3
"""Reconcile the LOCAL oracle gate against the DRIVER's (r14 verdict
item 4): a query green locally and red at the driver is RED — the
driver's gate is the hard signal, and round-close counts must state
driver numbers, never local ones, wherever a driver artifact exists.

Usage: gate_diff.py CORRECTNESS_local_rN.json CORRECTNESS_rN.json
Exit 1 if any query differs in (rows/schema/hash) status between the
two gates or is present in only one of them.
"""
import json
import sys


def status(entry):
    # local format (scripts/oracle_check.py): {"rows": N, "status": s}
    if "status" in entry:
        s = entry["status"]
        if s == "ok":
            return "green"
        if s.startswith("skip"):
            return "rows_only"
        return "RED(%s)" % s
    # driver format: per-check booleans + err
    if entry.get("err") == "no_oracle":
        return "rows_only"
    ok = all(entry.get(k) is True
             for k in ("rows_match", "schema_match", "hash_match"))
    return "green" if ok else "RED(%s)" % ",".join(
        k for k in ("rows_match", "schema_match", "hash_match")
        if entry.get(k) is not True)


def load(path):
    with open(path) as f:
        d = json.load(f)
    # summaries are either {name: entry} or {"queries": {name: entry}}
    return d.get("queries", d) if isinstance(d, dict) else d


def main(local_path, driver_path):
    local, driver = load(local_path), load(driver_path)
    if not driver:
        print("driver gate artifact is EMPTY — nothing to reconcile; "
              "local gate remains the only signal this round")
        return 0
    bad = []
    for name in sorted(set(local) | set(driver)):
        ls = status(local[name]) if name in local else "MISSING"
        ds = status(driver[name]) if name in driver else "MISSING"
        if ls != ds:
            bad.append((name, ls, ds))
            print("DIVERGED %-28s local=%s driver=%s" % (name, ls, ds))
    greens = sum(1 for n in driver if status(driver[n]) == "green")
    print("driver gate: %d queries, %d green, %d rows-only, %d red"
          % (len(driver), greens,
             sum(1 for n in driver if status(driver[n]) == "rows_only"),
             len(driver) - greens
             - sum(1 for n in driver if status(driver[n]) == "rows_only")))
    if bad:
        print("RECONCILE: %d divergent entries — driver status wins; "
              "treat local-green/driver-red as FAIL" % len(bad))
        return 1
    print("GATES AGREE")
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
