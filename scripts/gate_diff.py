#!/usr/bin/env python3
"""Reconcile the LOCAL oracle gate against the DRIVER's (r14 verdict
item 4): a query green locally and red at the driver is RED — the
driver's gate is the hard signal, and round-close counts must state
driver numbers, never local ones, wherever a driver artifact exists.

Usage: gate_diff.py CORRECTNESS_local_rN.json CORRECTNESS_rN.json
The first argument MUST be the local gate (scripts/oracle_check.py
summary, entries {"status": s, "rows": N}); the second MUST be the
driver artifact (entries with rows_match/schema_match/hash_match
booleans). Each entry is decoded by its file's format — never sniffed —
and an entry that doesn't match its file's expected shape is a hard
error, not a silent fall-through (r15 ADVICE).

Exit 1 if any query differs in status between the two gates or is
present in only one of them.
"""
import json
import sys


def local_status(name, entry):
    if not isinstance(entry, dict) or "status" not in entry:
        raise SystemExit(
            "malformed LOCAL gate entry %r: %r — expected oracle_check.py "
            "summary with a 'status' key (were the arguments swapped?)"
            % (name, entry))
    s = entry["status"]
    if s == "ok":
        return "green"
    if s.startswith("skip"):
        return "rows_only"
    return "RED(%s)" % s


def driver_status(name, entry):
    if not isinstance(entry, dict) or not (
            "err" in entry or "hash_match" in entry):
        raise SystemExit(
            "malformed DRIVER gate entry %r: %r — expected per-check "
            "booleans (rows_match/schema_match/hash_match) or err "
            "(were the arguments swapped?)" % (name, entry))
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
    if isinstance(d, dict):
        inner = d.get("queries", d)
        if isinstance(inner, dict):
            return inner
    raise SystemExit(
        "unexpected gate artifact shape in %s: top-level %s — expected "
        "an object of {query_name: entry}" % (path, type(d).__name__))


def main(local_path, driver_path):
    local, driver = load(local_path), load(driver_path)
    if not driver:
        print("driver gate artifact is EMPTY — nothing to reconcile; "
              "local gate remains the only signal this round")
        return 0
    bad = []
    for name in sorted(set(local) | set(driver)):
        ls = local_status(name, local[name]) if name in local else "MISSING"
        ds = driver_status(name, driver[name]) if name in driver else "MISSING"
        if ls != ds:
            bad.append((name, ls, ds))
            print("DIVERGED %-28s local=%s driver=%s" % (name, ls, ds))
    statuses = {n: driver_status(n, driver[n]) for n in driver}
    greens = sum(1 for s in statuses.values() if s == "green")
    rows_only = sum(1 for s in statuses.values() if s == "rows_only")
    print("driver gate: %d queries, %d green, %d rows-only, %d red"
          % (len(driver), greens, rows_only, len(driver) - greens - rows_only))
    if bad:
        print("RECONCILE: %d divergent entries — driver status wins; "
              "treat local-green/driver-red as FAIL" % len(bad))
        return 1
    print("GATES AGREE")
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
