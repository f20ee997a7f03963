#!/usr/bin/env python3
"""Compare two bench DETAIL artifacts (BENCH_r{N}_builder.json /
BENCH_r{N}_driver.json / target/bench_runs_latest.json) the way the
round review does by hand: totals and normalized totals, probe classes,
per-query median-ratio distribution over the shared gates, the biggest
movers in both directions, and the setup-ledger diff.

Raw totals from unequal ambient windows are NOT comparable — the
median-ratio distribution over shared gates vs the probe-factor ratio is
the honest signal (a median ratio ~= the probe ratio means the code is
flat and the window moved). Official BENCH_r{N}.json files carry only a
truncated stdout tail, not per-query data; point this at the detail
files.

Usage: bench_compare.py OLD.json NEW.json [--top K]
"""
import argparse
import json
import statistics
import sys


def load(path):
    with open(path) as f:
        d = json.load(f)
    if "per_query" not in d:
        sys.exit(
            f"{path}: no per_query map — this looks like an official "
            "BENCH_r{N}.json (truncated tail only); use the _builder/_driver "
            "detail artifact instead")
    return d


def med(d, name):
    return d["per_query"][name]["med"]


ANCHOR_REF_CPU = 1.175   # Bench.AnchorProbeCpuSec — see BASELINE.md
ANCHOR_REF_IO = 0.205    # Bench.AnchorProbeIoSec — tmpfs class ONLY


def computed_anchor(d, probe_key, ref):
    """Recompute an anchored total exactly the way Bench does (per-run,
    per-sample scaling, then per-gate medians) so pre-field artifacts get
    the same number a native emission would have produced. Returns None
    when the probes are absent or, for the I/O arm, not tmpfs-class."""
    probes = [p for p in d.get(probe_key, [])]
    if not probes:
        return None
    if probe_key == "probe_io_sec" and any(p <= 0 or p >= 0.35 for p in probes):
        return None  # not the reference medium — anchoring would be nonsense
    factors = [p / ref if p > 0 else 1.0 for p in probes]
    total = 0.0
    for sect in ("per_query", "setup"):
        for rec in d.get(sect, {}).values():
            scaled = [s / f for s, f in zip(rec["samples"], factors)]
            if scaled:
                total += statistics.median(scaled)
    return total


def anchor_pair(d):
    """(cpu-anchored, io-anchored-or-None): native fields when present,
    recomputed from samples+probes otherwise."""
    cpu = d.get("total_anchor",
                computed_anchor(d, "probe_sec", ANCHOR_REF_CPU))
    io = d.get("total_anchor_io")
    if io is None or io < 0:
        io = computed_anchor(d, "probe_io_sec", ANCHOR_REF_IO)
    return cpu, io


def fmt_probes(d):
    cpu = d.get("probe_sec", [])
    io = d.get("probe_io_sec", [])
    return f"cpu={cpu} io={io}"


def positive_int(s):
    v = int(s)
    if v <= 0:
        raise argparse.ArgumentTypeError("must be a positive integer")
    return v


def main():
    ap = argparse.ArgumentParser(
        description=__doc__,
        formatter_class=argparse.RawDescriptionHelpFormatter)
    ap.add_argument("old", help="older bench detail artifact")
    ap.add_argument("new", help="newer bench detail artifact")
    ap.add_argument("--top", type=positive_int, default=5,
                    help="movers to show per direction (default 5)")
    ns = ap.parse_args()
    top = ns.top
    old, new = load(ns.old), load(ns.new)

    print(f"== totals ==")
    # total_anchor pair (r11): per-query medians with every sample scaled
    # to the RECORDED quiet-class reference probes (BASELINE.md). The CPU
    # anchor is medium-independent; the IO anchor is valid tmpfs-to-tmpfs
    # only. Compare rounds on the arm whose probe ratio the per-query
    # median ratio tracks; recomputed from samples for pre-field artifacts.
    for label, d in (("old", old), ("new", new)):
        cpu_a, io_a = anchor_pair(d)
        anchor = (f"anchor {cpu_a:.1f}" if cpu_a is not None else "anchor -")
        anchor += (f" / io {io_a:.1f}  " if io_a is not None
                   else " / io - (non-tmpfs or unprobed)  ")
        print(f"  {label}: total_med {d['total_med']:.1f}  "
              f"norm {d['total_norm']:.1f}  norm_lb {d['total_norm_lb']:.1f}  "
              f"{anchor}"
              f"gates {len(d['per_query'])}  "
              f"inflated {d['ambient_inflated']}  "
              f"attempts {d.get('runs_attempted', '?')}  "
              f"written {d.get('written_utc', '(pre-r10 artifact)')}")
        print(f"       probes {fmt_probes(d)}")
    oc, oi = anchor_pair(old)
    nc, ni = anchor_pair(new)
    if oc and nc:
        io_part = (f"  io-anchored {ni / oi:.3f}" if oi and ni else "")
        print(f"  anchored ratio (new/old): cpu-anchored {nc / oc:.3f}"
              f"{io_part} — window-class-independent; compare the arm the "
              f"median ratio tracks")

    shared = sorted(set(old["per_query"]) & set(new["per_query"]))
    only_old = sorted(set(old["per_query"]) - set(new["per_query"]))
    only_new = sorted(set(new["per_query"]) - set(old["per_query"]))
    if not shared:
        sys.exit("no shared gates between the two artifacts — one of them "
                 "is likely a filtered SPARK_GRAFT_ONLY probe run "
                 f"(old has {len(only_old)}, new has {len(only_new)} gates)")
    ratios = sorted(med(new, n) / med(old, n) for n in shared)
    n = len(ratios)
    print(f"\n== per-query median ratios (new/old, {n} shared gates) ==")
    print(f"  median {statistics.median(ratios):.3f}  "
          f"p25 {ratios[n // 4]:.3f}  p75 {ratios[3 * n // 4]:.3f}")
    # the window-class anchor: min-probe ratio per arm
    for arm in ("probe_sec", "probe_io_sec"):
        po = [p for p in old.get(arm, []) if p > 0]
        pn = [p for p in new.get(arm, []) if p > 0]
        if po and pn:
            print(f"  min-{arm} ratio {min(pn) / min(po):.3f} "
                  f"(median ratio near this => window moved, not code)")
    if only_old:
        print(f"  gates only in old: {only_old}")
    if only_new:
        print(f"  gates only in new: "
              f"{[(g, round(med(new, g), 2)) for g in only_new]}")

    movers = sorted(shared, key=lambda g: med(new, g) - med(old, g))
    improved = [g for g in movers if med(new, g) < med(old, g)]
    regressed = [g for g in movers if med(new, g) > med(old, g)]
    print(f"\n== biggest movers (absolute seconds; "
          f"{len(improved)} down, {len(regressed)} up) ==")
    for g in improved[:top]:
        print(f"  improved  {g}: {med(old, g):.2f} -> {med(new, g):.2f}")
    for g in regressed[-top:]:
        print(f"  regressed {g}: {med(old, g):.2f} -> {med(new, g):.2f}")

    so = {k: v["med"] for k, v in old.get("setup", {}).items()}
    sn = {k: v["med"] for k, v in new.get("setup", {}).items()}
    if so or sn:
        print(f"\n== setup ledger (med) ==")
        for k in sorted(set(so) | set(sn)):
            o = f"{so[k]:.2f}" if k in so else "-"
            w = f"{sn[k]:.2f}" if k in sn else "-"
            print(f"  {k}: {o} -> {w}")
        print(f"  setup totals: {sum(so.values()):.1f} -> {sum(sn.values()):.1f} "
              f"(included in total_med on both sides)")


if __name__ == "__main__":
    main()
