#!/usr/bin/env python3
"""Mechanized read of a SCALE_STRESS artifact (committed so every round
recomputes the exponents the same way instead of by hand, like
crosscheck.py does for correctness and bench_compare.py for bench).

For each gate it recomputes the top-decade exponent — the log-log slope
between the two largest factors it was timed at — from the first-sample
rows, then applies the triage verdicts the run recorded:

  * a `resample_gate` verdict (hi-point re-measure) replaces the gate's
    exponent with its verdict exponent — `exp_med` (median of three, the
    borderline rule) when present, else `exp_min`;
  * a `resample_lo_gate` verdict alone (lo re-measure that did NOT push
    the pair over the line, so no hi confirm followed) replaces it with
    `exp_lo_min` — the conservative lo-min-combined value.

Prints every gate's raw and final exponent, the plan-audit sweep rows,
and the resample memo ledger (dropped − rebuilt = residual builds the
plan sweep paid; its sec is inflated by exactly those). Exits nonzero if
any FINAL exponent crosses the sublinearity line (0.75, ScaleStress
.ExpLine) or any sweep reports offenders.

Usage:
    python3 scripts/scale_report.py SCALE_STRESS_r12.json [more.json ...]

Artifacts that wrap the rows in a dict (e.g. SCALE_STRESS_r11_head.json's
`full_rerun`) are handled by reading every top-level list of row dicts.

Driver-side tooling (python3 only), not part of the Spark library.
"""
import json
import math
import sys

EXP_LINE = 0.75  # ScaleStress.ExpLine


def row_lists(doc):
    if isinstance(doc, list):
        yield doc
        return
    for v in doc.values():
        if isinstance(v, list) and v and isinstance(v[0], dict):
            yield v


def report(path: str) -> int:
    with open(path) as f:
        doc = json.load(f)
    failures = 0
    # accumulate across ALL top-level row lists before judging (ADVICE r12
    # #3): a dict-wrapped artifact may store timed rows and triage verdicts
    # in different lists — per-list scoping would silently drop the
    # verdicts and false-flag a triaged transient as ABOVE LINE
    firsts = {}   # (family, gate) -> {factor: sec}
    verdicts = {} # (family, gate) -> final exponent + provenance
    ledger = []
    sweeps = []
    dropped_rows = []
    for rows in row_lists(doc):
        for r in rows:
            if not isinstance(r, dict):
                continue
            fam = r.get("family", "docs")
            if "plan_audit_factor" in r:
                sweeps.append(r)
            elif "triage_dropped" in r:
                dropped_rows.append(r)
            elif "resample_gate" in r:
                key = (fam, r["resample_gate"])
                exp = r.get("exp_med", r.get("exp_min"))
                verdicts[key] = (exp, "hi-med" if "exp_med" in r else "hi-min")
            elif "resample_lo_gate" in r:
                key = (fam, r["resample_lo_gate"])
                # a hi verdict (confirm path) overrides this one: the hi
                # branch above assigns unconditionally, this one only
                # fills an absent key — correct in either row order
                if key not in verdicts:
                    verdicts[key] = (r["exp_lo_min"], "lo-min")
            elif "gate" in r and r.get("resample"):
                ledger.append(r)
            elif "gate" in r:
                firsts.setdefault((fam, r["gate"]), {})[r["factor"]] = r["sec"]
    if firsts:
        print(f"== {path}: {len(firsts)} gates with timed rows ==")
        n_pairs = 0
        for (fam, g), by_f in sorted(firsts.items()):
            fs = sorted(by_f)
            if len(fs) < 2:
                continue
            f_lo, f_hi = fs[-2], fs[-1]
            # guard BOTH samples: a zero hi would crash math.log where the
            # Scala side tolerates it as -Infinity (ADVICE r12 #4)
            if by_f[f_lo] <= 0 or by_f[f_hi] <= 0:
                continue
            n_pairs += 1
            raw = math.log(by_f[f_hi] / by_f[f_lo]) / math.log(f_hi / f_lo)
            final, how = verdicts.get((fam, g), (raw, "raw"))
            flag = "  <-- ABOVE LINE" if final > EXP_LINE else ""
            if final > EXP_LINE:
                failures += 1
            mark = "" if how == "raw" else f"  (raw {raw:5.2f}, triaged {how})"
            print(f"  {final:5.2f}  {g} [{fam}] x{f_lo}->x{f_hi}{mark}{flag}")
        print(f"  -- {n_pairs} top-decade pairs, line {EXP_LINE}")
        for r in dropped_rows:
            gates = r.get("triage_dropped", [])
            desc = ", ".join(f"{d['gate']} ({d['reason']})" for d in gates) or "none"
            print(f"  triage dropped [{r.get('family','?')}]: {desc}")
        for r in ledger:
            dropped, rebuilt = r.get("memos_dropped", 0), r.get("memos_rebuilt", 0)
            print(f"  resample {r['gate']} x{r['factor']}: {r['sec']:.2f}s, "
                  f"memos dropped {dropped} rebuilt {rebuilt} residual {dropped - rebuilt}")
        for s in sweeps:
            off = s.get("offenders", [])
            if off:
                failures += 1
            print(f"  plan sweep x{s['plan_audit_factor']} [{s.get('family','?')}]: "
                  f"{s.get('gates_swept','?')} gates, {len(off)} offenders, {s['sec']:.1f}s"
                  + ("  <-- OFFENDERS: " + "; ".join(off) if off else ""))
    return failures


def main():
    if len(sys.argv) < 2:
        print(__doc__)
        sys.exit(2)
    failures = 0
    for path in sys.argv[1:]:
        failures += report(path)
    if failures:
        print(f"FAILED: {failures} above-line exponent(s) / offender sweep(s)")
        sys.exit(1)
    print("ALL SUBLINEAR, sweeps clean")


if __name__ == "__main__":
    main()
