#!/usr/bin/env python3
"""Report an AmplifyProbe artifact (target/amplify.json / AMPLIFY_r{N}.json).

The artifact interleaves loaded conditions with quiet brackets
(quiet1, cpu, quiet2, membw, quiet3, gcchurn, quiet4). Same-session JVM
warming is monotone and large enough (8-19% quiet-to-quiet in the first
cuts) to masquerade as a load response, so each loaded condition's gate
medians are compared against the MEAN of its two bracketing quiets, and
each probe against the same bracket. A gate whose ratio tracks the CPU
probe's ratio is CPU-class; one that exceeds every probe's ratio under a
given arm is bound by that arm's resource.

Usage: python3 scripts/amplify_report.py [path (default target/amplify.json)]
"""
import json
import statistics as st
import sys


def main():
    path = sys.argv[1] if len(sys.argv) > 1 else "target/amplify.json"
    d = json.load(open(path))
    conds = d["conditions"]
    names = list(conds)
    gates = list(conds[names[0]]["gates"])

    def med(cond, gate):
        return st.median(conds[cond]["gates"][gate])

    print(f"{path}: sf={d['sf']} stressors={d['stressor_threads']} "
          f"spark_cpus={d['spark_cpus']} samples={d['samples_per_gate']}")

    loaded = [(i, c) for i, c in enumerate(names) if not c.startswith("quiet")]
    quiets = [c for c in names if c.startswith("quiet")]
    if len(quiets) >= 2:
        drift = []
        for g in gates:
            first, last = med(quiets[0], g), med(quiets[-1], g)
            drift.append(f"{g} {last / first:.2f}")
        print(f"quiet drift ({quiets[0]}->{quiets[-1]}): " + ", ".join(drift))

    for i, c in loaded:
        if (i == 0 or i == len(names) - 1
                or not names[i - 1].startswith("quiet")
                or not names[i + 1].startswith("quiet")):
            print(f"\n== {c}: not bracketed by quiet conditions "
                  f"(artifact order: {', '.join(names)}) — skipped; the "
                  f"bracket comparison needs quiet/<loaded>/quiet ==")
            continue
        lo, hi = names[i - 1], names[i + 1]
        pb = (conds[lo]["probe_cpu_sec"] + conds[hi]["probe_cpu_sec"]) / 2
        mb = (conds[lo]["probe_membw_sec"] + conds[hi]["probe_membw_sec"]) / 2
        pr = conds[c]["probe_cpu_sec"] / pb if pb else float("nan")
        mr = conds[c]["probe_membw_sec"] / mb if mb else float("nan")
        print(f"\n== {c} (bracket {lo}/{hi}) — probe_cpu x{pr:.2f}  "
              f"probe_membw x{mr:.2f} ==")
        for g in gates:
            base = (med(lo, g) + med(hi, g)) / 2
            r = med(c, g) / base if base else float("nan")
            flag = "  <-- exceeds both probes" if r > max(pr, mr) + 0.05 else ""
            print(f"  {g:30s} x{r:.2f}  ({med(c, g):.3f}s vs bracket "
                  f"{base:.3f}s){flag}")


if __name__ == "__main__":
    main()
