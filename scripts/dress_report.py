#!/usr/bin/env python3
"""Render a graft.Bench JSON line as a BASELINE.md close-out paragraph
skeleton (scripts/dress.sh pipes into this). The paragraph quotes the
RUN'S OWN fields — kept rounds, canary triple, medians, every flag list,
and the per-key recheck verdicts with their io_bound/window_dirty bits —
so the committed prose can never drift from the artifact it describes
(the round-13 close-out gap)."""
import json
import sys


def fmt_flags(d):
    if not d:
        return "{}"
    return "{" + ", ".join(f"{k}: {v:.2f}" for k, v in
                           sorted(d.items(), key=lambda kv: -kv[1])) + "}"


def main():
    with open(sys.argv[1]) as f:
        d = json.loads(f.read())
    vs = d.get("vs_floor") or {}
    rounds = d.get("rounds") or []
    kept = [r for r in rounds if r.get("kept")]
    kept_worst = max((max(r["pre"], r["post"]) for r in kept), default=None)
    n = len(d.get("queries") or {})
    lines = []
    lines.append(f"{n} queries at {d.get('sf')}, "
                 f"kept-{len(kept)}-of-{len(rounds)}"
                 + (f", worst kept CPU bracket {kept_worst:.3f} s"
                    if kept_worst is not None else "")
                 + f", canary_ratio {d.get('canary_ratio')}, "
                 f"io {d.get('io_ratio')}, sched {d.get('sched_ratio')}: "
                 f"total {d.get('value', 0):.1f} s, "
                 f"raw vs-floor median {vs.get('median_ratio')}, "
                 f"normalized {vs.get('median_ratio_normalized')}, "
                 f"aging {d.get('aging_ratio')}.")
    lines.append(f"flagged (raw >2x): {fmt_flags(vs.get('flagged'))}; "
                 f"flagged_normalized: {fmt_flags(vs.get('flagged_normalized'))}; "
                 f"flagged_sched_adjusted: "
                 f"{fmt_flags(vs.get('flagged_sched_adjusted'))}.")
    for cname, c in sorted((vs.get("floor_classes") or {}).items()):
        rs = c.get("ratios") or {}
        lo = min(rs.values(), default=None)
        hi = max(rs.values(), default=None)
        lines.append(f"floor class {cname} (tolerance {c.get('tolerance')}x): "
                     f"{len(rs)} keys at {lo}-{hi}, "
                     f"class flags {fmt_flags(c.get('flagged'))}.")
    rc = vs.get("flagged_recheck")
    if rc:
        atts = rc.get("attempts") or []
        clean_at = next((i + 1 for i, a in enumerate(atts) if a.get("clean")),
                        None)
        lines.append(
            f"isolated recheck: {len(atts)} attempt(s)"
            + (f", clean at attempt {clean_at}" if clean_at
               else ", NO clean attempt (all numbers window_dirty)")
            + f"; last brackets cpu {rc.get('canary_pre')}/{rc.get('canary_post')}"
              f", io {rc.get('io_pre')}/{rc.get('io_post')}.")
        for k, q in sorted((rc.get("queries") or {}).items()):
            lines.append(
                f"  {k}: {q.get('sec')} s = {q.get('ratio')}x floor, "
                f"io_bound={q.get('io_bound')}, "
                f"window_dirty={q.get('window_dirty')} -> "
                + ("UNRULED (needs a cleaner window or a mechanism diagnosis)"
                   if q.get("window_dirty") else
                   ("cleared environmental" if (q.get("ratio") or 99) < 2.0
                    else "CONFIRMED in a clean window — diagnose before re-flooring")))
    else:
        lines.append("isolated recheck: not triggered (zero surviving flags).")
    if d.get("aging_exceeded"):
        lines.append(f"AGING EXCEEDED: {d.get('aging_ratio')} > "
                     f"{d.get('aging_threshold')} — investigate before "
                     "trusting the medians.")
    print("## <Round-N> close-out full-suite dress (script-generated)")
    print()
    for ln in lines:
        print(ln)


if __name__ == "__main__":
    main()
