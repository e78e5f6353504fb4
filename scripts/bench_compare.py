#!/usr/bin/env python3
"""Per-query bench audit: compare two Bench JSON lines and flag drift.

Usage: python3 scripts/bench_compare.py <baseline.json> <candidate.json> [ratio]

Reads the one-line {"metric":...,"queries":{...}} records Bench emits
(also accepts a file whose LAST such line is the record, e.g. a BENCH_r*.json
or a captured stdout), prints queries whose time changed by more than
`ratio` (default 2.0) in either direction, plus adds/removes and errors.
Exit code 1 if any query regressed beyond the ratio — so a round can
self-audit its record against the last calm table in SCALE.md before
shipping it.
"""
import json
import sys

# Documented per-query variance bands: queries whose wall time swings
# across SAME-DAY calm records with an UNCHANGED plan fingerprint (so
# the swing is scheduler/JIT environment, not a plan change). A
# candidate inside its band with the same fp is labeled known-variance
# and does not fail the audit; beyond the band max, or with a CHANGED
# fp, it flags like any other query. Bands come from SCALE.md variance
# notes — keep the two in sync.
#   dedup_semantic_cc: 1.5–2.8 s swing across r10–r11 calm records
#   (same fp each time; flagged by the judge two rounds running).
#   mm_video: 0.6–1.4 s swing (same fp; r12 full-suite sample 1.40 s
#   remeasured calm at 0.63–0.91 s with controls drifting identically).
#   sim_index_upsert: 0.83–2.00 s across five same-fp runs in one r12d
#   session (calm-window run landed the 2.00 s; the batch-bounded
#   upsert's wall is dominated by two small barrier stages that
#   magnify scheduler jitter).
#   stream_frontier: 0.32–0.90 s across calm/drifted windows of one r15
#   session (same fp byte-identical over four runs; three isolated
#   re-runs in the drifted window read 0.67–0.87 s with the q1_agg
#   control itself at 1.9x — the sim_index_upsert class: wall dominated
#   by small streaming barrier stages that amplify epoch drift).
KNOWN_VARIANCE_BAND_MAX = {
    "dedup_semantic_cc": 3.0, "mm_video": 1.5, "sim_index_upsert": 2.2,
    "stream_frontier": 1.0}


def load(path):
    lines = [l for l in open(path).read().splitlines()
             if l.startswith('{"metric"')]
    if not lines:
        # maybe the whole file is one JSON object
        return json.loads(open(path).read())
    if len(lines) > 1:
        # SCALE.md embeds SEVERAL records (headline + full-suite); picking
        # one silently would compare against the wrong baseline — make the
        # choice visible and identifiable by query count
        recs = [json.loads(l) for l in lines]
        print(f"note: {path} holds {len(lines)} records "
              f"({', '.join(str(len(r.get('queries', {}))) + 'q' for r in recs)}); "
              f"using the LAST — extract the intended line for a different one")
        return recs[-1]
    return json.loads(lines[-1])


def main():
    base, cand = load(sys.argv[1]), load(sys.argv[2])
    ratio = float(sys.argv[3]) if len(sys.argv) > 3 else 2.0
    bq, cq = base.get("queries", {}), cand.get("queries", {})
    bp, cp = base.get("plans", {}), cand.get("plans", {})

    def plan_label(q):
        # mechanical drift-vs-plan-change adjudication (r10 verdict item):
        # same fingerprint -> the physical plan did not move, the delta is
        # environmental; different -> the plan itself changed and the
        # delta is attributable to code/optimizer behavior
        b, c = bp.get(q), cp.get(q)
        if b is None or c is None:
            return "[no plan fp]"
        return "[same plan — VM noise?]" if b == c else f"[PLAN CHANGED {b} -> {c}]"

    # Broad-band drift normalization (r13, VERDICT r12 item 3): the host
    # reboots between sessions and each boot runs identical plans 25-40%
    # slower/faster UNIFORMLY (SCALE.md r12d); per-query 2x flags then
    # fire on population drift (r12's ta_bigrams: 0.51->1.14s with a
    # byte-identical fp while the whole short-query population moved
    # 1.5-1.9x). Control set = every common query whose plan fingerprint
    # is UNCHANGED; its median time-ratio is the population drift D.
    # Same-fp queries are flagged on their D-normalized ratio (a query
    # merely riding the epoch adjudicates automatically; one moving
    # beyond the population still flags). A CHANGED-fp query is judged
    # on its RAW ratio — a plan change is never excused by drift.
    same_fp = [q for q in set(bq) & set(cq)
               if bp.get(q) is not None and bp.get(q) == cp.get(q)
               and bq[q] > 0 and cq[q] > 0]
    drift = 1.0
    if len(same_fp) >= 10:  # too-small control sets can't estimate drift
        ratios = sorted(cq[q] / bq[q] for q in same_fp)
        drift = ratios[len(ratios) // 2]
        if abs(drift - 1.0) > 0.05:
            print(f"population drift x{drift:.2f} (median time-ratio over "
                  f"{len(same_fp)} same-fp queries) — same-fp flags are "
                  f"drift-normalized; changed-fp flags are raw")

    regressed = []
    for q in sorted(set(bq) & set(cq)):
        b, c = bq[q], cq[q]
        d = drift if bp.get(q) is not None and bp.get(q) == cp.get(q) else 1.0
        if b > 0 and c / (b * d) > ratio and c - b * d > 0.5:
            if (c <= KNOWN_VARIANCE_BAND_MAX.get(q, 0.0)
                    and bp.get(q) is not None and bp.get(q) == cp.get(q)):
                print(f"known-var {q}: {b:.2f}s -> {c:.2f}s (inside documented "
                      f"band <= {KNOWN_VARIANCE_BAND_MAX[q]}s, same plan fp)")
                continue
            regressed.append((q, b, c))
            norm = f", x{c/(b*d):.1f} drift-normalized" if d != 1.0 else ""
            print(f"REGRESSED {q}: {b:.2f}s -> {c:.2f}s ({c/b:.1f}x{norm}) {plan_label(q)}")
        elif b > 0 and c / b > ratio and c - b > 0.5:
            # raw-ratio mover adjudicated by the population: name it so
            # the drift verdict is visible per query, not only in the
            # header line
            print(f"epoch-drift {q}: {b:.2f}s -> {c:.2f}s ({c/b:.1f}x raw, "
                  f"x{c/(b*d):.1f} normalized by population drift x{d:.2f} — "
                  f"same plan fp, rides the epoch)")
        elif c > 0 and (b * d) / c > ratio and b * d - c > 0.5:
            # drift-normalized, mirroring the regression side (r14): under
            # population drift D<1 a same-fp query merely riding a faster
            # epoch must not print as 'improved', and under D>1 a genuine
            # improvement must not be masked by a slower epoch
            if b / c > 1.0:
                norm = f", x{(b * d)/c:.1f} drift-normalized" if d != 1.0 else ""
                print(f"improved  {q}: {b:.2f}s -> {c:.2f}s ({b/c:.1f}x{norm}) "
                      f"{plan_label(q)}")
            else:
                # raw SLOWDOWN adjudicated as a relative improvement under
                # large drift D>1 (r15 ADVICE): a sub-1.0 'improvement
                # factor' hid the raw direction — print both explicitly,
                # the epoch-drift lines' discipline
                print(f"improved* {q}: {b:.2f}s -> {c:.2f}s ({c/b:.1f}x raw "
                      f"slowdown, x{(b * d)/c:.1f} IMPROVED relative to "
                      f"population drift x{d:.2f}) {plan_label(q)}")
        elif c > 0 and b / c > ratio and b - c > 0.5:
            # raw-ratio improver adjudicated by the population, the
            # epoch-drift verdict symmetric with the regression side
            print(f"epoch-drift {q}: {b:.2f}s -> {c:.2f}s ({b/c:.1f}x raw "
                  f"improvement, x{(b * d)/c:.1f} normalized by population "
                  f"drift x{d:.2f} — same plan fp, rides the epoch)")
    plan_moves = sorted(q for q in set(bp) & set(cp) if bp[q] != cp[q])
    if plan_moves:
        print(f"plans changed ({len(plan_moves)}): {', '.join(plan_moves)}")
        # fingerprints from a gate-RETRY run are not comparable: the
        # retry re-executes the whole suite inside the same JVM, which
        # shifts exprId allocation history, and several rewrites render
        # attribute collections in exprId order (the gid class, and a
        # wider lambda/vector-family tail) — measured 2026-08-16: an
        # attempt-2 full record flipped 22 fps that an attempt-1 re-run
        # restored to the baseline byte-for-byte. Times remain valid;
        # only the fp comparison is void.
        for rec, name in ((base, "base"), (cand, "candidate")):
            att = rec.get("floor_gate", {}).get("attempts", 1)
            if att and att > 1:
                print(f"NOTE: {name} record is a gate-retry run "
                      f"(attempts={att}) — its plan fps reflect the "
                      "re-run JVM context, not plan changes; re-measure "
                      "attempt-1 before treating these as real")
    for q in sorted(set(cq) - set(bq)):
        print(f"added     {q}: {cq[q]:.2f}s")
    for q in sorted(set(bq) - set(cq)):
        print(f"removed   {q} (was {bq[q]:.2f}s)")
    for q, e in sorted(cand.get("errors", {}).items()):
        print(f"ERROR     {q}: {e}")
    gate = cand.get("floor_gate", {})
    gate_failed = bool(gate.get("applies")) and not gate.get("passed")
    if gate_failed:
        print("FLOOR GATE FAILED — candidate record is from a degraded window")
    print(f"== totals: {base.get('value')}s -> {cand.get('value')}s; "
          f"{len(regressed)} regressed beyond {ratio}x ==")
    # a failed gate is as disqualifying as a regression: the bench itself
    # marked the record untrustworthy
    sys.exit(1 if regressed or cand.get("errors") or gate_failed else 0)


if __name__ == "__main__":
    main()
