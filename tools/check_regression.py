#!/usr/bin/env python3
"""Per-query regression gate, pinned to a COMMITTED prior bench record.

The r13 round's zero-regression claim silently compared against the
r12 *driver* window (a 21%-slower host) instead of the committed
healthy record, and a real 2.5x regression (q_image_dedup) sailed
through. This tool makes the base explicit and the comparison
control-normalized:

    python3 tools/check_regression.py [--base GITREF] [--cur BENCH_LOCAL.json]

Base defaults to HEAD's committed BENCH_LOCAL.json (i.e., the last
round's committed record when run before this round's record is
committed). The gate is the builder's standing one: a query regresses
when cur_norm > 1.5 * base_norm + 0.3s, where *_norm = raw /
(host_control / REF_CONTROL). Records flagged "drift": "DRIFTING"
are refused as either side.
"""
import argparse, json, subprocess, sys

REF_CONTROL = 14.0  # the reference healthy-window control (SCALEPROBE_r11)


def load_committed(ref, path):
    out = subprocess.run(["git", "show", f"{ref}:{path}"], capture_output=True, text=True)
    if out.returncode != 0:
        sys.exit(f"cannot read {path} at {ref}: {out.stderr.strip()}")
    return json.loads(out.stdout)


def norm_factor(rec):
    c = rec["queries"].get("_host_control")
    if not c:
        sys.exit("record has no _host_control — cannot normalize")
    return c / REF_CONTROL


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--base", default="HEAD", help="git ref holding the committed base record")
    ap.add_argument("--base-path", default="BENCH_LOCAL.json")
    ap.add_argument("--cur", default="BENCH_LOCAL.json", help="working-tree record to grade")
    ap.add_argument("--ratio", type=float, default=1.5)
    ap.add_argument("--slack", type=float, default=0.3)
    args = ap.parse_args()

    base = load_committed(args.base, args.base_path)
    cur = json.load(open(args.cur))
    for name, rec in (("base", base), ("cur", cur)):
        if rec.get("drift") == "DRIFTING":
            sys.exit(f"{name} record is flagged DRIFTING (seg ratio "
                     f"{rec.get('drift_seg_ratio')}, end ratio {rec.get('drift_end_ratio')}) — re-run it")
        # Bench records failed queries as NEGATIVE elapsed times (and
        # counts them in _failed_count). A record containing failures
        # is not a performance record — a fast-crashing query would
        # otherwise read as a large improvement and the gate would
        # exit 0, the exact silent-pass this tool exists to prevent.
        # Scan BOTH passes: a cold-only crash leaves its negative
        # marker in queries_cold (and is excluded from total_cold,
        # reading as an improvement) while the measured pass looks
        # clean.
        failed = [q for qmap in (rec.get("queries", {}), rec.get("queries_cold", {}))
                  for q, v in qmap.items()
                  if not q.startswith("_") and isinstance(v, (int, float)) and v < 0]
        failed_count = (rec["queries"].get("_failed_count", 0)
                        + rec.get("queries_cold", {}).get("_failed_count_cold", 0))
        if failed or failed_count > 0:
            sys.exit(f"{name} record contains FAILED queries "
                     f"({failed_count or len(failed)}: "
                     f"{' '.join(sorted(set(failed))) or 'see _failed_count'}) — fix the queries and re-run")
    bf, cf = norm_factor(base), norm_factor(cur)
    print(f"base control {base['queries']['_host_control']:.2f} (x{bf:.3f}), "
          f"cur control {cur['queries']['_host_control']:.2f} (x{cf:.3f})")

    regressions, improved, new = [], [], []
    for q, craw in sorted(cur["queries"].items()):
        if q.startswith("_"):
            continue
        braw = base["queries"].get(q)
        if braw is None:
            new.append(q)
            continue
        bn, cn = braw / bf, craw / cf
        if cn > args.ratio * bn + args.slack:
            regressions.append((q, braw, craw, bn, cn))
        elif bn > args.ratio * cn + args.slack:
            improved.append((q, bn, cn))
    for q, braw, craw, bn, cn in sorted(regressions, key=lambda r: -r[4] / max(r[3], 1e-9)):
        print(f"REGRESSION {q}: {bn:.2f} -> {cn:.2f} s normalized ({craw:.2f} raw, x{cn / max(bn, 1e-9):.2f})")
    if new:
        print(f"new queries (no base): {' '.join(new)}")
    print(f"{len(regressions)} regressions, {len(improved)} improved >1.5x, "
          f"{len(new)} new, gate {args.ratio}x+{args.slack}s vs {args.base}:{args.base_path}")
    sys.exit(1 if regressions else 0)


if __name__ == "__main__":
    main()
