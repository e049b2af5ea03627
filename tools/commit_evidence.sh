#!/bin/sh
# End-of-round evidence commit (VERDICT r13 ask #3): the per-round
# artifacts (correctness gate results, bench timings, leak scan, plan
# dumps, replica bench samples) must land in git BEFORE the round
# snapshot — this gap recurred in r11/r12/r13. Run it as the last step
# of every round checklist:  sh tools/commit_evidence.sh [round-label]
#
# Each pathspec is added in its own `git add` so one pattern matching
# nothing (exit 128 on unmatched pathspec) cannot void the whole add —
# the r14 ADVICE defect: a single `git add -A -- p1 p2 ...` fails
# entirely when ANY pattern is unmatched, and the `|| true` hid it.
set -e
cd "$(dirname "$0")/.."
label="${1:-evidence}"
for p in 'CORRECTNESS_r*.json' 'BENCH_r*.json' 'BENCH50_r*.json' \
  'BENCH200_r*.json' 'BENCH400_r*.json' 'BENCHCURVE_r*.json' \
  'LEAKCHECK.json' 'COPYCHECK.json' 'PLANS*_r*.md' 'PERF_NOTES.md' \
  'COVERAGE.md'; do
  git add -A -- "$p" 2>/dev/null || true
done
if git diff --cached --quiet; then
  echo "[evidence] nothing to commit"
else
  git commit -m "Track round evidence artifacts ($label)"
fi
