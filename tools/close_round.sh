#!/usr/bin/env bash
# Canonical end-of-round suite snapshot: logs/pytest_r<N>.log
#
#   tools/close_round.sh 9
#
# Round 8 shipped a red suite because the snapshot step recorded the
# log but nothing ENFORCED the exit code (r8 VERDICT "What's wrong" #1).
# This script is the enforcement: it refuses to bless the round unless
#   (a) the working tree is clean apart from driver-managed files, so
#       the header's HEAD/tree hashes actually describe the tested code;
#   (b) pytest exits 0 — any failure leaves the log in place for
#       diagnosis but exits nonzero so the close visibly did NOT happen.
set -euo pipefail
cd "$(dirname "$0")/.."

N="${1:?usage: tools/close_round.sh <round-number>}"
LOG="logs/pytest_r${N}.log"
mkdir -p logs

# driver-managed / generated files may be dirty; SOURCE must not be
dirty=$(git status --porcelain | grep -vE ' (PROGRESS\.jsonl|logs/|BENCH_r|CORRECTNESS_r|VERDICT\.md|ADVICE\.md)' || true)
if [ -n "$dirty" ]; then
    echo "ROUND CLOSE REFUSED: uncommitted source changes —" >&2
    echo "$dirty" >&2
    exit 1
fi

echo "# pytest_r${N}: HEAD=$(git rev-parse HEAD) tree=$(git rev-parse 'HEAD^{tree}') date=$(date -u +%FT%TZ)" > "$LOG"
if python -m pytest tests/ -q >> "$LOG" 2>&1; then
    tail -1 "$LOG"
    echo "round ${N} closed green: ${LOG}"
else
    tail -15 "$LOG" >&2
    echo "ROUND CLOSE REFUSED: suite not green (see ${LOG})" >&2
    exit 1
fi
