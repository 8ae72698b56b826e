#!/usr/bin/env bash
# Mid-round run of the slow (fsync-bound) suite partition — the crash
# matrices and continuous-ingest families listed in tools/slow_tests.txt.
#
#   tools/run_slow_suite.sh 10
#
# Writes logs/pytest_r<N>_slow.log with the same HEAD/tree header the
# close log carries; tools/close_round.sh refuses the round unless this
# log exists, is green, and its tree hash matches the tree being closed
# (r9 VERDICT "Next round" #1: the 623-test suite outgrew the close
# window — ~72 min total, ~30 of them fsync-bound — so the close is now
# two budgeted phases instead of one oversized one).
#
# Like close_round.sh, refuses a dirty SOURCE tree: a log whose header
# hash does not describe the tested code vouches for nothing.
set -euo pipefail
cd "$(dirname "$0")/.."

N="${1:?usage: tools/run_slow_suite.sh <round-number>}"
LOG="logs/pytest_r${N}_slow.log"
mkdir -p logs

dirty=$(git status --porcelain | grep -vE ' (PROGRESS\.jsonl|logs/|BENCH_r|CORRECTNESS_r|VERDICT\.md|ADVICE\.md)' || true)
if [ -n "$dirty" ]; then
    echo "SLOW PARTITION REFUSED: uncommitted source changes —" >&2
    echo "$dirty" >&2
    exit 1
fi

mapfile -t SLOW < <(grep -v '^#' tools/slow_tests.txt | grep -v '^$')

echo "# pytest_r${N}_slow: HEAD=$(git rev-parse HEAD) tree=$(git rev-parse 'HEAD^{tree}') date=$(date -u +%FT%TZ)" > "$LOG"
# `-m slow` overrides the repo-default `addopts = -m "not slow"`
# (pytest.ini) — the slow modules carry `pytestmark = pytest.mark.slow`
# and would otherwise be deselected even when named explicitly.
if python -m pytest "${SLOW[@]}" -m slow -q >> "$LOG" 2>&1; then
    echo "# exit=0" >> "$LOG"
    tail -2 "$LOG"
    echo "slow partition green: ${LOG}"
else
    echo "# exit=1" >> "$LOG"
    tail -15 "$LOG" >&2
    echo "SLOW PARTITION RED (see ${LOG})" >&2
    exit 1
fi
