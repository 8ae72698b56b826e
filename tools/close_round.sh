#!/usr/bin/env bash
# Canonical end-of-round suite snapshot: logs/pytest_r<N>.log
#
#   tools/close_round.sh 10
#
# Round 8 shipped a red suite because the snapshot step recorded the
# log but nothing ENFORCED the exit code (r8 VERDICT "What's wrong" #1);
# round 9 enforced it but started the 72-minute full suite with 10
# minutes of round left, so no completed log survived (r9 VERDICT
# "What's wrong" #1). This script is the enforcement, now sized to the
# clock: the suite is split into the slow fsync-bound partition
# (tools/slow_tests.txt — crash matrices + continuous-ingest families,
# run mid-round via tools/run_slow_suite.sh) and the fast close
# partition (everything else, run here). The round closes only when
#   (a) the working tree is clean apart from driver-managed files, so
#       the headers' HEAD/tree hashes actually describe the tested code;
#   (b) logs/pytest_r<N>_slow.log exists, is green (summary line +
#       exit=0 trailer), and its tree hash EQUALS the tree being closed
#       — a slow log from an older tree vouches for nothing;
#   (c) the fast partition exits 0 here.
set -euo pipefail
cd "$(dirname "$0")/.."

N="${1:?usage: tools/close_round.sh <round-number>}"
LOG="logs/pytest_r${N}.log"
SLOWLOG="logs/pytest_r${N}_slow.log"
mkdir -p logs

# driver-managed / generated files may be dirty; SOURCE must not be
dirty=$(git status --porcelain | grep -vE ' (PROGRESS\.jsonl|logs/|BENCH_r|CORRECTNESS_r|VERDICT\.md|ADVICE\.md)' || true)
if [ -n "$dirty" ]; then
    echo "ROUND CLOSE REFUSED: uncommitted source changes —" >&2
    echo "$dirty" >&2
    exit 1
fi

TREE=$(git rev-parse 'HEAD^{tree}')

# (b) slow partition: present, same tree, green
if [ ! -f "$SLOWLOG" ]; then
    echo "ROUND CLOSE REFUSED: ${SLOWLOG} missing — run tools/run_slow_suite.sh ${N} first" >&2
    exit 1
fi
slow_tree=$(head -1 "$SLOWLOG" | grep -o 'tree=[0-9a-f]*' | cut -d= -f2 || true)
if [ "$slow_tree" != "$TREE" ]; then
    echo "ROUND CLOSE REFUSED: ${SLOWLOG} tested tree ${slow_tree:-<none>}, closing tree is ${TREE} — re-run tools/run_slow_suite.sh ${N}" >&2
    exit 1
fi
if ! tail -1 "$SLOWLOG" | grep -q '^# exit=0$'; then
    echo "ROUND CLOSE REFUSED: ${SLOWLOG} is not a completed green run" >&2
    exit 1
fi
if ! grep -qE '^[0-9]+ passed' "$SLOWLOG"; then
    echo "ROUND CLOSE REFUSED: ${SLOWLOG} has no pytest summary line" >&2
    exit 1
fi

# (c) fast partition = tests/ minus the slow files
mapfile -t SLOW < <(grep -v '^#' tools/slow_tests.txt | grep -v '^$')
IGNORES=()
for f in "${SLOW[@]}"; do IGNORES+=("--ignore=$f"); done

echo "# pytest_r${N}: HEAD=$(git rev-parse HEAD) tree=${TREE} date=$(date -u +%FT%TZ) slow_log=${SLOWLOG}" > "$LOG"
if python -m pytest tests/ "${IGNORES[@]}" -q >> "$LOG" 2>&1; then
    echo "# exit=0" >> "$LOG"
    tail -2 "$LOG"
    echo "round ${N} closed green: ${LOG} + ${SLOWLOG} (tree ${TREE})"
else
    echo "# exit=1" >> "$LOG"
    tail -15 "$LOG" >&2
    echo "ROUND CLOSE REFUSED: fast partition not green (see ${LOG})" >&2
    exit 1
fi
