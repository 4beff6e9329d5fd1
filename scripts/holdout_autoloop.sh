#!/bin/bash
# Successive-pass holdout rerun: wait for any in-flight rerun driver to
# exit, then keep re-attacking the remaining non-exact targets until a
# full pass makes no progress (each pass re-reads the stream, so it only
# queues the still-missing targets).  Seeds/budget escalate per pass so
# later passes explore fresh perturbations at higher effort.
#
# Usage: scripts/holdout_autoloop.sh <stream.jsonl> <checkpoint> [wait_pid]
set -u
STREAM=${1:?stream jsonl}
CKPT=${2:?checkpoint}
WAITPID=${3:-}

if [ -n "$WAITPID" ]; then
  while kill -0 "$WAITPID" 2>/dev/null; do sleep 60; done
fi

misses() {
  python3 - "$STREAM" <<'EOF'
import json, sys
sys.path.insert(0, 'scripts')
from holdout_summarize import summarize
recs = [json.loads(l) for l in open(sys.argv[1]) if l.strip()]
print(sum(1 for r in summarize(recs)['per_target'] if not r.get('exact')))
EOF
}

BUDGETS=(12000 16000 20000)
STARTS=(24 32 32)
SEEDS=(2 3 4)
for p in 0 1 2; do
  BEFORE=$(misses)
  echo "=== autoloop pass $((p+1)): $BEFORE misses remain ==="
  [ "$BEFORE" -eq 0 ] && break
  python scripts/holdout_rerun_misses.py \
    --stream "$STREAM" --checkpoint "$CKPT" \
    --budget "${BUDGETS[$p]}" --refine-rounds 2 \
    --guided-starts "${STARTS[$p]}" --seed "${SEEDS[$p]}" \
    --timeout 2400
  AFTER=$(misses)
  echo "=== autoloop pass $((p+1)) done: $BEFORE -> $AFTER misses ==="
  [ "$AFTER" -ge "$BEFORE" ] && { echo "no progress; stopping"; break; }
done
echo "=== autoloop complete: $(misses) misses remain ==="
