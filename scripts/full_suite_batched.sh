#!/bin/bash
# Full-suite recorded run (VERDICT r4 #3), batched per CLAUDE.md: the host
# has ONE core and a torch h2h job + the TPU measurement queue share it, so
# run 2-3 files per pytest invocation under a bounded timeout and aggregate.
# Tests force CPU in conftest (no tunnel contention). nice 5: below the TPU
# queue's host loop, above the nice-19 torch job. The per-batch timeout is
# 1500 s (not CLAUDE.md's 580): this runner is itself a background script,
# so the Bash-tool 600 s ceiling doesn't apply, and slow-marked training
# batches exceed 580 s under 3-way core contention.
TO=${TO:-1500}
cd "$(dirname "$0")/.."
OUT=/tmp/full_suite
mkdir -p "$OUT"
FILES=$(ls tests/test_*.py)
batch=()
i=0
run_batch() {
  [ ${#batch[@]} -eq 0 ] && return
  i=$((i+1))
  local log="$OUT/batch_$(printf %02d $i).log"
  # clear the accumulator on skip too, or skipped batches leak their files
  # into the next run batch (14-file mega-batches on rerun)
  if [ -e "$log.done" ]; then batch=(); echo "BATCH${i}_SKIP"; return; fi
  if nice -n 5 timeout "$TO" python -m pytest "${batch[@]}" -q --no-header \
      > "$log" 2>&1; then
    tail -2 "$log"; touch "$log.done"; echo "BATCH${i}_OK"
  else
    tail -6 "$log"; echo "BATCH${i}_FAILED (${batch[*]})"
  fi
  batch=()
}
n=0
for f in $FILES; do
  batch+=("$f"); n=$((n+1))
  if [ $n -ge 2 ]; then run_batch; n=0; fi
done
run_batch
echo FULL_SUITE_BATCHES_DONE
grep -hE "passed|failed|error" "$OUT"/batch_*.log | tail -40
