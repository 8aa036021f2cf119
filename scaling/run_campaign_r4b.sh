#!/bin/bash
# r4b: fresh settle-gated campaign replacing the two invalid r4 crash-
# window scaling readings (r4_scaling_1 started with a still-draining
# 15-min load; r4_scaling_2 launched at load 36 after a session crash).
# Protocol identical to r3i/r3j/r3k/r4: each run waits for 1-min load
# < 0.8 (up to 10 min), cold process each, loads logged before/after.
cd /root/repo
settle() {
  for _ in $(seq 1 120); do
    l=$(cut -d' ' -f1 /proc/loadavg)
    ok=$(python3 -c "print(1 if $l < 0.8 else 0)")
    [ "$ok" = 1 ] && return
    sleep 5
  done
}
settle
echo "=== suite run 1 $(date -Is) load=$(cut -d' ' -f1-3 /proc/loadavg)" >&2
python bench.py > scaling/r4b_suite_1.json 2> scaling/r4b_suite_1.log
for i in 1 2 3; do
  settle
  echo "=== scaling run $i $(date -Is) load=$(cut -d' ' -f1-3 /proc/loadavg)" >&2
  python bench.py --scaling > scaling/r4b_scaling_$i.json 2> scaling/r4b_scaling_$i.log
done
echo CAMPAIGN_DONE
