#!/bin/bash
# r4: settle-gated final campaign at round-4 HEAD — 3 suite runs + 3
# scaling runs, the r3i/r3j/r3k protocol (each run waits for 1-min
# load < 0.8 before starting, cold process each).
cd /root/repo
settle() {
  for _ in $(seq 1 120); do
    l=$(cut -d' ' -f1 /proc/loadavg)
    ok=$(python3 -c "print(1 if $l < 0.8 else 0)")
    [ "$ok" = 1 ] && return
    sleep 5
  done
}
for i in 1 2 3; do
  settle
  echo "=== suite run $i $(date -Is) load=$(cut -d' ' -f1-3 /proc/loadavg)" >&2
  python bench.py > scaling/r4_suite_$i.json 2> scaling/r4_suite_$i.log
done
for i in 1 2 3; do
  settle
  echo "=== scaling run $i $(date -Is) load=$(cut -d' ' -f1-3 /proc/loadavg)" >&2
  python bench.py --scaling > scaling/r4_scaling_$i.json 2> scaling/r4_scaling_$i.log
done
echo CAMPAIGN_DONE
