#!/bin/bash
# Final round-3 campaign, settle-gated: before each run, wait until the
# 1-min load is < 0.8 (up to 8 min) so one run's drain never pollutes
# the next run's first measurement.
cd /root/repo
settle() {
  for _ in $(seq 1 96); do
    l=$(cut -d' ' -f1 /proc/loadavg)
    ok=$(python3 -c "print(1 if $l < 0.8 else 0)")
    [ "$ok" = 1 ] && return
    sleep 5
  done
}
for i in 1 2 3; do
  settle
  echo "=== scaling run $i $(date -Is) load=$(cut -d' ' -f1-3 /proc/loadavg)" >&2
  python bench.py --scaling > scaling/r3i_scaling_$i.json 2> scaling/r3i_scaling_$i.log
done
for i in 1 2 3; do
  settle
  echo "=== suite run $i $(date -Is) load=$(cut -d' ' -f1-3 /proc/loadavg)" >&2
  python bench.py > scaling/r3i_suite_$i.json 2> scaling/r3i_suite_$i.log
done
echo CAMPAIGN_DONE
