#!/bin/bash
# r4d campaign: three settle-gated scaling runs taken in the quiet window
# after r4c run 3 was SIGTERM'd (box load 0.09 at launch).  Same
# full-width steal probe gate (tools/boxcheck.py) as r4c.
cd /root/repo
settle() {
  for _ in $(seq 1 60); do
    python3 tools/boxcheck.py 0.8 0.05 6 && return
    sleep 10
  done
  echo "settle gave up after 10 min; proceeding (evidence above)" >&2
}
for i in 1 2 3; do
  settle
  echo "=== scaling run $i $(date -Is) load=$(cut -d' ' -f1-3 /proc/loadavg)" >&2
  python bench.py --scaling > scaling/r4d_scaling_$i.json 2> scaling/r4d_scaling_$i.log
done
echo CAMPAIGN_DONE
