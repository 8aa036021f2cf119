#!/bin/bash
# r4i campaign: six settle-gated scaling runs in the 03:1x quiet window
# (load 0.04 at launch) growing the fully-instrumented evidence class
# (steal + md5 probe + memcpy bandwidth probe, per phase since r4g).
cd /root/repo
settle() {
  for _ in $(seq 1 120); do
    python3 tools/boxcheck.py 0.8 0.05 6 && return
    sleep 10
  done
  echo "settle gave up after 20 min; proceeding (evidence above)" >&2
}
for i in 1 2 3 4 5 6; do
  settle
  echo "=== scaling run $i $(date -Is) load=$(cut -d' ' -f1-3 /proc/loadavg)" >&2
  python bench.py --scaling > scaling/r4i_scaling_$i.json 2> scaling/r4i_scaling_$i.log
done
echo CAMPAIGN_DONE
