#!/bin/bash
# r5a campaign: six round-5 settle-gated scaling runs (same protocol as
# r4g/r4h/r4i: per-phase steal fraction, md5 probe, memcpy bandwidth
# probe all recorded in-artifact).
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
  python bench.py --scaling > scaling/r5a_scaling_$i.json 2> scaling/r5a_scaling_$i.log
done
echo CAMPAIGN_DONE
