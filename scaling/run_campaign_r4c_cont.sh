#!/bin/bash
# r4c continuation: the prior session ended while settle-waiting before
# scaling run 2.  Same steal-aware settle gate (tools/boxcheck.py full-width
# burst probe) as run_campaign_r4c.sh; resumes at scaling runs 2 and 3.
cd /root/repo
settle() {
  for _ in $(seq 1 60); do
    python3 tools/boxcheck.py 0.8 0.05 6 && return
    sleep 10
  done
  echo "settle gave up after 10 min; proceeding (evidence above)" >&2
}
for i in 2 3; do
  settle
  echo "=== scaling run $i $(date -Is) load=$(cut -d' ' -f1-3 /proc/loadavg)" >&2
  python bench.py --scaling > scaling/r4c_scaling_$i.json 2> scaling/r4c_scaling_$i.log
done
echo CAMPAIGN_DONE
