#!/bin/bash
# r4f long-haul campaign: eight settle-gated scaling runs spread over
# the rest of the session, patience doubled (20 min give-up) because
# the evening window shows sustained foreign load with hypervisor
# steal — the goal is to harvest whatever quiet windows occur and grow
# the in-artifact-valid sample (steal < 5%, probes within ~20%).
cd /root/repo
settle() {
  for _ in $(seq 1 120); do
    python3 tools/boxcheck.py 0.8 0.05 6 && return
    sleep 10
  done
  echo "settle gave up after 20 min; proceeding (evidence above)" >&2
}
for i in 1 2 3 4 5 6 7 8; do
  settle
  echo "=== scaling run $i $(date -Is) load=$(cut -d' ' -f1-3 /proc/loadavg)" >&2
  python bench.py --scaling > scaling/r4f_scaling_$i.json 2> scaling/r4f_scaling_$i.log
done
echo CAMPAIGN_DONE
