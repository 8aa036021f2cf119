#!/bin/bash
# r4c: steal-aware settle-gated campaign — the r4b protocol plus
# tools/boxcheck.py, which spins a full-width busy burst and requires
# the hypervisor to actually grant the vCPUs (burst steal < 5%) before
# each run.  Load-average gates cannot see an oversubscribed host when
# the box is idle; the burst probe can (r4b/1 and r4b/3 would both
# have been skipped by this gate).
cd /root/repo
settle() {
  for _ in $(seq 1 60); do
    python3 tools/boxcheck.py 0.8 0.05 6 && return
    sleep 10
  done
  echo "settle gave up after 10 min; proceeding (evidence above)" >&2
}
settle
echo "=== suite run 1 $(date -Is) load=$(cut -d' ' -f1-3 /proc/loadavg)" >&2
python bench.py > scaling/r4c_suite_1.json 2> scaling/r4c_suite_1.log
for i in 1 2 3; do
  settle
  echo "=== scaling run $i $(date -Is) load=$(cut -d' ' -f1-3 /proc/loadavg)" >&2
  python bench.py --scaling > scaling/r4c_scaling_$i.json 2> scaling/r4c_scaling_$i.log
done
echo CAMPAIGN_DONE
