#!/bin/bash
# r4g campaign: six settle-gated scaling runs with the NEW per-phase
# memory-bandwidth probe (mem_probe_sec_*) in the artifact — the first
# campaign where ambient bandwidth contention is in-artifact
# measurable.  Late-night window; patience 20 min per settle.
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
  python bench.py --scaling > scaling/r4g_scaling_$i.json 2> scaling/r4g_scaling_$i.log
done
echo CAMPAIGN_DONE
