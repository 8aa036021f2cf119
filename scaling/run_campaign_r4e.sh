#!/bin/bash
# r4e campaign at the final round-4 HEAD (61 gated queries): two
# settle-gated full-suite runs at sf0.1/32cpus plus three settle-gated
# scaling runs.  Same full-width steal probe gate (tools/boxcheck.py)
# as r4c/r4d; every reading self-certifies via the per-phase steal +
# calibration-probe instrumentation.
cd /root/repo
settle() {
  for _ in $(seq 1 60); do
    python3 tools/boxcheck.py 0.8 0.05 6 && return
    sleep 10
  done
  echo "settle gave up after 10 min; proceeding (evidence above)" >&2
}
for i in 1 2; do
  settle
  echo "=== suite run $i $(date -Is) load=$(cut -d' ' -f1-3 /proc/loadavg)" >&2
  python bench.py > scaling/r4e_suite_$i.json 2> scaling/r4e_suite_$i.log
done
for i in 1 2 3; do
  settle
  echo "=== scaling run $i $(date -Is) load=$(cut -d' ' -f1-3 /proc/loadavg)" >&2
  python bench.py --scaling > scaling/r4e_scaling_$i.json 2> scaling/r4e_scaling_$i.log
done
echo CAMPAIGN_DONE
