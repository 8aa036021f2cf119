#!/bin/bash
# Final round-3 campaign at HEAD: 3x suite + 3x scaling, raw JSONs kept.
cd /root/repo
for i in 1 2 3; do
  echo "=== suite run $i $(date -Is) load=$(cut -d' ' -f1-3 /proc/loadavg)" >&2
  python bench.py > scaling/r3h_suite_$i.json 2> scaling/r3h_suite_$i.log
done
for i in 1 2 3; do
  echo "=== scaling run $i $(date -Is) load=$(cut -d' ' -f1-3 /proc/loadavg)" >&2
  python bench.py --scaling > scaling/r3h_scaling_$i.json 2> scaling/r3h_scaling_$i.log
done
echo CAMPAIGN_DONE
