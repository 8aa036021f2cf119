#!/bin/bash
# r3k: 2 settle-gated scaling runs with the symmetric pre/post baseline.
cd /root/repo
settle() {
  for _ in $(seq 1 96); do
    l=$(cut -d' ' -f1 /proc/loadavg)
    ok=$(python3 -c "print(1 if $l < 0.8 else 0)")
    [ "$ok" = 1 ] && return
    sleep 5
  done
}
for i in 1 2; do
  settle
  echo "=== scaling run $i $(date -Is) load=$(cut -d' ' -f1-3 /proc/loadavg)" >&2
  python bench.py --scaling > scaling/r3k_scaling_$i.json 2> scaling/r3k_scaling_$i.log
done
echo CAMPAIGN_DONE
