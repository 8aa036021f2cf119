#!/bin/bash
# r5b: final-state full-suite readings at sf0.1 / 32 cpus (cold
# process each), settle-gated like the campaigns.
cd /root/repo
settle() {
  for _ in $(seq 1 60); do
    l=$(cut -d' ' -f1 /proc/loadavg)
    ok=$(python3 -c "print(1 if $l < 0.8 else 0)")
    [ "$ok" = 1 ] && return
    sleep 10
  done
}
for i in 1 2 3; do
  settle
  echo "=== suite run $i $(date -Is) load=$(cut -d' ' -f1-3 /proc/loadavg)" >&2
  python bench.py > scaling/r5b_suite_$i.json 2> scaling/r5b_suite_$i.log
done
echo SUITE_DONE
