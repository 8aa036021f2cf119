"""Box-sanity gate for benchmark campaigns: exit 0 only when the box
is currently measurable — 1-min load below the threshold AND the
hypervisor grants the vCPUs under a full-width busy burst.

Steal is only visible under demand: an idle box always reads steal~0
even when the host is oversubscribed, so the check spins one busy
process per CPU for a few seconds and measures the /proc/stat steal
fraction across that window.  The r4b campaign showed the collapse
mode is hypervisor steal (steal_frac 0.426 inside the corrupted 32-cpu
phase, all single-thread probes normal) — a signal no load average or
single-thread probe can pre-detect.

Usage: python tools/boxcheck.py [max_load] [max_steal_frac] [burst_sec]
Prints one line of evidence either way.
"""

import hashlib
import multiprocessing as mp
import os
import sys
import time


def stat_line():
    with open("/proc/stat") as f:
        parts = f.readline().split()
    # user nice system idle iowait irq softirq steal
    return [int(v) for v in parts[1:9]]


def _burn(deadline: float) -> None:
    buf = b"\xa5" * 65536
    while time.time() < deadline:
        buf = hashlib.md5(buf).digest() * 4096


def burst_steal_frac(burst_sec: float, ncpu: int) -> float:
    deadline = time.time() + burst_sec
    procs = [mp.Process(target=_burn, args=(deadline,), daemon=True)
             for _ in range(ncpu)]
    for p in procs:
        p.start()
    time.sleep(0.5)  # let the burst saturate before sampling
    a = stat_line()
    time.sleep(max(0.5, burst_sec - 1.5))
    b = stat_line()
    for p in procs:
        p.join()
    d = [y - x for x, y in zip(a, b)]
    busy = sum(d) - d[3]  # everything but idle
    return d[7] / busy if busy else 0.0


def main() -> int:
    max_load = float(sys.argv[1]) if len(sys.argv) > 1 else 0.8
    max_steal = float(sys.argv[2]) if len(sys.argv) > 2 else 0.05
    burst = float(sys.argv[3]) if len(sys.argv) > 3 else 6.0
    with open("/proc/loadavg") as f:
        load1 = float(f.read().split()[0])
    if load1 >= max_load:
        print(f"BUSY load1={load1} >= {max_load}")
        return 1
    ncpu = len(os.sched_getaffinity(0))
    sf = burst_steal_frac(burst, ncpu)
    if sf >= max_steal:
        print(f"STOLEN burst_steal_frac={sf:.4f} >= {max_steal} "
              f"(load1={load1}, ncpu={ncpu})")
        return 1
    print(f"OK load1={load1} burst_steal_frac={sf:.4f} ncpu={ncpu}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
