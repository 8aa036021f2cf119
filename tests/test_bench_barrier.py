"""Weak-scaling rendezvous liveness (bench.watch_rendezvous): a child
dying during setup must abort the campaign in seconds — write .ABORT
for the in-child gates, reap siblings, surface the returncode — not
hang the siblings out the barrier's 600 s deadline."""

import os
import subprocess
import sys
import time


def _stub(code: str):
    return subprocess.Popen([sys.executable, "-c", code],
                            stdout=subprocess.PIPE, text=True)


def _bench():
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    import bench
    return bench


def test_dead_child_aborts_fast(tmp_path):
    bench = _bench()
    bar = str(tmp_path / "bar")
    # one child dies immediately with rc=7; two idle past the horizon
    procs = [_stub("import sys; sys.exit(7)"),
             _stub("import time; time.sleep(60)"),
             _stub("import time; time.sleep(60)")]
    t0 = time.time()
    rc = bench.watch_rendezvous(procs, bar, n=3, poll_s=0.05,
                                kill_wait_s=0.2)
    elapsed = time.time() - t0
    assert rc == 7
    assert elapsed < 30  # seconds, not the 600 s in-child deadline
    assert os.path.exists(bar + ".ABORT")
    for pr in procs:  # every sibling reaped (no zombies left behind)
        assert pr.poll() is not None
        pr.stdout.close()


def test_all_ready_returns_none(tmp_path):
    bench = _bench()
    bar = str(tmp_path / "bar")
    code = "import time; time.sleep(30)"
    procs = [_stub(code) for _ in range(2)]
    # markers appear (as the in-child gate would write them)
    open(bar + ".a", "w").close()
    open(bar + ".b", "w").close()
    rc = bench.watch_rendezvous(procs, bar, n=2, poll_s=0.05)
    assert rc is None
    assert not os.path.exists(bar + ".ABORT")
    for pr in procs:
        pr.kill()
        pr.wait()
        pr.stdout.close()
