"""Sharded URL-seen set — the Ray-native replacement for libmetha's per-host
mtrie (src/libmetha/mtrie.c:216-389 ``mtrie_tryadd``: an atomic
contains+insert keyed on ``url->str+host_o`` — host+path, protocol excluded,
case-insensitive — one trie per host behind ``host_ent->lock``,
src/libmetha/urlengine.c:144-149,219-243).

Design (SURVEY.md §2.4 T1, §4):

* The key space is partitioned by **host**: ``shard_of(host_norm)`` routes
  every key of one host to exactly one shard, so a host's check+insert
  stream is serialized by that shard actor — the same single-writer
  invariant the reference gets from ``host_ent->lock``, without a lock.
* Each shard holds either an exact Python set (bit-exact semantics, used
  for parity tests and moderate scale) or a **cuckoo filter**
  (approximate membership, bounded memory: ~2 bytes/URL at 16-bit
  fingerprints — the 10^10-URL scale path; a false positive makes the
  crawler skip a genuinely-new URL, which is the safe failure direction
  for a crawler).
* ``try_add`` is batched (one RPC per extracted-links batch, not per URL).
* Shards snapshot/restore to bytes → per-round Parquet checkpoints
  (north rule: resumable with per-partition lineage).

Everything here is plain Python/numpy; the Ray actor wrapper is created
via ``make_seen_pool`` so the module stays importable without Ray.
"""

from __future__ import annotations

import hashlib
import os
import pickle
from typing import Dict, Iterable, List, Sequence, Tuple

import numpy as np


def stable_hash64(s: str) -> int:
    """Process-stable 64-bit hash (python's builtin hash() is salted)."""
    return int.from_bytes(
        hashlib.blake2b(s.encode("utf-8", "surrogateescape"), digest_size=8).digest(),
        "little",
    )


def shard_of(host_norm: str, num_shards: int) -> int:
    """Route a host to its seen/politeness shard (SURVEY §4: key 2)."""
    return stable_hash64(host_norm) % num_shards


class CuckooFilter:
    """Bucketized cuckoo filter (Fan et al., CoNEXT'14 — public paper),
    4 slots/bucket, 16-bit fingerprints (~0.02% fp at 95% load).

    numpy-backed so a 2^27-bucket shard (~1 GiB, ~5×10^8 URLs) stays
    practical; inserts are deterministic (kick path seeded from the item
    hash) so snapshot/replay is reproducible.
    """

    SLOTS = 4
    MAX_KICKS = 500

    def __init__(self, num_buckets: int = 1 << 16):
        # power of two so alt-bucket xor stays in range
        if num_buckets & (num_buckets - 1):
            raise ValueError("num_buckets must be a power of two")
        self.num_buckets = num_buckets
        self.table = np.zeros((num_buckets, self.SLOTS), dtype=np.uint16)
        self.count = 0

    def _fp_and_buckets(self, key: str) -> tuple[int, int, int]:
        h = stable_hash64(key)
        fp = (h & 0xFFFF) or 1  # 0 marks an empty slot
        i1 = (h >> 16) % self.num_buckets
        # partial-key cuckoo: alt bucket = i xor hash(fp)
        i2 = (i1 ^ stable_hash64(str(fp))) % self.num_buckets
        return fp, i1, i2

    def __contains__(self, key: str) -> bool:
        fp, i1, i2 = self._fp_and_buckets(key)
        return bool((self.table[i1] == fp).any() or (self.table[i2] == fp).any())

    def add(self, key: str) -> bool:
        """Insert; returns False when the filter is saturated."""
        fp, i1, i2 = self._fp_and_buckets(key)
        for i in (i1, i2):
            row = self.table[i]
            empty = np.flatnonzero(row == 0)
            if empty.size:
                row[empty[0]] = fp
                self.count += 1
                return True
        # kick loop, deterministic path from the item hash
        rng = np.random.default_rng(stable_hash64(key) & 0xFFFFFFFF)
        i = i1 if rng.integers(2) else i2
        for _ in range(self.MAX_KICKS):
            slot = int(rng.integers(self.SLOTS))
            fp, self.table[i, slot] = int(self.table[i, slot]), fp
            i = (i ^ stable_hash64(str(fp))) % self.num_buckets
            row = self.table[i]
            empty = np.flatnonzero(row == 0)
            if empty.size:
                row[empty[0]] = fp
                self.count += 1
                return True
        return False

    def try_add(self, key: str) -> bool:
        """contains+insert in one step (mtrie_tryadd semantics):
        True → the key was new and is now recorded."""
        if key in self:
            return False
        return self.add(key)

    def to_bytes(self) -> bytes:
        return pickle.dumps(
            {"num_buckets": self.num_buckets, "count": self.count,
             "table": self.table.tobytes()},
            protocol=pickle.HIGHEST_PROTOCOL,
        )

    @classmethod
    def from_bytes(cls, blob: bytes) -> "CuckooFilter":
        d = pickle.loads(blob)
        f = cls(d["num_buckets"])
        f.table = np.frombuffer(d["table"], dtype=np.uint16).reshape(
            d["num_buckets"], cls.SLOTS
        ).copy()
        f.count = d["count"]
        return f


# Host-activation registry keys live in the same shards as the host's URL
# keys (same routing) but in a disjoint keyspace: URL keys are
# host+path and can never start with NUL.
REG_PREFIX = "\x00REG\x00"


def reg_key(host_norm: str) -> str:
    return REG_PREFIX + host_norm


class SeenShardState:
    """One shard's membership state; ``mode`` = 'exact' | 'cuckoo'."""

    def __init__(self, mode: str = "exact", cuckoo_buckets: int = 1 << 16):
        self.mode = mode
        self.exact: set = set()
        self.cuckoo = CuckooFilter(cuckoo_buckets) if mode == "cuckoo" else None

    def try_add_batch(self, keys: Sequence[str]) -> List[bool]:
        if self.mode == "cuckoo":
            return [self.cuckoo.try_add(k) for k in keys]
        out = []
        seen = self.exact
        for k in keys:
            if k in seen:
                out.append(False)
            else:
                seen.add(k)
                out.append(True)
        return out

    def __len__(self) -> int:
        return self.cuckoo.count if self.mode == "cuckoo" else len(self.exact)

    def url_count(self) -> int:
        """URL keys only (registry keys excluded); cuckoo mode can't
        distinguish and reports the raw item count."""
        if self.mode == "cuckoo":
            return self.cuckoo.count
        return sum(1 for k in self.exact if not k.startswith("\x00"))

    def snapshot(self) -> bytes:
        if self.mode == "cuckoo":
            return pickle.dumps(("cuckoo", self.cuckoo.to_bytes()))
        return pickle.dumps(("exact", self.exact))

    def snapshot_to(self, path: str) -> None:
        """Write this shard's snapshot to ``path`` atomically (tmp +
        rename).  File bytes are identical to :meth:`snapshot` — the
        two forms read each other's checkpoints."""
        tmp = path + ".tmp"
        with open(tmp, "wb") as f:
            f.write(self.snapshot())
        os.replace(tmp, path)

    @classmethod
    def restore_from(cls, path: str) -> "SeenShardState":
        with open(path, "rb") as f:
            return cls.restore(f.read())

    @classmethod
    def restore(cls, blob: bytes) -> "SeenShardState":
        mode, payload = pickle.loads(blob)
        st = cls.__new__(cls)
        st.mode = mode
        if mode == "cuckoo":
            st.exact = set()
            st.cuckoo = CuckooFilter.from_bytes(payload)
        else:
            st.exact = payload
            st.cuckoo = None
        return st


class LocalSeenPool:
    """In-process pool of shards — the simulator / unit-test backend and
    the single-node fallback.  Same API as the Ray actor pool."""

    def __init__(self, num_shards: int = 8, mode: str = "exact",
                 cuckoo_buckets: int = 1 << 16):
        self.num_shards = num_shards
        self.shards = [SeenShardState(mode, cuckoo_buckets) for _ in range(num_shards)]

    def try_add_batch(self, host_norm: str, keys: Sequence[str]) -> List[bool]:
        return self.shards[shard_of(host_norm, self.num_shards)].try_add_batch(keys)

    def try_add_grouped(self, groups: Dict[str, List[str]]) -> Dict[str, List[bool]]:
        return {h: self.try_add_batch(h, ks) for h, ks in groups.items()}

    def try_add_seq(self, pairs: Sequence[Tuple[str, str]]) -> List[bool]:
        """Ordered check+insert over (routing_host, key) pairs.  Order is
        preserved within each shard; different shards hold disjoint
        keyspaces, so per-shard ordering equals global ordering."""
        return [self.try_add_batch(h, [k])[0] for h, k in pairs]

    def size(self) -> int:
        return sum(s.url_count() for s in self.shards)

    def snapshots(self) -> List[bytes]:
        return [s.snapshot() for s in self.shards]

    def restore(self, blobs: Iterable[bytes]) -> None:
        self.shards = [SeenShardState.restore(b) for b in blobs]

    def snapshot_to_dir(self, cdir: str) -> None:
        for i, s in enumerate(self.shards):
            s.snapshot_to(os.path.join(cdir, f"seen_{i}.bin"))

    def restore_from_dir(self, cdir: str) -> None:
        self.shards = [
            SeenShardState.restore_from(os.path.join(cdir, f"seen_{i}.bin"))
            for i in range(self.num_shards)
        ]


def make_seen_pool(num_shards: int = 8, mode: str = "exact",
                   cuckoo_buckets: int = 1 << 16, num_cpus: float = 0.05):
    # num_cpus is tiny on purpose: shard actors do set lookups, never
    # compute; reserving real CPUs for them starves the parse stages
    # (and deadlocks small test sessions).
    """Create the Ray actor-pool variant: ``num_shards`` small actors
    (SURVEY §4: seen shards are cheap — num_cpus≈0.25 so they never starve
    the parse stages).  Returns a :class:`RaySeenPool` facade whose methods
    mirror :class:`LocalSeenPool` but are usable from driver AND from
    inside map_groups/map_batches workers (actor handles serialize)."""
    import ray

    @ray.remote(num_cpus=num_cpus)
    class SeenShardActor:
        """One shard.  Beyond plain membership it supports DETERMINISTIC
        same-round conflict resolution for the rounds engine: turn-time
        adds carry a ``claimant`` (the crawling host); the shard logs
        which hosts claimed each ROUND-LOCAL key (keys already seen
        before the round can't conflict — everyone deterministically
        gets False).  When two distinct hosts claim the same key in the
        same round the natural winner is RPC-arrival order — racy — so
        the driver detects it via ``round_claims()``, restores the
        round-start snapshot, and replays the round with a ``forced``
        verdict table (key → winner host, the sequential model's
        sorted-host order, simulator.py:284).  Conflict-free rounds (the
        overwhelming case) pay one extra no-op RPC per shard."""

        def __init__(self, mode: str, cuckoo_buckets: int):
            self.state = SeenShardState(mode, cuckoo_buckets)
            self.claim1: Dict[str, str] = {}        # round-local key → first claimant
            self.claimN: Dict[str, List[str]] = {}  # keys with ≥2 distinct claimants
            self.forced: Dict[str, str] = {}        # key → replay winner host

        def try_add_batch(self, keys: Sequence[str],
                          claimant: str = None) -> List[bool]:
            if claimant is None:
                return self.state.try_add_batch(keys)
            out = []
            for k in keys:
                w = self.forced.get(k)
                if w is not None:
                    # forced keys are round-local by construction — log
                    # EVERY claim attempt (winners and losers) so the
                    # driver can verify the forced map is still the
                    # fixpoint for this replay's claim sets
                    lst = self.claimN.setdefault(k, [])
                    if claimant not in lst:
                        lst.append(claimant)
                    ok = claimant == w and self.state.try_add_batch([k])[0]
                else:
                    ok = self.state.try_add_batch([k])[0]
                    lst = self.claimN.get(k)
                    if lst is not None:
                        if claimant not in lst:
                            lst.append(claimant)
                    elif k in self.claim1:
                        if self.claim1[k] != claimant:
                            self.claimN[k] = [self.claim1.pop(k), claimant]
                    elif ok:
                        self.claim1[k] = claimant
                out.append(ok)
            return out

        def begin_round(self, forced: Dict[str, str]) -> None:
            self.claim1.clear()
            self.claimN.clear()
            self.forced = dict(forced)

        def round_claims(self) -> Dict[str, List[str]]:
            """Keys needing driver reconciliation: multi-claimant keys
            plus forced keys (even single/zero-claimant — the driver
            drops stale entries)."""
            out = dict(self.claimN)
            for k in self.forced:
                if k not in out:
                    c = self.claim1.get(k)
                    out[k] = [c] if c is not None else []
            return out

        def try_add_grouped(self, groups: Dict[str, List[str]]) -> Dict[str, List[bool]]:
            """Batched variant: {host: keys} in one RPC (round-end external
            merge uses this — one call per shard per round)."""
            return {h: self.state.try_add_batch(ks) for h, ks in groups.items()}

        def try_add_ordered(self, keys: List[str]) -> List[bool]:
            return self.state.try_add_batch(keys)

        def size(self) -> int:
            return self.state.url_count()

        def snapshot(self) -> bytes:
            return self.state.snapshot()

        def restore(self, blob: bytes) -> None:
            self.state = SeenShardState.restore(blob)
            # a restore is a round replay/retry reset — stale claims and
            # forced verdicts must not leak into the re-run (the driver
            # re-sends forced via begin_round)
            self.claim1.clear()
            self.claimN.clear()
            self.forced.clear()

        def snapshot_to(self, path: str) -> None:
            self.state.snapshot_to(path)

        def restore_from(self, path: str) -> None:
            self.state = SeenShardState.restore_from(path)
            self.claim1.clear()
            self.claimN.clear()
            self.forced.clear()

    class RaySeenPool:
        def __init__(self):
            self.num_shards = num_shards
            self.actors = [
                SeenShardActor.remote(mode, cuckoo_buckets) for _ in range(num_shards)
            ]

        def handle_for(self, host_norm: str):
            return self.actors[shard_of(host_norm, self.num_shards)]

        def try_add_batch(self, host_norm: str, keys: Sequence[str]) -> List[bool]:
            return ray.get(self.handle_for(host_norm).try_add_batch.remote(list(keys)))

        def try_add_grouped(self, groups: Dict[str, List[str]]) -> Dict[str, List[bool]]:
            """Route {host: keys} to shards, one RPC per touched shard."""
            by_shard: Dict[int, Dict[str, List[str]]] = {}
            for h, ks in groups.items():
                by_shard.setdefault(shard_of(h, self.num_shards), {})[h] = list(ks)
            futs = [
                self.actors[i].try_add_grouped.remote(g) for i, g in by_shard.items()
            ]
            out: Dict[str, List[bool]] = {}
            for res in ray.get(futs):
                out.update(res)
            return out

        def try_add_seq(self, pairs) -> List[bool]:
            """Ordered (routing_host, key) check+inserts; one RPC per
            touched shard, per-shard order preserved (disjoint keyspaces
            make per-shard order == global order)."""
            by_shard: Dict[int, List[int]] = {}
            for i, (h, _k) in enumerate(pairs):
                by_shard.setdefault(shard_of(h, self.num_shards), []).append(i)
            futs = {
                s: self.actors[s].try_add_ordered.remote(
                    [pairs[i][1] for i in idxs]
                )
                for s, idxs in by_shard.items()
            }
            out = [False] * len(pairs)
            for s, idxs in by_shard.items():
                for i, ok in zip(idxs, ray.get(futs[s])):
                    out[i] = ok
            return out

        def begin_round(self, forced_by_shard: List[Dict[str, str]] = None) -> None:
            """Clear per-round claim logs on every shard and install the
            replay's forced-verdict maps (empty maps on a fresh round)."""
            fb = forced_by_shard or [{} for _ in self.actors]
            ray.get([
                a.begin_round.remote(f) for a, f in zip(self.actors, fb)
            ])

        def round_claims(self) -> List[Dict[str, List[str]]]:
            """Per-shard {key: distinct claimant hosts} for keys needing
            reconciliation (one RPC per shard)."""
            return ray.get([a.round_claims.remote() for a in self.actors])

        def size(self) -> int:
            return sum(ray.get([a.size.remote() for a in self.actors]))

        def snapshots(self) -> List[bytes]:
            return ray.get([a.snapshot.remote() for a in self.actors])

        def restore(self, blobs: List[bytes]) -> None:
            ray.get([a.restore.remote(b) for a, b in zip(self.actors, blobs)])

        def snapshot_to_dir(self, cdir: str) -> None:
            """Each shard pickles AND writes its own snapshot file, all
            shards in parallel — the 100 TB shape (on a cluster, cdir is
            shared storage, the same contract as the wave Parquet dirs;
            blobs never ship through or serialize on the driver).  File
            names/bytes match the driver-side writer, so either side
            reads the other's checkpoints."""
            import os as _os

            ray.get([
                a.snapshot_to.remote(_os.path.join(cdir, f"seen_{i}.bin"))
                for i, a in enumerate(self.actors)
            ])

        def restore_from_dir(self, cdir: str) -> None:
            import os as _os

            ray.get([
                a.restore_from.remote(_os.path.join(cdir, f"seen_{i}.bin"))
                for i, a in enumerate(self.actors)
            ])

        def shutdown(self) -> None:
            for a in self.actors:
                ray.kill(a)
            self.actors = []

    return RaySeenPool()
