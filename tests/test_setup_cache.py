"""Unit tests for the untimed-setup cache hygiene (ADVICE r8): sibling
pruning must respect a grace window (a live process may still be lazily
reading a key it was just handed) and crashed builds' .tmp.<pid> dirs
must be collected once their pid is gone. No Spark session needed."""

from __future__ import annotations

import os
import time

from cdc_poc_spark.plans import registry as reg


def _mk(root, name, done_age=None):
    p = os.path.join(str(root), name)
    os.makedirs(p)
    if done_age is not None:
        d = os.path.join(p, "_DONE")
        with open(d, "w") as f:
            f.write("fp")
        t = time.time() - done_age
        os.utime(d, (t, t))
    return p


def test_prune_grace_window_and_dead_pid_tmp(tmp_path, monkeypatch):
    monkeypatch.setattr(reg, "_SETUP_CACHE_ROOT", str(tmp_path))
    # completed sibling with a FRESH _DONE: a concurrent process may hold
    # its path from its own setup call — must survive the prune
    fresh = _mk(tmp_path, "incr_clusters-aaaa-old1", done_age=1)
    # sibling aged past the grace window: genuinely superseded, collected
    aged = _mk(
        tmp_path, "incr_clusters-aaaa-old2", done_age=reg._SETUP_PRUNE_GRACE_S + 60
    )
    # half-assembled orphan (no _DONE, no .tmp suffix): collected
    orphan = _mk(tmp_path, "incr_clusters-aaaa-old3")
    # other sf_dir tag / other family: never touched, however old
    other_sf = _mk(tmp_path, "incr_clusters-bbbb-k", done_age=10**6)
    other_fam = _mk(tmp_path, "other_family-aaaa-k", done_age=10**6)
    # in-flight build of a LIVE pid: kept; crashed build (dead pid): gone
    live_tmp = _mk(tmp_path, f"incr_clusters-aaaa-k.tmp.{os.getpid()}")
    dead_tmp = _mk(tmp_path, "incr_clusters-aaaa-k.tmp.999999999")
    # the key being (re)built is never pruned, regardless of age
    leaf = _mk(tmp_path, "incr_clusters-aaaa-leaf", done_age=10**6)

    reg._prune_setup_cache("incr_clusters", "aaaa", "incr_clusters-aaaa-leaf")

    assert os.path.exists(fresh)
    assert os.path.exists(live_tmp)
    assert os.path.exists(other_sf)
    assert os.path.exists(other_fam)
    assert os.path.exists(leaf)
    assert not os.path.exists(aged)
    assert not os.path.exists(orphan)
    assert not os.path.exists(dead_tmp)


def test_pid_alive_probe():
    assert reg._pid_alive(os.getpid())
    assert not reg._pid_alive(999999999)
