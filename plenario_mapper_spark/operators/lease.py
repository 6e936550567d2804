"""Single-writer lease for maintained tables (VERDICT r12 item 5).

operators/merge.py and operators/incremental.py are crash-safe for ONE
writer: the journaled staged-swap tolerates the writer dying at any step,
but two LIVE sessions merging the same table can interleave bucket renames
and silently lose one session's update. This module makes that contract
enforced instead of assumed: every mutating entry point takes a writer
lease on the table directory first, so the second concurrent writer fails
LOUDLY with ConcurrentWriterError instead of corrupting silently.

Mechanism — the strongest primitive a plain filesystem offers:

- acquire: atomic O_CREAT|O_EXCL create of `<table>.__writer_lease` — a
  SIBLING of the table directory, not inside it (a first-batch
  mode("overwrite") deletes the table dir wholesale and would clobber an
  in-dir lease mid-merge; merge staging dirs already follow this
  parent-level convention). Works on local fs, NFS v3+, and HDFS-like
  posix stores. The payload records owner id, pid, host, acquire time and
  TTL for diagnosability.
- contention: if the file exists and is younger than its TTL, raise — the
  caller must serialize (scheduler, retry, queue).
- crashed writer: a lease is STALE — broken by atomically renaming it aside
  (exactly one contender wins the rename; losers re-enter acquire and now
  contend on the winner's fresh lease) — when any of:
    (a) it is older than its TTL (the cross-host fallback),
    (b) its owner is THIS process but not currently registered in the
        in-process active set (a prior attempt in this process died without
        releasing — provably dead, no TTL wait), or
    (c) its owner pid on THIS host is no longer alive (kill(pid, 0) —
        process death is provable locally).
  The table itself is already consistent at takeover: the journal protocol
  rolls the dead writer's merge forward or back on the next touch.
- release: the owner deletes the file only after verifying the payload is
  its own (a broken-and-reacquired lease must not be deleted by the
  original owner coming back from a GC pause — the classic fencing hole;
  post-pause work by a zombie is NOT fenced beyond this check, which is the
  documented limit of file leases. A metadata-pointer table format is the
  upgrade path, same as for lock-free readers).

Object stores without atomic exclusive-create (S3 without conditional
writes) cannot run this protocol; there the single-writer contract must be
enforced by the scheduler, and this module's guard degrades to best-effort.
"""

from __future__ import annotations

import json
import os
import socket
import time
import uuid
from contextlib import contextmanager

LEASE_SUFFIX = ".__writer_lease"
DEFAULT_TTL_SEC = 600.0


def lease_path_for(path: str) -> str:
    """The lease file guarding table directory `path` (sibling, see module
    docstring)."""
    return path.rstrip("/") + LEASE_SUFFIX


class ConcurrentWriterError(RuntimeError):
    """A live writer already holds the table's lease."""


# Owners of leases currently HELD by this process (registered on acquire,
# deregistered on release). A disk lease claiming this pid whose owner is
# not in here is a leftover from an attempt that died without releasing —
# stale with no TTL wait.
_ACTIVE: set[str] = set()


def _is_stale(cur: dict) -> bool:
    age = time.time() - float(cur.get("acquired_unix") or 0)
    if age > float(cur.get("ttl_sec") or DEFAULT_TTL_SEC):
        return True
    if cur.get("host") == socket.gethostname():
        if cur.get("pid") == os.getpid():
            return cur.get("owner") not in _ACTIVE
        try:
            os.kill(int(cur["pid"]), 0)
        except (OSError, TypeError, ValueError, KeyError):
            return True  # pid gone (or unreadable payload): provably dead
    return False


def _read_lease(lease_path: str) -> dict | None:
    try:
        with open(lease_path) as fh:
            return json.load(fh)
    except (OSError, ValueError):
        # unreadable/torn lease: treat as present but opaque; age from mtime
        try:
            return {"acquired_unix": os.stat(lease_path).st_mtime, "opaque": True}
        except OSError:
            return None  # vanished between exists-check and read


@contextmanager
def writer_lease(path: str, ttl_sec: float = DEFAULT_TTL_SEC, owner: str | None = None):
    """Hold the single-writer lease on table directory `path` for the block.

    Raises ConcurrentWriterError if a live (younger-than-TTL) lease exists.
    Breaks a stale lease atomically and retries. Always releases its OWN
    lease on exit, even on error."""
    parent = os.path.dirname(path.rstrip("/")) or "."
    os.makedirs(parent, exist_ok=True)
    lease_path = lease_path_for(path)
    my = {
        "owner": owner or f"{socket.gethostname()}:{os.getpid()}:{uuid.uuid4().hex[:8]}",
        "pid": os.getpid(),
        "host": socket.gethostname(),
        "acquired_unix": None,  # stamped at create
        "ttl_sec": float(ttl_sec),
    }
    for _ in range(8):  # bounded stale-break retries, then surface the error
        try:
            fd = os.open(lease_path, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
        except FileExistsError:
            cur = _read_lease(lease_path)
            if cur is None:
                continue  # holder released between our attempts: retry
            if not _is_stale(cur):
                age = time.time() - float(cur.get("acquired_unix") or 0)
                raise ConcurrentWriterError(
                    f"table {path} is being written by {cur.get('owner', '<unknown>')} "
                    f"(lease age {age:.0f}s, live); concurrent "
                    "merges would interleave bucket swaps — serialize writers"
                ) from None
            # stale: exactly one contender wins this rename and retries into
            # a clean create; losers see FileExistsError next round
            try:
                os.rename(lease_path, lease_path + f".stale-{uuid.uuid4().hex[:8]}")
            except OSError:
                pass
            continue
        try:
            my["acquired_unix"] = time.time()
            os.write(fd, json.dumps(my).encode())
            os.fsync(fd)
        finally:
            os.close(fd)
        break
    else:
        raise ConcurrentWriterError(f"could not acquire lease on {path}")
    _ACTIVE.add(my["owner"])
    try:
        yield my["owner"]
    finally:
        _ACTIVE.discard(my["owner"])
        cur = _read_lease(lease_path)
        if cur is not None and cur.get("owner") == my["owner"]:
            try:
                os.remove(lease_path)
            except OSError:
                pass
        # sweep any stale-broken leftovers we may have created
        try:
            base = os.path.basename(lease_path)
            for f in os.listdir(parent):
                if f.startswith(base + ".stale-"):
                    os.remove(os.path.join(parent, f))
        except OSError:
            pass
