"""Manifest-addressed versioned state prefixes — shared by every
incremental operator that persists small key/stat state between batches
(near-dup band keys, BM25 corpus statistics).

Layout: ``<state_path>/MANIFEST`` (one line naming the live prefix) plus
``<state_path>/v-<hex>/`` parquet directories. The live state is named by
a POINTER FILE, never by directory renames: ``os.replace`` of the one
small manifest is atomic on POSIX/HDFS, and on an object store it is a
single-key PUT — whereas multi-key directory "renames" are non-atomic
copies. The live path therefore exists at every instant; no crash window
can make the state "look empty".

A root that holds committed parquet data we cannot resolve — version dirs
without a MANIFEST, or a MANIFEST naming a missing dir — RAISES instead
of returning "fresh": treating such a state as empty would silently
forget everything the state exists to remember (re-admitting seen
documents, zeroing document frequencies), the one failure mode an
incremental operator must never have. Crash drills are pinned in
tests/test_incremental_neardup.py.

Single-writer by design: the reference's watcher is a singleton cron
(fda_watcher.py scheduling), so batches and compactions are serialized.
"""

from __future__ import annotations

import os
import uuid

MANIFEST = "MANIFEST"


def write_manifest(state_path: str, version: str) -> None:
    """Atomically point the state's MANIFEST at ``version``.

    Written to a temp sibling then ``os.replace``d — atomic on POSIX;
    the object-store equivalent is one small-key PUT.
    """
    tmp = os.path.join(state_path, f".{MANIFEST}.tmp-{uuid.uuid4().hex[:8]}")
    with open(tmp, "w") as f:
        f.write(version + "\n")
        # fsync BEFORE the rename: with delayed allocation the rename can
        # become durable before the data blocks, leaving an empty MANIFEST
        # after power loss — exactly the "state looks empty" failure this
        # scheme exists to prevent
        f.flush()
        os.fsync(f.fileno())
    os.replace(tmp, os.path.join(state_path, MANIFEST))
    # make the rename itself durable
    dir_fd = os.open(state_path, os.O_RDONLY)
    try:
        os.fsync(dir_fd)
    finally:
        os.close(dir_fd)


def new_version_name() -> str:
    return f"v-{uuid.uuid4().hex[:12]}"


def live_version_dir(state_path: str, what: str = "state") -> str | None:
    """Resolve the LIVE version directory of a manifest-addressed state.

    Returns the live directory, or ``None`` only when the state is
    *provably* fresh (root missing/empty, or only data-less version dirs
    from a crashed first init). Unresolvable-but-committed data raises
    (see module docstring). ``what`` names the operator in error text.
    """
    if not os.path.isdir(state_path):
        return None
    names = os.listdir(state_path)
    manifest = os.path.join(state_path, MANIFEST)
    if os.path.isfile(manifest):
        with open(manifest) as f:
            version = f.read().strip()
        if not version.startswith("v-"):
            # empty/garbage pointer (e.g. truncated by power loss before
            # fsync-era manifests): joining '' would resolve to the state
            # root itself — raise the designed diagnostic instead
            raise RuntimeError(
                f"{what} MANIFEST at {manifest} holds {version!r}, not a "
                "version name — restore it from the latest v-* dir; "
                "refusing to treat state as empty"
            )
        live = os.path.join(state_path, version)
        if not os.path.isdir(live):
            raise RuntimeError(
                f"{what} MANIFEST names '{version}' but {live} does not "
                "exist — restore the version dir or the previous "
                "MANIFEST; refusing to treat state as empty"
            )
        return live
    versions = [n for n in names if n.startswith("v-")]

    def _has_parquet(d: str) -> bool:
        # recursive: a version may hold several parquet tables in subdirs
        # (e.g. corpus-stats' terms/ + totals/)
        for _root, _dirs, files in os.walk(d):
            if any(f.endswith(".parquet") for f in files):
                return True
        return False

    with_data = [v for v in versions if _has_parquet(os.path.join(state_path, v))]
    if with_data:
        raise RuntimeError(
            f"{what} at {state_path} has committed version dirs "
            f"{with_data} but no {MANIFEST} — a crashed first init or a "
            "deleted manifest; refusing to treat state as empty"
        )
    return None  # fresh (empty root, or only data-less init leftovers)


EPOCH_FILE = "_epoch"


def write_epoch(version_dir: str, epoch: int) -> None:
    """Record the micro-batch epoch INSIDE a version dir (before the
    manifest flip, so the epoch commits atomically with the data —
    a crash between them leaves an unreferenced dir, not a lie)."""
    p = os.path.join(version_dir, EPOCH_FILE)
    with open(p, "w") as f:
        f.write(str(epoch) + "\n")
        f.flush()
        os.fsync(f.fileno())


def applied_epoch(state_path: str, what: str = "state") -> int | None:
    """Epoch recorded in the LIVE version, or None (no state / no epoch).

    The idempotent-foreachBatch contract: a merge passed `epoch=` skips
    itself when applied_epoch >= epoch — Structured Streaming replays a
    failed micro-batch with the SAME epoch_id and data, so per-state
    epoch guards turn at-least-once replays into exactly-once state.
    """
    live = live_version_dir(state_path, what=what)
    if live is None:
        return None
    p = os.path.join(live, EPOCH_FILE)
    if not os.path.isfile(p):
        return None
    with open(p) as f:
        return int(f.read().strip())


def gc_orphans(state_path: str) -> list[str]:
    """Delete version dirs not named by the MANIFEST; returns removed names.

    The LISTING is taken first and the manifest read after: any version
    created later than the listing is never in the sweep set, so under
    the single-writer assumption (and even under a late-arriving second
    writer) the live dir cannot be deleted. Stale manifest temp files
    (crashed write_manifest) are swept too.
    """
    import shutil

    names = [
        n
        for n in (os.listdir(state_path) if os.path.isdir(state_path) else [])
        if n.startswith("v-") or n.startswith(f".{MANIFEST}.tmp-")
    ]
    live = live_version_dir(state_path)
    if live is None:
        return []
    live_name = os.path.basename(live)
    removed = []
    for n in names:
        if n == live_name:
            continue
        p = os.path.join(state_path, n)
        if os.path.isdir(p):
            shutil.rmtree(p)
        else:
            os.unlink(p)
        removed.append(n)
    return removed
