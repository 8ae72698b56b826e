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
(fda_watcher.py scheduling), so batches and compactions are serialized —
and since round 5 the assumption is ENFORCED, not assumed: every mutating
operator acquires `writer_lease` (pid+timestamp lease file, stale-lease
takeover) and a concurrent second writer raises instead of interleaving
manifest flips.
"""

from __future__ import annotations

import os
import time
import uuid
from contextlib import contextmanager

MANIFEST = "MANIFEST"
PREV_FILE = "_prev"
LEASE = "LEASE"


def _require_local(path: str) -> None:
    """This module's atomicity/durability arguments are implemented with
    local-FS ``os.*`` calls (``os.replace``, ``os.fsync``, ``O_EXCL``).
    Given an object-store/HDFS URI those calls would quietly report the
    state absent ("provably fresh") — the silent look-empty outcome the
    module exists to prevent — so non-local schemes are rejected loudly.
    The object-store port routes these few calls through conditional PUT /
    the Hadoop FileSystem API; the contract stays the same."""
    if "://" in path:
        raise ValueError(
            f"manifest state requires a local filesystem path, got {path!r} "
            "— the os.replace/fsync/O_EXCL atomicity this module relies on "
            "does not hold through a URI scheme; port these calls to the "
            "store's conditional-PUT API before pointing state there"
        )


def write_manifest(state_path: str, version: str) -> None:
    """Atomically point the state's MANIFEST at ``version``.

    Written to a temp sibling then ``os.replace``d — atomic on POSIX;
    the object-store equivalent is one small-key PUT.
    """
    _require_local(state_path)
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


def write_prev(version_dir: str, prev_version: str | None) -> None:
    """Record the superseded version's name INSIDE the new version dir
    (before the manifest flip, so it commits with the data).

    Why: `gc_orphans` retains live's predecessor, because a lazily
    evaluated reader (a DataFrame resolved against the old live before a
    merge ran) may still reference the old files mid-action — the
    single-writer lease serializes WRITERS, not readers. One generation
    of grace is the whole contract: a reader must not span two merges.
    """
    if prev_version is None:
        return
    p = os.path.join(version_dir, PREV_FILE)
    with open(p, "w") as f:
        f.write(prev_version + "\n")
        f.flush()
        os.fsync(f.fileno())


def prev_version_name(version_dir: str) -> str | None:
    p = os.path.join(version_dir, PREV_FILE)
    if not os.path.isfile(p):
        return None
    with open(p) as f:
        return f.read().strip() or None


@contextmanager
def writer_lease(state_path: str, what: str = "state", ttl_s: float = 3600.0):
    """Enforce the single-writer contract with a lease file.

    ``O_CREAT|O_EXCL`` makes acquisition atomic on a local FS; the file
    holds ``<token> <pid> <unix-ts>`` — the random token is the OWNERSHIP
    record. A live lease (mtime age <= ttl_s) makes the second writer
    RAISE — interleaved manifest flips would race GC against the other
    writer's un-flipped version dir. A stale lease (holder crashed
    without releasing) is taken over by an atomic RENAME-claim (of N
    concurrent takers exactly one rename succeeds; the claimed content
    is re-checked against the staleness read so a lease re-acquired
    mid-takeover is restored, not stolen) followed by one re-acquire
    attempt; a taker that loses any of those races raises rather than
    proceeding unlocked.

    Release is ownership-checked: the holder re-reads the lease and
    unlinks ONLY if the token is still its own, so a writer that was
    (wrongly or rightly) usurped after exceeding ttl_s cannot delete the
    usurper's lease and let a third writer in. ttl_s is therefore a hard
    bound the caller must respect: a merge/compaction expected to run
    longer than the default hour MUST pass a larger ttl_s — takeover of
    a lease whose holder is alive-but-slow leads to exactly the
    interleaved-flip corruption this lock exists to prevent (a
    heartbeat-refreshing lease is the object-store-era upgrade; the
    reference's singleton cron makes the static TTL sufficient here).
    Object-store port: conditional PUT (if-none-match) replaces O_EXCL,
    token-compare-and-delete replaces the checked unlink.
    """
    _require_local(state_path)
    os.makedirs(state_path, exist_ok=True)
    path = os.path.join(state_path, LEASE)
    token = uuid.uuid4().hex

    def _acquire() -> None:
        fd = os.open(path, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
        with os.fdopen(fd, "w") as f:
            f.write(f"{token} {os.getpid()} {time.time()}\n")
            f.flush()
            os.fsync(f.fileno())

    def _owns() -> bool:
        try:
            with open(path) as f:
                return f.read().split(" ", 1)[0] == token
        except FileNotFoundError:
            return False

    try:
        _acquire()
    except FileExistsError:
        # Read content and mtime off the SAME open fd so the staleness
        # verdict and the takeover claim refer to one inode, not two
        # reads racing a release/re-acquire.
        try:
            with open(path) as f:
                observed = f.read()
                age = time.time() - os.fstat(f.fileno()).st_mtime
        except FileNotFoundError:
            observed, age = None, float("inf")  # released between probe and open
        if age <= ttl_s:
            raise RuntimeError(
                f"{what} at {state_path} is locked by another writer "
                f"(LEASE age {age:.0f}s <= ttl {ttl_s:.0f}s) — the "
                "single-writer contract forbids concurrent merges/"
                "compactions; wait for the holder or, if it is known "
                "dead, remove the LEASE file"
            )
        # Stale: CLAIM it by atomic rename to a name only we use — of N
        # concurrent takers exactly one rename succeeds, so only one
        # taker ever removes the old lease (a bare unlink let taker A
        # delete taker B's freshly re-acquired lease and both proceed —
        # the round-5 advice race).
        if observed is not None:
            claim = os.path.join(state_path, f".{LEASE}.stale-{token}")
            try:
                os.rename(path, claim)
            except FileNotFoundError:
                pass  # another taker claimed it first; contend below
            else:
                with open(claim) as f:
                    claimed = f.read()
                if claimed != observed:
                    # Between our staleness read and the rename, the old
                    # holder released and a NEW writer acquired — we just
                    # stole a live lease. Put it back (hardlink: never
                    # clobbers a lease a third writer created meanwhile)
                    # and bow out.
                    try:
                        os.link(claim, path)
                    except FileExistsError:
                        pass
                    os.unlink(claim)
                    raise RuntimeError(
                        f"{what} at {state_path} is locked by another "
                        "writer (lease was re-acquired during takeover)"
                    )
                os.unlink(claim)
        _acquire()  # a concurrent taker winning here raises to caller
    try:
        yield
    finally:
        if _owns():
            try:
                os.unlink(path)
            except FileNotFoundError:
                pass


def live_version_dir(state_path: str, what: str = "state") -> str | None:
    """Resolve the LIVE version directory of a manifest-addressed state.

    Returns the live directory, or ``None`` only when the state is
    *provably* fresh (root missing/empty, or only data-less version dirs
    from a crashed first init). Unresolvable-but-committed data raises
    (see module docstring). ``what`` names the operator in error text.
    """
    _require_local(state_path)
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


def epoch_already_applied(state_path: str, what: str,
                          epoch: int | None) -> bool:
    """Shared epoch guard for every rewrite-style merge (rollup,
    histogram, corpus-stats, freq-sketch, hll-sketch): True when this
    exact epoch is already folded into the live version (replayed
    micro-batch — caller returns without touching state); raises when
    the state has applied a LATER epoch (the stream checkpoint was reset
    against existing state — epoch counters restart per checkpoint, and
    proceeding would double-count every batch)."""
    if epoch is None:
        return False
    done = applied_epoch(state_path, what=what)
    if done is None:
        return False
    if done == epoch:
        return True
    if done > epoch:
        raise RuntimeError(
            f"{what} at {state_path} already applied epoch {done} > "
            f"incoming {epoch} — the stream checkpoint was reset against "
            "existing state (epoch counters restart per checkpoint); "
            "restore the checkpoint or start a fresh state root"
        )
    return False


def commit_version(state_path: str, write_fn, *, epoch: int | None,
                   prev: str | None) -> str:
    """Shared version-commit ritual for rewrite-style merges: make a new
    version dir, let ``write_fn(vdir)`` populate it, record the epoch
    (inside the dir, so it commits atomically with the data via the
    flip) and the predecessor (reader-grace GC record), flip the
    MANIFEST, sweep orphans. Caller must hold the writer lease. Returns
    the new version dir."""
    os.makedirs(state_path, exist_ok=True)
    version = new_version_name()
    vdir = os.path.join(state_path, version)
    write_fn(vdir)
    if epoch is not None:
        write_epoch(vdir, epoch)
    write_prev(vdir, prev)
    write_manifest(state_path, version)
    gc_orphans(state_path)  # retains the predecessor for in-flight readers
    return vdir


def gc_orphans(state_path: str) -> list[str]:
    """Delete version dirs not named by the MANIFEST; returns removed names.

    The LISTING is taken first and the manifest read after: any version
    created later than the listing is never in the sweep set, so under
    the single-writer assumption (and even under a late-arriving second
    writer) the live dir cannot be deleted. Stale manifest temp files
    (crashed write_manifest) are swept too.

    Reader grace: the live version's recorded predecessor (its `_prev`
    file, written by the merge that superseded it) is RETAINED for one
    generation — a serving query whose DataFrame was resolved against
    the old live just before the flip can still finish; it is swept by
    the NEXT merge's GC. Readers therefore must not span two merges
    (collect within one merge interval) — that residual contract is
    documented here instead of a FileNotFound mid-action.
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
    keep = {live_name, prev_version_name(live)}
    removed = []
    for n in names:
        if n in keep:
            continue
        p = os.path.join(state_path, n)
        if os.path.isdir(p):
            shutil.rmtree(p)
        else:
            os.unlink(p)
        removed.append(n)
    return removed


# ---------------------------------------------------------------------------
# Epoch commit markers — atomic "this epoch's APPEND finished" records for
# states that accrete per-epoch files instead of rewriting a version.
#
# Why row presence is not a commit record: a multi-file parquet append's
# job commit (FileOutputCommitter) renames task outputs one by one — a
# crash mid-commit leaves a PARTIAL file set visible. If "any row with
# epoch N exists" is read as "epoch N done", the replayed micro-batch
# skips the append and the missing rows are lost forever (the round-4
# bug in both the near-dup key append and the ingest seen-keys append).
# The marker is one fsync'd hidden file (`_epoch-N.committed`, ignored
# by Spark's readers) written only AFTER the append's job commit
# returned, so its existence proves the full file set is visible; its
# absence makes the replay redo the (idempotent) write.
# ---------------------------------------------------------------------------


def _marker_path(dir_: str, epoch: int) -> str:
    return os.path.join(dir_, f"_epoch-{epoch}.committed")


def mark_epoch_committed(dir_: str, epoch: int) -> None:
    """Record that epoch's append fully committed (fsync'd, crash-durable)."""
    p = _marker_path(dir_, epoch)
    with open(p, "w") as f:
        f.write("1\n")
        f.flush()
        os.fsync(f.fileno())
    dir_fd = os.open(dir_, os.O_RDONLY)
    try:
        os.fsync(dir_fd)
    finally:
        os.close(dir_fd)


def epoch_is_committed(dir_: str, epoch: int) -> bool:
    return os.path.isfile(_marker_path(dir_, epoch))


def max_committed_epoch(dir_: str) -> int | None:
    """Highest epoch with a commit marker, or None. Epochs are assigned
    contiguously by Structured Streaming and commit in order, so 'all
    committed epochs' == 'epoch <= max marker' — one range predicate a
    partitioned read can prune with."""
    if not os.path.isdir(dir_):
        return None
    epochs = [
        int(n[len("_epoch-"):-len(".committed")])
        for n in os.listdir(dir_)
        if n.startswith("_epoch-") and n.endswith(".committed")
    ]
    return max(epochs) if epochs else None
