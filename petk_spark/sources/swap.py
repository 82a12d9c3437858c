"""Crash-safe folding of partition-directory families.

Both maintenance folds in this engine — the streaming partial store's
``compact_store`` and the IVF index's ``compact_ivf_index`` — share one
problem: replace N child directories of a root with ONE rewritten child
such that a crash at any point leaves readers either on the old state
or the new state, never double-counting and never losing a committed
fold. This module is that choreography, factored once:

1. the replacement data is written to ``root/_compact_tmp`` — the
   underscore prefix makes it invisible to parquet partition discovery,
   so readers are unaffected while it builds;
2. a WRITE-AHEAD MANIFEST (``root/_compact_manifest``, one committed
   text row listing the folded child names and the target name) is the
   commit point;
3. the folded children are deleted and the temp directory renamed into
   place, then the manifest is removed.

A crash before 2 leaves debris (cleared on the next call); a crash
after 2 is completed by :func:`recover_pending_swap` at the next
entry. Directory operations go through the Hadoop FileSystem API, so
the protocol holds on HDFS/S3A paths, not just local disk. Contract:
SINGLE WRITER — run folds from the same maintenance loop as the sink
that feeds the root, never concurrently with it. The contract is now
ENFORCED best-effort by a lock file (:func:`acquire_lock`): a second
concurrent fold errors loudly (:class:`FoldInProgressError`) instead
of corrupting silently. The lock is a lease — a writer that dies
without releasing it (kill -9) blocks later writers only until
``stale_after_s`` elapses, after which the lock is broken and the
manifest-driven recovery makes the outcome correct either way.
"""

from __future__ import annotations

import json
import time

TMP_NAME = "_compact_tmp"
MANIFEST_NAME = "_compact_manifest"
LOCK_NAME = "_compact_lock"

#: Default lease age (seconds) after which a leftover lock file is
#: presumed to belong to a dead writer and may be broken. Folds are
#: maintenance-loop operations measured in seconds-to-minutes; an hour
#: is conservatively past any live fold on the declared deployments.
DEFAULT_LOCK_STALE_S = 3600.0


class FoldInProgressError(RuntimeError):
    """Another fold holds the lock on this root (or a crashed writer's
    lock has not yet aged past the lease)."""


def _fs(spark, path: str):
    jvm = spark._jvm
    hadoop_path = jvm.org.apache.hadoop.fs.Path
    return hadoop_path(path).getFileSystem(
        spark._jsc.hadoopConfiguration()
    ), hadoop_path


def _finish(spark, root: str, folded: list[str], target: str) -> None:
    fs, hp = _fs(spark, root)
    # Ordering invariant: the temp dir is written BEFORE the manifest
    # and consumed (renamed to target) as the LAST data step. So with
    # the manifest present, a missing temp means the rename already
    # happened — the target directory holds the NEW data and must NOT
    # be deleted even though it appears in the folded list (it names
    # both the old child being replaced and the new child replacing
    # it). Deleting it unconditionally lost the committed fold when a
    # crash landed between the rename and the manifest delete — caught
    # by the crash-matrix test.
    tmp_exists = fs.exists(hp(f"{root}/{TMP_NAME}"))
    for name in folded:
        if name == target and not tmp_exists:
            continue
        # Hadoop FileSystem reports many failures by RETURNING FALSE
        # rather than raising (round-7 advisory). A false delete is
        # fine when the path is already gone (idempotent recovery
        # redo); a false delete that leaves the path in place must
        # abort BEFORE the manifest is removed, or the fold would
        # half-apply and then be forgotten.
        p = hp(f"{root}/{name}")
        if not fs.delete(p, True) and fs.exists(p):
            raise IOError(
                f"fold aborted: could not delete {root}/{name}; "
                "manifest left in place for recover_pending_swap"
            )
    if tmp_exists:
        # Same false-return trap for rename: deleting the manifest
        # after a silently-failed rename would let the next
        # clear_tmp() wipe the committed fold's replacement data.
        if not fs.rename(hp(f"{root}/{TMP_NAME}"), hp(f"{root}/{target}")):
            raise IOError(
                f"fold aborted: rename {root}/{TMP_NAME} -> "
                f"{root}/{target} failed; manifest left in place for "
                "recover_pending_swap"
            )
    fs.delete(hp(f"{root}/{MANIFEST_NAME}"), True)


def recover_pending_swap(spark, root: str) -> None:
    """Complete (or clear) a fold interrupted by a crash. A manifest
    with a committed row means the fold is committed — redo the
    deletes/rename (idempotent). An EMPTY manifest directory (crash
    mid-write, before the text commit) means the commit point was
    never reached: the root is untouched and the debris is cleared."""
    fs, hp = _fs(spark, root)
    if not fs.exists(hp(f"{root}/{MANIFEST_NAME}")):
        return
    rows = spark.read.text(f"{root}/{MANIFEST_NAME}").collect()
    if rows:
        m = json.loads(rows[0][0])
        _finish(spark, root, m["folded"], m["target"])
    else:
        fs.delete(hp(f"{root}/{MANIFEST_NAME}"), True)


def committed_swap(spark, root: str, folded: list[str], target: str) -> None:
    """Commit and execute a fold whose replacement data has already
    been written to ``root/_compact_tmp`` by the caller. ``folded``
    are child directory names to delete (the existing ``target``, if
    any, must be among them); ``target`` is the name the temp
    directory takes."""
    payload = json.dumps({"folded": folded, "target": target})
    spark.createDataFrame([(payload,)], "v string").coalesce(1).write.mode(
        "overwrite"
    ).text(f"{root}/{MANIFEST_NAME}")  # ── commit point
    _finish(spark, root, folded, target)


def clear_tmp(spark, root: str) -> str:
    """Remove any leftover temp directory and return its path for the
    caller to write the replacement data into."""
    fs, hp = _fs(spark, root)
    fs.delete(hp(f"{root}/{TMP_NAME}"), True)
    return f"{root}/{TMP_NAME}"


def _exc_is_already_exists(exc) -> bool:
    """True when a Py4J-wrapped filesystem exception means "the lock
    file already exists" — Hadoop's ``FileAlreadyExistsException`` (or
    HDFS's lease-era ``AlreadyBeingCreatedException``) anywhere in the
    Java cause chain. Anything else — permissions, quota, network — is
    a genuine IO failure that must surface as itself, not be dressed
    up as a lease conflict (round-7 advisory)."""
    je = getattr(exc, "java_exception", None)
    if je is None:
        # non-Py4J wrapper (e.g. local test double) — message fallback
        return "already exists" in str(exc).lower()
    for _ in range(8):  # bounded cause-chain walk
        if je is None:
            return False
        name = je.getClass().getName()
        if "AlreadyExists" in name or "AlreadyBeingCreated" in name:
            return True
        je = je.getCause()
    return False


def _exc_is_not_found(exc) -> bool:
    """True when a Py4J-wrapped filesystem exception means "the source
    path does not exist" (FileNotFoundException in the cause chain)."""
    je = getattr(exc, "java_exception", None)
    if je is None:
        return "not exist" in str(exc).lower() or "not found" in str(exc).lower()
    for _ in range(8):
        if je is None:
            return False
        if "NotFound" in je.getClass().getName():
            return True
        je = je.getCause()
    return False


def _break_stale_lock(
    fs, hp, root: str, stale_after_s: float
) -> None:
    """Break a lease-expired lock via ATOMIC RENAME to a unique
    tombstone, not delete-then-create (round-7 verdict): with delete,
    two breakers that both observed the stale lock could interleave so
    the second's delete removed the first's FRESHLY created lock,
    after which both believed they held the lease. Rename has exactly
    one winner per lock-file instance — the loser's rename returns
    False (source gone) and it backs off loudly. The winner then
    re-checks the age of what it grabbed: if the tombstone is FRESH, a
    rival completed break+create in the meantime and we just stole a
    LIVE lock — restore it by renaming back and back off. Residual
    (documented): with three simultaneous breakers the restore can
    collide with a third create, leaving two leases; that needs a
    >lease-old orphan plus sub-millisecond triple interleaving, and
    the write-ahead manifest still bounds the damage to a loud
    recovery."""
    import uuid

    lock = hp(f"{root}/{LOCK_NAME}")
    tomb = hp(f"{root}/{LOCK_NAME}.stale-{uuid.uuid4().hex}")
    try:
        won = fs.rename(lock, tomb)
    except Exception as exc:
        # source-vanished is reported inconsistently across FS impls:
        # HDFS renames return False, RawLocalFileSystem THROWS
        # FileNotFoundException — both mean the same thing here (a
        # rival breaker renamed the stale lock first)
        if not _exc_is_not_found(exc):
            raise
        won = False
    if not won:
        raise FoldInProgressError(
            f"lost the stale-lock break race for {root}/{LOCK_NAME}: "
            "another breaker renamed it first"
        )
    # rename preserves mtime, so the tombstone carries the age of
    # whatever file was actually at the lock path when WE renamed it.
    tomb_age_s = (
        time.time() * 1000.0 - fs.getFileStatus(tomb).getModificationTime()
    ) / 1000.0
    if tomb_age_s < stale_after_s:
        if not fs.rename(tomb, lock):
            # a third writer created at the path meanwhile — drop the
            # tombstone; the live holders' manifests stay recoverable
            fs.delete(tomb, False)
        raise FoldInProgressError(
            f"stale-lock break on {root}/{LOCK_NAME} grabbed a FRESH "
            f"lock (age {tomb_age_s:.1f}s) — a rival breaker already "
            "re-acquired; restored it and backing off"
        )
    fs.delete(tomb, False)


def acquire_lock(
    spark, root: str, stale_after_s: float = DEFAULT_LOCK_STALE_S
) -> str:
    """Take the fold lock on ``root`` or raise
    :class:`FoldInProgressError`; returns an OWNER TOKEN the caller
    passes back to :func:`release_lock`. The lock is an atomic
    create-fail-if-exists file through the Hadoop FS API (the same
    primitive HDFS/S3A-backed job committers use), so two concurrent
    folds cannot both win. A leftover lock older than
    ``stale_after_s`` is presumed orphaned by a dead writer and
    broken (via :func:`_break_stale_lock`'s single-winner rename) —
    the write-ahead manifest, not the lock, is what makes the fold
    itself crash-safe; the lock only turns CONCURRENT folds from
    silent corruption into a loud error.

    Owner token (round-9, shrinking the documented triple-breaker
    residual): the winner stamps a uuid into the lock file and
    token-verified release refuses to delete a lock it does not own.
    In the two-lease interleaving (a breaker steals a FRESH lock,
    its restore collides with a third create) the victim's eventual
    ``release_lock(token)`` now leaves the innocent third holder's
    lease intact instead of cascading the theft — the residual's
    damage is bounded to the two racers, whose manifests keep the
    outcome recoverable. The steal itself remains possible (closing
    it needs an FS compare-and-swap no Hadoop scheme offers); it is
    still documented in :func:`_break_stale_lock`."""
    fs, hp = _fs(spark, root)
    lock = hp(f"{root}/{LOCK_NAME}")
    if fs.exists(lock):
        try:
            age_s = (
                time.time() * 1000.0
                - fs.getFileStatus(lock).getModificationTime()
            ) / 1000.0
        except Exception as exc:
            # the lock vanished between exists() and getFileStatus()
            # (its holder released) — treat as absent and fall through
            # to the atomic create, which still decides the winner
            # (found by the thread-contention stress test)
            if not _exc_is_not_found(exc):
                raise
            age_s = None
        if age_s is not None and age_s < stale_after_s:
            raise FoldInProgressError(
                f"another fold holds {root}/{LOCK_NAME} "
                f"(age {age_s:.1f}s < lease {stale_after_s:.0f}s); "
                "folds are single-writer — if the previous writer is "
                "dead, wait out the lease or delete the lock file"
            )
        if age_s is not None:
            _break_stale_lock(fs, hp, root, stale_after_s)
    if not _atomic_create(spark, fs, lock):
        raise FoldInProgressError(
            f"lost the race for {root}/{LOCK_NAME}: "
            "another fold created it first"
        )
    import uuid

    token = uuid.uuid4().hex
    try:
        # Overwrite-stamp is safe: the file exists (we just created
        # it), so no rival can win an exclusive create meanwhile, and
        # a breaker only touches locks past the lease age.
        out = fs.create(lock, True)
        out.write(bytearray(token.encode("ascii")))
        out.close()
    except Exception:
        fs.delete(lock, False)  # best-effort: do not strand the lease
        raise
    return token


def _atomic_create(spark, fs, lock) -> bool:
    """Create ``lock`` exclusively; True iff WE created it. Scheme
    dispatch because exclusivity comes from different primitives:

    * ``file`` — Hadoop's ``RawLocalFileSystem.create(overwrite=False)``
      is CHECK-then-act (an ``exists()`` probe, then a plain open), so
      under real contention multiple creators all pass the probe — the
      thread-contention stress test measured 8 simultaneous "winners".
      ``java.io.File.createNewFile`` is the POSIX ``O_CREAT|O_EXCL``
      primitive: exactly one creator returns true.
    * everything else (``hdfs`` etc.) — ``create(overwrite=False)`` is
      atomic at the metadata service and throws AlreadyExists for
      losers. (On object stores without atomic create-if-absent the
      lock degrades to best-effort — the write-ahead manifest, not the
      lock, is what keeps a lost race recoverable.)"""
    uri = lock.toUri()
    if uri.getScheme() in (None, "file"):
        jfile = spark._jvm.java.io.File(uri.getPath())
        parent = jfile.getParentFile()
        if parent is not None:
            parent.mkdirs()  # idempotent; createNewFile needs the dir
        return bool(jfile.createNewFile())
    try:
        out = fs.create(lock, False)
        out.close()
        return True
    except Exception as exc:  # Py4J wraps the Java exception
        if not _exc_is_already_exists(exc):
            raise
        return False


def _read_owner(fs, lock) -> str | None:
    """The owner token stamped in ``lock``, '' if unstamped (a rival
    mid-acquire), None if the lock is gone."""
    try:
        stream = fs.open(lock)
    except Exception as exc:
        if _exc_is_not_found(exc):
            return None
        raise
    try:
        out = bytearray()
        b = stream.read()
        while b != -1 and len(out) < 64:  # tokens are 32 hex chars
            out.append(b)
            b = stream.read()
        return out.decode("ascii", errors="replace")
    except Exception:
        # unreadable content (torn write, checksum mismatch) — owner
        # unknown, so a token-verified release must NOT delete it; the
        # lease ages out via the stale break like any orphan
        return ""
    finally:
        stream.close()


def release_lock(spark, root: str, token: str | None = None) -> bool:
    """Drop the fold lock; True iff it is gone afterwards. With a
    ``token`` (what :func:`acquire_lock` returned) the delete is
    OWNER-VERIFIED: a lock stamped with someone else's token is left
    in place and False is returned — so a writer whose lease was
    stolen by the documented triple-breaker interleaving cannot
    cascade the theft onto the current holder. ``token=None`` deletes
    unconditionally (an operator manually clearing a dead lock)."""
    fs, hp = _fs(spark, root)
    lock = hp(f"{root}/{LOCK_NAME}")
    if token is not None:
        owner = _read_owner(fs, lock)
        if owner is None:
            return True
        if owner != token:
            return False
    fs.delete(lock, False)
    return True


def recover_for_read(
    spark, root: str, stale_after_s: float = DEFAULT_LOCK_STALE_S
) -> None:
    """Reader-side recovery: called at the top of read paths
    (``profile_from_store``, ``query_ivf_index``, …) so a crashed
    writer's committed-but-unfinished fold is completed BEFORE the
    root is read — without it a reader between the child deletes and
    the rename would silently undercount (round-7 advisory). Cost when
    nothing is pending: one ``exists()`` check. If a manifest exists
    while a LIVE writer holds the lock, the writer is mid-commit and
    racing it would double-apply the finish steps — the reader raises
    :class:`FoldInProgressError` instead (retry after the fold's
    seconds-long window). Recovery itself runs under the lock so two
    concurrent readers cannot both replay the finish."""
    fs, hp = _fs(spark, root)
    if not fs.exists(hp(f"{root}/{MANIFEST_NAME}")):
        return
    tok = acquire_lock(spark, root, stale_after_s)
    try:
        recover_pending_swap(spark, root)
    finally:
        release_lock(spark, root, tok)


def list_children(spark, root: str, prefix: str) -> list[str]:
    """Child directory names of ``root`` starting with ``prefix``."""
    fs, hp = _fs(spark, root)
    return [
        st.getPath().getName()
        for st in fs.listStatus(hp(root))
        if st.getPath().getName().startswith(prefix)
    ]
