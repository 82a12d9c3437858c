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
that feeds the root, never concurrently with it.
"""

from __future__ import annotations

import json

TMP_NAME = "_compact_tmp"
MANIFEST_NAME = "_compact_manifest"


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
        fs.delete(hp(f"{root}/{name}"), True)
    if tmp_exists:
        fs.rename(hp(f"{root}/{TMP_NAME}"), hp(f"{root}/{target}"))
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


def list_children(spark, root: str, prefix: str) -> list[str]:
    """Child directory names of ``root`` starting with ``prefix``."""
    fs, hp = _fs(spark, root)
    return [
        st.getPath().getName()
        for st in fs.listStatus(hp(root))
        if st.getPath().getName().startswith(prefix)
    ]
