"""Shared machinery of the epoch-partitioned fold convention used by
streaming/scd2, streaming/rollup, and streaming/index_incremental:
each micro-batch overwrites its own epoch=<id> parquet directory
(checkpoint-recovery replays are idempotent), and snapshots merge on
read."""

from __future__ import annotations


def epoch_dirs(spark, base: str) -> list[tuple[int, str]]:
    """(epoch, path) under base via the Hadoop FS API (any scheme);
    [] when the base does not exist yet."""
    jvm = spark._jvm
    jpath = jvm.org.apache.hadoop.fs.Path(base)
    fs = jpath.getFileSystem(spark._jsc.hadoopConfiguration())
    if not fs.exists(jpath):
        return []
    out = []
    for st in fs.listStatus(jpath):
        name = st.getPath().getName()
        if name.startswith("epoch="):
            out.append((int(name.split("=", 1)[1]), str(st.getPath())))
    return sorted(out)


def guard_epoch_monotonic(spark, state_dir: str, epoch_id: int, what: str) -> None:
    """Refuse a fold whose state already holds epochs NEWER than the
    current trigger: that means the checkpoint was reset against a
    retained state_dir, and folding would silently mix stale epochs
    into every merge-on-read snapshot (same loud refusal as
    scd2_fold_batch; replays of the CURRENT epoch remain fine — they
    overwrite their own directory)."""
    if any(e > int(epoch_id) for e, _ in epoch_dirs(spark, state_dir)):
        raise ValueError(
            f"{what}: state_dir contains epochs newer than the current "
            "trigger — the checkpoint was reset against an existing "
            "state directory. Resume with the original checkpoint, or "
            "fold into a fresh directory."
        )
