"""Multi-table snapshot publish: manifest-pointer two-phase commit.

The plain-parquet answer to "readers must never see table A from batch
N and table B from batch N−1": every publish writes all tables into a
fresh versioned directory, then atomically swaps a single MANIFEST
pointer file (os.replace — atomic on POSIX) naming the new version.
Readers resolve tables only through the manifest, so they observe a
complete snapshot or the previous one — never a mix. This is the
Iceberg/Delta commit-pointer idea reduced to what a plain filesystem
provides (a root pointer + immutable versioned data); without those
jars in the sandbox it is the strongest multi-table consistency
available (see ARCHITECTURE.md on the missing ACID formats).

Old versions stay on disk for in-flight readers; `prune_versions`
removes all but the newest K once their reader grace period is over.
"""

from __future__ import annotations

import json
import os
import tempfile

from pyspark.sql import DataFrame, SparkSession

MANIFEST = "MANIFEST.json"
_VMANIFEST = "_VERSION_MANIFEST.json"


def publish_snapshot(
    tables: dict[str, DataFrame],
    root: str,
) -> int:
    """Write all `tables` as version N+1 and atomically flip the
    manifest pointer. Returns the published version number.

    Phase 1 writes every table under `root/v{N+1}/` plus a per-version
    manifest as the LAST phase-1 step (crash before it leaves an orphan
    directory with no version manifest — recognizably incomplete, never
    a visible partial snapshot); phase 2 is a single `os.replace` of
    the root manifest. A pre-existing `v{N+1}` can only be a crashed
    earlier attempt (the committed version is `current_version`), so it
    is cleared first — a successful publish after a crash can't mix the
    two attempts' files, and `read_snapshot(version=N)` resolves
    through the per-version manifest, not `os.listdir`."""
    import shutil

    os.makedirs(root, exist_ok=True)
    version = current_version(root) + 1
    vdir = os.path.join(root, f"v{version}")
    if os.path.isdir(vdir):  # orphan of a crashed attempt — never committed
        shutil.rmtree(vdir)
    manifest = {
        "version": version,
        "tables": {name: f"v{version}/{name}.parquet" for name in tables},
    }
    for name, df in tables.items():
        df.write.mode("overwrite").parquet(os.path.join(vdir, f"{name}.parquet"))
    with open(os.path.join(vdir, _VMANIFEST), "w") as f:
        json.dump(manifest, f)
    fd, tmp = tempfile.mkstemp(dir=root, suffix=".manifest-tmp")
    with os.fdopen(fd, "w") as f:
        json.dump(manifest, f)
    os.replace(tmp, os.path.join(root, MANIFEST))
    return version


def current_version(root: str) -> int:
    path = os.path.join(root, MANIFEST)
    if not os.path.exists(path):
        return 0
    with open(path) as f:
        return int(json.load(f)["version"])


def read_snapshot(
    spark: SparkSession, root: str, *, version: int | None = None
) -> dict[str, DataFrame]:
    """Resolve every table through the manifest — one consistent
    version for all tables, pinned at read time (later publishes don't
    retarget already-created DataFrames: the resolved paths are
    versioned and immutable).

    `version=N` time-travels to any still-on-disk historical version
    (versions survive until `prune_versions` removes them), resolving
    through the per-version manifest written as the last phase-1 step
    — an orphan directory from a crashed publish has none, so it reads
    as "not published" instead of a mixed-attempt table list."""
    if version is None:
        with open(os.path.join(root, MANIFEST)) as f:
            manifest = json.load(f)
    else:
        vdir = os.path.join(root, f"v{version}")
        vman = os.path.join(vdir, _VMANIFEST)
        if not os.path.isfile(vman):
            raise FileNotFoundError(
                f"snapshot v{version} is not on disk "
                "(pruned, never published, or a crashed partial attempt)"
            )
        with open(vman) as f:
            manifest = json.load(f)
    return {
        name: spark.read.parquet(os.path.join(root, rel))
        for name, rel in manifest["tables"].items()
    }


def prune_versions(root: str, *, keep: int = 2) -> list[str]:
    """Drop versioned directories older than the newest `keep`
    (never the manifest's current target). Returns removed dirs."""
    import shutil

    current = current_version(root)
    removed = []
    versions = sorted(
        (
            int(d[1:])
            for d in os.listdir(root)
            if d.startswith("v") and d[1:].isdigit()
        ),
        reverse=True,
    )
    for v in versions[keep:]:
        if v == current:
            continue
        shutil.rmtree(os.path.join(root, f"v{v}"), ignore_errors=True)
        removed.append(f"v{v}")
    return removed


def gc_orphan_versions(root: str) -> list[str]:
    """Remove crashed-publish leftovers: versioned dirs with no
    per-version manifest (phase 1 never finished, so they were never
    readable). `prune_versions` keeps the newest K by number and would
    preserve a high-numbered orphan forever; this targets exactly the
    unreadable ones. Run it only when no publish is in flight — the
    in-flight attempt's directory looks identical to an orphan until
    its manifest lands."""
    import shutil

    removed = []
    for d in sorted(os.listdir(root)):
        if not (d.startswith("v") and d[1:].isdigit()):
            continue
        vdir = os.path.join(root, d)
        if not os.path.isfile(os.path.join(vdir, _VMANIFEST)):
            shutil.rmtree(vdir, ignore_errors=True)
            removed.append(d)
    return removed
