"""Per-application scratch directories with stale-sibling sweeping.

Queries that materialize intermediate datasets (the OSM XML round trip,
the streaming incremental-dedup landing/store/checkpoint) need paths that
are (a) unique per Spark application — two concurrent gate runs must not
race on overwrite-while-read — and (b) bounded over time: unique-per-app
paths are never revisited, so without sweeping, repeated bench/gate/pytest
rounds fill /tmp. `scratch_dir` gives the unique path and removes SIBLING
dirs of the same prefix older than `max_age_s` (old enough that no live
run is still reading them; a just-started concurrent app's dir is young
and untouched)."""

from __future__ import annotations

import os
import shutil
import time


def _is_stale(root: str, cutoff: float) -> bool:
    """True when NOTHING under `root` has been modified since `cutoff`.
    A run longer than the sweep age that only writes inside nested subdirs
    (streaming store/checkpoint batch dirs) never refreshes the top-level
    mtime, so staleness is judged by the newest mtime found in a walk —
    aborting early (not stale) the moment any fresh entry is seen, which
    makes the live-dir case cheap."""
    try:
        if os.path.getmtime(root) > cutoff:
            return False
        for dirpath, dirnames, filenames in os.walk(root):
            for name in dirnames + filenames:
                try:
                    if os.path.getmtime(os.path.join(dirpath, name)) > cutoff:
                        return False
                except OSError:
                    continue
    except OSError:
        return False
    return True


def scratch_dir(prefix: str, app_id: str, base: str = "/tmp",
                max_age_s: int = 2 * 3600) -> str:
    """`<base>/<prefix>_<app_id>` (removed if it pre-exists from this same
    app), sweeping `<prefix>_*` siblings whose ENTIRE tree is older than
    max_age_s."""
    mine = os.path.join(base, f"{prefix}_{app_id}")
    cutoff = time.time() - max_age_s
    try:
        for d in os.listdir(base):
            if not d.startswith(prefix + "_") or d == os.path.basename(mine):
                continue
            p = os.path.join(base, d)
            if _is_stale(p, cutoff):
                shutil.rmtree(p, ignore_errors=True)
    except OSError:
        pass
    shutil.rmtree(mine, ignore_errors=True)
    return mine


__all__ = ["scratch_dir"]
