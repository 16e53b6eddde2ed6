"""Runtime package shipping — the `spark-submit --py-files` contract.

In production the job ships as `spark-submit --py-files osm2mp_spark.zip`
(north rule). When the engine is driven from an interactive session instead,
`ensure_shipped(spark)` builds the same zip once and registers it with
`sparkContext.addPyFile`, so executor Python workers can unpickle broadcast
indexes and Arrow UDF closures that reference this package.
"""

from __future__ import annotations

import os
import zipfile

_FLAG = "_osm2mp_spark_shipped"


def build_zip(out_path: str | None = None) -> str:
    """Zip the package deterministically (stable entry order + timestamps).

    If the package itself was imported FROM a zip (spark-submit --py-files
    already shipped it), return that archive — walking a zip-internal path
    yields nothing and would overwrite the archive we are running from
    with an empty one."""
    pkg_root = os.path.dirname(os.path.abspath(__file__))
    if not os.path.isdir(pkg_root):
        container = pkg_root
        while container and not os.path.isfile(container):
            container = os.path.dirname(container)
        if container and zipfile.is_zipfile(container):
            return container
        raise RuntimeError(f"cannot locate package source at {pkg_root}")
    parent = os.path.dirname(pkg_root)
    out_path = out_path or os.path.join("/tmp", "osm2mp_spark.zip")
    entries = []
    for dirpath, dirnames, filenames in os.walk(pkg_root):
        dirnames.sort()
        if "__pycache__" in dirpath:
            continue
        for fn in sorted(filenames):
            if fn.endswith(".py"):
                full = os.path.join(dirpath, fn)
                entries.append((full, os.path.relpath(full, parent)))
    # write-then-rename: the default path is SHARED across sessions
    # (/tmp/osm2mp_spark.zip) — an in-place zipfile write lets a concurrent
    # session read a half-written archive (observed: 0-entry zip handed to
    # spark-submit). os.replace is atomic on one filesystem.
    tmp = f"{out_path}.{os.getpid()}.tmp"
    with zipfile.ZipFile(tmp, "w", zipfile.ZIP_DEFLATED) as zf:
        for full, rel in entries:
            info = zipfile.ZipInfo(rel, date_time=(2020, 1, 1, 0, 0, 0))
            with open(full, "rb") as f:
                zf.writestr(info, f.read())
    os.replace(tmp, out_path)
    return out_path


def ensure_shipped(spark) -> None:
    sc = spark.sparkContext
    if sc._jsc is None or getattr(sc, _FLAG, False):
        return
    sc.addPyFile(build_zip())
    setattr(sc, _FLAG, True)
