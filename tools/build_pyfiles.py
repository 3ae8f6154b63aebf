"""Build the ``--py-files`` deployment zip for pfutil_spark.

The north rule requires the library to run via
``spark-submit --py-files`` on a multi-executor cluster: executors
import the package through zipimport, so the package must be zip-safe
(no import-time filesystem access — enforced by
``tests/test_pyfiles.py``, which imports the package from the zip in a
fresh interpreter with the repo root OFF sys.path, exactly the executor
situation).

The zip is reproducible for a given interpreter: entries are added in
sorted order with zeroed timestamps, so two builds from the same tree
are byte-identical (a stable artifact hash lets a cluster deploy
pipeline skip redundant uploads and lets lineage records pin the exact
code version a sketch table was produced with).

Usage::

    python tools/build_pyfiles.py [out.zip]      # default dist/pfutil_spark.zip
    spark-submit --py-files dist/pfutil_spark.zip your_job.py
"""

from __future__ import annotations

import hashlib
import os
import sys
import zipfile

_EXCLUDE_DIRS = {"__pycache__"}
_EXCLUDE_SUFFIXES = (".pyc", ".pyo")

# Fixed DOS timestamp (the zip format's epoch) => reproducible archives.
_EPOCH = (1980, 1, 1, 0, 0, 0)


def build_zip(out_path: str, package_root: str | None = None) -> str:
    """Write the deployment zip; returns the absolute output path.

    ``package_root`` is the directory CONTAINING ``pfutil_spark/``
    (defaults to the repo root, one level above this file).
    """
    if package_root is None:
        package_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    pkg_dir = os.path.join(package_root, "pfutil_spark")
    if not os.path.isdir(pkg_dir):
        raise FileNotFoundError(f"package dir not found: {pkg_dir}")

    members: list[tuple[str, str]] = []  # (arcname, abspath)
    for dirpath, dirnames, filenames in os.walk(pkg_dir):
        dirnames[:] = sorted(d for d in dirnames if d not in _EXCLUDE_DIRS)
        for fn in sorted(filenames):
            if fn.endswith(_EXCLUDE_SUFFIXES):
                continue
            ap = os.path.join(dirpath, fn)
            arc = os.path.relpath(ap, package_root)
            members.append((arc.replace(os.sep, "/"), ap))

    out_path = os.path.abspath(out_path)
    os.makedirs(os.path.dirname(out_path), exist_ok=True)
    tmp = out_path + ".tmp"
    with zipfile.ZipFile(tmp, "w", compression=zipfile.ZIP_DEFLATED) as zf:
        for arc, ap in members:
            with open(ap, "rb") as f:
                data = f.read()
            info = zipfile.ZipInfo(arc, date_time=_EPOCH)
            info.compress_type = zipfile.ZIP_DEFLATED
            info.external_attr = 0o644 << 16  # plain file, rw-r--r--
            zf.writestr(info, data)
    os.replace(tmp, out_path)
    return out_path


def sha256_file(path: str) -> str:
    h = hashlib.sha256()
    with open(path, "rb") as f:
        for chunk in iter(lambda: f.read(1 << 20), b""):
            h.update(chunk)
    return h.hexdigest()


def main(argv: list[str]) -> int:
    out = argv[1] if len(argv) > 1 else os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "dist",
        "pfutil_spark.zip",
    )
    path = build_zip(out)
    with zipfile.ZipFile(path) as zf:
        n = len(zf.namelist())
    print(f"{path}  entries={n}  sha256={sha256_file(path)}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv))
