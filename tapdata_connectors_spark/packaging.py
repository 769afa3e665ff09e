"""Build the `--py-files` artifact for cluster submission.

The north rule ships the job via `spark-submit --py-files`: the driver
and every executor import the engine from a zip on their PYTHONPATH
(zipimport), so the artifact must contain exactly the import-safe .py
files of the package — no __pycache__, no tests, no data. Reference
analog: each Tapdata connector ships as a fat jar built by its module
pom (e.g. connectors/mysql-connector/pom.xml); one zip of this package
is the PySpark equivalent of that deployable unit.

Zip entries are written in sorted order with a fixed timestamp so the
artifact is byte-deterministic for identical sources — the same
property the lake layer relies on for content-addressed manifests, and
what makes "which build is on the cluster?" answerable by checksum.
"""

from __future__ import annotations

import os
import zipfile

# fixed DOS timestamp (2020-01-01 00:00:00): zip format's epoch floor is
# 1980, and a constant keeps the artifact hash independent of build time
_FIXED_ZTIME = (2020, 1, 1, 0, 0, 0)


def build_pyfiles_zip(out_path: str, include_jobs: bool = False) -> str:
    """Zip the tapdata_connectors_spark package (and optionally jobs/)
    into `out_path`, suitable for `spark-submit --py-files`. Returns
    out_path. Deterministic: sorted entries, fixed timestamps, stored
    paths relative to the repo root so `import tapdata_connectors_spark`
    resolves from the zip."""
    pkg_root = os.path.dirname(os.path.abspath(__file__))
    repo_root = os.path.dirname(pkg_root)
    roots = [pkg_root]
    if include_jobs:
        jobs = os.path.join(repo_root, "jobs")
        if os.path.isdir(jobs):
            roots.append(jobs)
    entries: list[tuple[str, str]] = []
    for root in roots:
        for dirpath, dirnames, filenames in os.walk(root):
            dirnames[:] = sorted(d for d in dirnames if d != "__pycache__")
            for fn in sorted(filenames):
                if fn.endswith(".py"):
                    full = os.path.join(dirpath, fn)
                    entries.append((full, os.path.relpath(full, repo_root)))
    os.makedirs(os.path.dirname(os.path.abspath(out_path)), exist_ok=True)
    with zipfile.ZipFile(out_path, "w", zipfile.ZIP_DEFLATED) as zf:
        for full, arc in sorted(entries, key=lambda e: e[1]):
            with open(full, "rb") as f:
                data = f.read()
            info = zipfile.ZipInfo(arc, date_time=_FIXED_ZTIME)
            info.compress_type = zipfile.ZIP_DEFLATED
            info.external_attr = 0o644 << 16
            zf.writestr(info, data)
    return out_path
