"""Build dist/duke_spark.zip for `spark-submit --py-files` deployment
(BASELINE.json north_rule: "run via spark-submit --py-files").

Zip contains the duke_spark package only — jobs/*.py ship as the driver
script argument. Deterministic member order + zeroed timestamps so the
artifact is reproducible.
"""

from __future__ import annotations

import os
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def build(out_path: str | None = None) -> str:
    out_path = out_path or os.path.join(REPO, "dist", "duke_spark.zip")
    os.makedirs(os.path.dirname(out_path), exist_ok=True)
    members = []
    pkg_root = os.path.join(REPO, "duke_spark")
    for dirpath, _, files in os.walk(pkg_root):
        if "__pycache__" in dirpath:
            continue
        for fn in sorted(files):
            if fn.endswith(".py"):
                full = os.path.join(dirpath, fn)
                members.append((full, os.path.relpath(full, REPO)))
    members.sort(key=lambda m: m[1])
    with zipfile.ZipFile(out_path, "w", zipfile.ZIP_DEFLATED) as zf:
        for full, arc in members:
            info = zipfile.ZipInfo(arc, date_time=(1980, 1, 1, 0, 0, 0))
            info.external_attr = 0o644 << 16
            with open(full, "rb") as f:
                zf.writestr(info, f.read(), zipfile.ZIP_DEFLATED)
    return out_path


if __name__ == "__main__":
    print(build())
