#!/usr/bin/env python
"""Build jsonschema_spark.zip for spark-submit --py-files deployment
(north rule: "spark-submit --py-files on multi-executor clusters")."""

from __future__ import annotations

import os
import sys
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def build(dest: str | None = None) -> str:
    dest = dest or os.path.join(REPO, "dist", "jsonschema_spark.zip")
    os.makedirs(os.path.dirname(dest), exist_ok=True)
    pkg = os.path.join(REPO, "jsonschema_spark")
    with zipfile.ZipFile(dest, "w", zipfile.ZIP_DEFLATED) as z:
        for root, _dirs, files in os.walk(pkg):
            if "__pycache__" in root:
                continue
            for name in sorted(files):
                if not name.endswith(".py"):
                    continue
                full = os.path.join(root, name)
                z.write(full, os.path.relpath(full, REPO))
    return dest


if __name__ == "__main__":
    out = build(sys.argv[1] if len(sys.argv) > 1 else None)
    print(out)
