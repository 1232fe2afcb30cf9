"""Build dist/ccspark.zip for ``spark-submit --py-files`` — the
multi-executor deployment path (north rule). The zip contains the package
plus the driver contract module so a cluster job can
``from simplecommoncrawlextractor_spark import ...`` on every executor."""

from __future__ import annotations

import os
import zipfile

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def build(out: str | None = None) -> str:
    out = out or os.path.join(ROOT, "dist", "ccspark.zip")
    os.makedirs(os.path.dirname(out), exist_ok=True)
    pkg = os.path.join(ROOT, "simplecommoncrawlextractor_spark")
    with zipfile.ZipFile(out, "w", zipfile.ZIP_DEFLATED) as z:
        for dirpath, _dirnames, filenames in os.walk(pkg):
            if "__pycache__" in dirpath:
                continue
            for fn in filenames:
                if fn.endswith(".py"):
                    full = os.path.join(dirpath, fn)
                    z.write(full, os.path.relpath(full, ROOT))
        z.write(os.path.join(ROOT, "__spark_entry__.py"), "__spark_entry__.py")
    return out


if __name__ == "__main__":
    print(build())
