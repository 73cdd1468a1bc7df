"""Build dist/context_crawler_spark.zip for ``spark-submit --py-files``."""

from __future__ import annotations

import os
import zipfile

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> str:
    out_dir = os.path.join(ROOT, "dist")
    os.makedirs(out_dir, exist_ok=True)
    out = os.path.join(out_dir, "context_crawler_spark.zip")
    pkg = os.path.join(ROOT, "context_crawler_spark")
    with zipfile.ZipFile(out, "w", zipfile.ZIP_DEFLATED) as zf:
        for base, _dirs, files in os.walk(pkg):
            if "__pycache__" in base:
                continue
            for f in files:
                if f.endswith(".py"):
                    p = os.path.join(base, f)
                    zf.write(p, os.path.relpath(p, ROOT))
    print(out)
    return out


if __name__ == "__main__":
    main()
