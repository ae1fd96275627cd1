"""Build dist/rad_ecg_spark.zip for spark-submit --py-files."""

from __future__ import annotations

import os
import zipfile


def main() -> str:
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    pkg = os.path.join(root, "rad_ecg_spark")
    os.makedirs(os.path.join(root, "dist"), exist_ok=True)
    zpath = os.path.join(root, "dist", "rad_ecg_spark.zip")
    with zipfile.ZipFile(zpath, "w", zipfile.ZIP_DEFLATED) as zf:
        for dirpath, _dirs, files in os.walk(pkg):
            for f in sorted(files):
                if f.endswith(".py"):
                    full = os.path.join(dirpath, f)
                    zf.write(full, os.path.relpath(full, root))
    print(zpath)
    return zpath


if __name__ == "__main__":
    main()
