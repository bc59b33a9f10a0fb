"""Build dist/searchgov_spider_spark.zip for spark-submit --py-files.

Only the library package goes into the archive (no tests, no tools); the
package is zipimport-safe (no __file__-relative resource loads), which is
what --py-files requires — executors and the driver import it straight
from the zip on sys.path.

Usage: python tools/package.py [out_zip]
"""

from __future__ import annotations

import sys
import zipfile
from pathlib import Path

PKG = "searchgov_spider_spark"


def build(out: str | None = None) -> str:
    root = Path(__file__).resolve().parent.parent
    out_path = Path(out) if out else root / "dist" / f"{PKG}.zip"
    out_path.parent.mkdir(parents=True, exist_ok=True)
    src = root / PKG
    with zipfile.ZipFile(out_path, "w", zipfile.ZIP_DEFLATED) as zf:
        for py in sorted(src.rglob("*.py")):
            if "__pycache__" in py.parts:
                continue
            zf.write(py, py.relative_to(root))
    return str(out_path)


if __name__ == "__main__":
    print(build(sys.argv[1] if len(sys.argv) > 1 else None))
