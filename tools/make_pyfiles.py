"""Build dist/manga_ocr_spark.zip for spark-submit --py-files.

Pure-python package, no native deps beyond pandas/pyarrow (provided by the
cluster image) — the whole engine ships as one small zip.
"""

from __future__ import annotations

import zipfile
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent


def build(out: Path | None = None) -> Path:
    out = out or REPO / "dist" / "manga_ocr_spark.zip"
    out.parent.mkdir(exist_ok=True)
    with zipfile.ZipFile(out, "w", zipfile.ZIP_DEFLATED) as z:
        for py in sorted((REPO / "manga_ocr_spark").rglob("*.py")):
            if "__pycache__" in py.parts:
                continue
            z.write(py, py.relative_to(REPO))
    return out


if __name__ == "__main__":
    print(build())
