#!/usr/bin/env python
"""Build the --py-files zip: dist/ai_service_ocr_grading_handler_spark.zip
(package sources only, no tests/bench)."""

from __future__ import annotations

import zipfile
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
PKG = "ai_service_ocr_grading_handler_spark"


def main() -> Path:
    dist = REPO / "dist"
    dist.mkdir(exist_ok=True)
    out = dist / f"{PKG}.zip"
    with zipfile.ZipFile(out, "w", zipfile.ZIP_DEFLATED) as z:
        for p in sorted((REPO / PKG).rglob("*.py")):
            z.write(p, p.relative_to(REPO))
    print(out)
    return out


if __name__ == "__main__":
    main()
