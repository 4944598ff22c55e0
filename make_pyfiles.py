#!/usr/bin/env python
"""Package the engine for spark-submit --py-files.

    python make_pyfiles.py          # writes dist/engine.zip
    spark-submit --py-files dist/engine.zip run_extract.py --input ... --output ...
"""

from __future__ import annotations

import os
import zipfile

HERE = os.path.dirname(os.path.abspath(__file__))


def main() -> str:
    dist = os.path.join(HERE, "dist")
    os.makedirs(dist, exist_ok=True)
    out = os.path.join(dist, "engine.zip")
    with zipfile.ZipFile(out, "w", zipfile.ZIP_DEFLATED) as z:
        for root, _dirs, files in os.walk(os.path.join(HERE, "engine")):
            if "__pycache__" in root:
                continue
            for f in files:
                if f.endswith(".py"):
                    p = os.path.join(root, f)
                    z.write(p, os.path.relpath(p, HERE))
    print(out)
    return out


if __name__ == "__main__":
    main()
