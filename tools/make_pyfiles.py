"""Package the engine for `spark-submit --py-files` (north-rule launch
mode): one zip of the pure-Python package, importable on driver and
executors without any cwd assumption."""
from __future__ import annotations

import os
import sys
import zipfile

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PKG = "efficient_graph_algorithms_spark"


def main(out: str = "dist/ega.zip") -> str:
    out = os.path.join(ROOT, out)
    os.makedirs(os.path.dirname(out), exist_ok=True)
    with zipfile.ZipFile(out, "w", zipfile.ZIP_DEFLATED) as z:
        for dirpath, _dirs, files in sorted(os.walk(os.path.join(ROOT, PKG))):
            for f in sorted(files):
                if f.endswith(".py"):
                    p = os.path.join(dirpath, f)
                    z.write(p, os.path.relpath(p, ROOT))
    return out


if __name__ == "__main__":
    print(main(*sys.argv[1:]))
