"""Build the --py-files dependency zip for spark-submit.

    python jobs/package.py        →  htmlps.zip (repo root)
"""

from __future__ import annotations

import os
import zipfile

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main():
    out = os.path.join(ROOT, "htmlps.zip")
    pkg = os.path.join(ROOT, "html_parser_spark")
    with zipfile.ZipFile(out, "w", zipfile.ZIP_DEFLATED) as z:
        for dirpath, _dirs, files in os.walk(pkg):
            if "__pycache__" in dirpath:
                continue
            for name in files:
                if name.endswith(".pyc"):
                    continue
                full = os.path.join(dirpath, name)
                z.write(full, os.path.relpath(full, ROOT))
    print(out)


if __name__ == "__main__":
    main()
