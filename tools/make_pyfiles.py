"""Build the spark-submit --py-files artifact.

    python tools/make_pyfiles.py [out.zip]
    spark-submit --py-files cuda_selection_criteria_spark.zip \
        --master ... your_job.py

The zip contains only the package sources (no tests/tools); workers
need nothing else beyond the baked-in pyspark/numpy/pandas.
"""

from __future__ import annotations

import os
import sys
import zipfile

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PKG = "cuda_selection_criteria_spark"


def main() -> None:
    out = sys.argv[1] if len(sys.argv) > 1 else os.path.join(ROOT, f"{PKG}.zip")
    with zipfile.ZipFile(out, "w", zipfile.ZIP_DEFLATED) as zf:
        for dirpath, _dirs, files in os.walk(os.path.join(ROOT, PKG)):
            for fn in files:
                if fn.endswith(".py"):
                    full = os.path.join(dirpath, fn)
                    zf.write(full, os.path.relpath(full, ROOT))
    print(out)


if __name__ == "__main__":
    main()
