"""Package the engine for `spark-submit --py-files`.

Produces dist/whitebox_tools_spark.zip containing the package +
__spark_entry__.py. Submit example (cluster or local):

    spark-submit --py-files dist/whitebox_tools_spark.zip \
        scripts/submit_job.py --sf-dir /root/testdata/sf0.01
"""

from __future__ import annotations

import os
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> str:
    dist = os.path.join(REPO, "dist")
    os.makedirs(dist, exist_ok=True)
    out = os.path.join(dist, "whitebox_tools_spark.zip")
    with zipfile.ZipFile(out, "w", zipfile.ZIP_DEFLATED) as z:
        for root, _dirs, files in os.walk(os.path.join(REPO, "whitebox_tools_spark")):
            if "__pycache__" in root:
                continue
            for f in files:
                if f.endswith(".py"):
                    p = os.path.join(root, f)
                    z.write(p, os.path.relpath(p, REPO))
        z.write(os.path.join(REPO, "__spark_entry__.py"), "__spark_entry__.py")
    print(out)
    return out


if __name__ == "__main__":
    main()
