"""Build the spark-submit artifact: a --py-files zip of the package.

north_rule: "packaged for spark-submit --py-files". Usage:

    python scripts/package.py                     # → dist/nvtabular_spark.zip
    spark-submit --py-files dist/nvtabular_spark.zip \
        scripts/run_pipeline.py --input ... --output ...
"""
import os
import sys
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def build(out_path=None):
    out_path = out_path or os.path.join(REPO, "dist", "nvtabular_spark.zip")
    os.makedirs(os.path.dirname(out_path), exist_ok=True)
    pkg = os.path.join(REPO, "nvtabular_spark")
    with zipfile.ZipFile(out_path, "w", zipfile.ZIP_DEFLATED) as zf:
        for root, _dirs, files in os.walk(pkg):
            if "__pycache__" in root:
                continue
            for f in files:
                if f.endswith(".py"):
                    full = os.path.join(root, f)
                    rel = os.path.relpath(full, REPO)
                    zf.write(full, rel)
    return out_path


if __name__ == "__main__":
    p = build(sys.argv[1] if len(sys.argv) > 1 else None)
    print(p)
