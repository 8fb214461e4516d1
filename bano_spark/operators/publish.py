"""S17 publish stage: per-département gzip artifacts + full-France
concatenation (ref bano/publish.py:41-86).

Spark-first layout: the per-dept files are written in ONE distributed
text write — `repartition(dept)` puts each département in exactly one
task, `sortWithinPartitions(dept, order)` fixes the line order inside
each file, `partitionBy(dept)` + gzip codec emits one compressed file
per dept. The driver then only *renames* files to the reference's
`bano-{dept}.{kind}.gz` names — no data moves through the driver.

The full-France file reproduces `publish_as_full_csv/json`
(publish.py:53-57, 69-73): the reference gzips the byte concatenation
of the per-dept files in sorted filename order. We concatenate the
per-dept .gz files directly — gzip is multi-member, so the result is a
valid .gz whose DECOMPRESSED bytes equal the reference's, while the
"build full France" step stays O(file count) driver work regardless of
data volume.
"""

from __future__ import annotations

import glob
import gzip
import os
import shutil

from pyspark.sql import DataFrame


def write_dept_files(lines: DataFrame, out_dir: str, kind: str,
                     dept_col: str = "dept", order_col: str = "line") -> list[str]:
    """Write one `bano-{dept}.{kind}.gz` per département. `lines` must
    have exactly (dept_col, order_col) and a NON-NULL dept (a null key
    would surface as a __HIVE_DEFAULT_PARTITION__ artifact file).
    Returns the dept codes written."""
    staging = os.path.join(out_dir, f"_staging_{kind}")
    (
        lines.repartition(lines[dept_col])
        .sortWithinPartitions(dept_col, order_col)
        .write.partitionBy(dept_col)
        .option("compression", "gzip")
        .mode("overwrite")
        .text(staging)
    )
    depts = []
    for d in sorted(glob.glob(os.path.join(staging, f"{dept_col}=*"))):
        dept = os.path.basename(d).split("=", 1)[1]
        parts = sorted(glob.glob(os.path.join(d, "part-*.txt.gz")))
        # repartition(dept) => exactly one partition holds this dept
        assert len(parts) == 1, f"{dept}: {len(parts)} part files"
        os.replace(parts[0], os.path.join(out_dir, f"bano-{dept}.{kind}.gz"))
        depts.append(dept)
    shutil.rmtree(staging)
    return depts


def publish_full(out_dir: str, kind: str) -> str:
    """Concatenate `bano-*.{kind}.gz` in sorted order into
    `full.{kind}.gz` (multi-member gzip == reference's gzip of the
    concatenated plain files, byte-equal after decompression)."""
    dest = os.path.join(out_dir, f"full.{kind}.gz")
    with open(dest, "wb") as full:
        for part in sorted(glob.glob(os.path.join(out_dir, f"bano-*.{kind}.gz"))):
            with open(part, "rb") as f:
                shutil.copyfileobj(f, full)
    return dest


def read_full_lines(path: str) -> list[bytes]:
    """Decompressed lines of a published full file (test/oracle hook)."""
    with gzip.open(path, "rb") as f:
        return f.read().splitlines()
