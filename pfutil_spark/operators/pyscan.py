"""Python-native parquet scan fast path for the sketch partial stage.

Why this exists (round-6 optimization, guide §4 "the Python boundary"):
the partial stage is a ``mapInArrow`` whose input must cross JVM ->
Python. Measured on this host, that boundary costs ~1µs/row/task — a
consume-only ``mapInArrow`` over a 6M-row parquet scan takes the SAME
wall time as the full hash+accumulate pipeline (the kernel is free, the
transfer is everything). On top of that, parquet parallelism is
row-group-bound: a 126MB file with 6 row groups feeds at most 6 tasks
no matter how many splits Spark plans, so 26 of 32 local cores idle.

When the input plan is *exactly* a column projection over a local
parquet relation, none of that boundary is necessary: the Python workers
can read the parquet columns themselves (pyarrow, columnar, zero JVM
involvement), split work at row-group-slice granularity (finer than any
JVM scan can), and feed the identical kernel code. Measured: the
flagship-shape global count over 6M rows went 1.68s -> 0.61s with a
bit-identical estimate.

Scale honesty: this path is gated on total input size
(``pfutil.pyscan.maxInputBytes``, default cores x 128MB). Big inputs
already saturate the cluster through the normal JVM scan and fall back;
the fast path exists precisely for the small-file / few-row-group regime
where the JVM plan cannot reach the available parallelism. Detection is
conservative — any plan feature beyond Project(attrs | cast(int->string))
over a non-partitioned local parquet relation falls back to the JVM scan
(same results either way; sketch merges are partitioning-independent).
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field
from typing import Iterator

from pyspark.sql import DataFrame

# Spark typeName -> the Arrow type mapInArrow expects for that column.
# Conservative allowlist: anything else falls back to the JVM scan.
_PASSTHROUGH_TYPES = {
    "string": "string",
    "binary": "binary",
    "long": "int64",
    "integer": "int32",
    "short": "int16",
    "byte": "int8",
    "boolean": "bool",
    "date": "date32[day]",
}
# integral source types whose cast-to-string is engine-identical
# (decimal ASCII rendering; float/decimal/timestamp rendering is NOT
# guaranteed identical between Spark and Arrow, so they fall back)
_CASTABLE_TYPES = {"long", "integer", "short", "byte"}


@dataclass
class PyScanPlan:
    """Driver-side description of a python-native scan, shipped to tasks
    via closure capture. ``specs`` is the task list: (file_idx,
    row_group, slice_start, slice_len); a retried/speculated task
    re-reads exactly the same rows, so the scan is idempotent."""

    files: list[str]
    specs: list[tuple[int, int, int, int]]
    # output column name -> (parquet column name, cast_to_string)
    columns: dict[str, tuple[str, bool]]
    # output column name -> arrow type string mapInArrow expects
    arrow_types: dict[str, str]
    out_order: list[str] = field(default_factory=list)


def _strip_file_uri(uri: str) -> str | None:
    if uri.startswith("file:"):
        path = uri[5:]
        while path.startswith("//"):
            path = path[1:]
        return path
    if uri.startswith("/"):
        return uri
    return None  # remote FS — fall back to the JVM scan


def _max_input_bytes(spark) -> int:
    v = spark.conf.get("pfutil.pyscan.maxInputBytes", None)
    if v is not None:
        return int(v)
    return spark.sparkContext.defaultParallelism * (128 << 20)


def try_parquet_pyscan(pruned: DataFrame, out_cols: list[str]) -> PyScanPlan | None:
    """Return a :class:`PyScanPlan` when ``pruned``'s optimized plan is
    exactly ``Project(attr | alias(attr) | alias(cast(intattr as string)))``
    over one non-partitioned local parquet relation, else ``None``.

    Everything here is driver-side plan/footer metadata work; no job runs.
    """
    spark = pruned.sparkSession
    try:
        if len(set(out_cols)) != len(out_cols):
            return None  # duplicate output names: mapping is ambiguous
        if spark.conf.get("pfutil.pyscan.enabled", "true").lower() != "true":
            return None
        plan = pruned._jdf.queryExecution().optimizedPlan()
        cls = plan.getClass().getSimpleName()
        columns: dict[str, tuple[str, bool]] = {}
        if cls == "Project":
            exprs = plan.projectList()
            for i in range(exprs.size()):
                ne = exprs.apply(i)
                necls = ne.getClass().getSimpleName()
                if necls == "AttributeReference":
                    columns[ne.name()] = (ne.name(), False)
                elif necls == "Alias":
                    ch = ne.child()
                    ccls = ch.getClass().getSimpleName()
                    if ccls == "AttributeReference":
                        columns[ne.name()] = (ch.name(), False)
                    elif ccls == "Cast":
                        gc = ch.child()
                        if gc.getClass().getSimpleName() != "AttributeReference":
                            return None
                        if ch.dataType().typeName() != "string":
                            return None
                        if gc.dataType().typeName() not in _CASTABLE_TYPES:
                            return None
                        columns[ne.name()] = (gc.name(), True)
                    else:
                        return None
                else:
                    return None
            rel_node = plan.child()
        elif cls == "LogicalRelation":
            rel_node = plan
            for f in pruned.schema.fields:
                columns[f.name] = (f.name, False)
        else:
            return None
        if rel_node.getClass().getSimpleName() != "LogicalRelation":
            return None
        rel = rel_node.relation()
        if rel.getClass().getSimpleName() != "HadoopFsRelation":
            return None
        if rel.fileFormat().getClass().getSimpleName() != "ParquetFileFormat":
            return None
        if rel.partitionSchema().length() != 0:
            return None
        if set(columns) != set(out_cols):
            return None
        arrow_types: dict[str, str] = {}
        for f in pruned.schema.fields:
            cast = columns[f.name][1]
            tn = f.dataType.typeName()
            if cast:
                arrow_types[f.name] = "string"
            elif tn in _PASSTHROUGH_TYPES:
                arrow_types[f.name] = _PASSTHROUGH_TYPES[tn]
            else:
                return None
        if int(plan.stats().sizeInBytes()) > _max_input_bytes(spark):
            return None
        files = []
        for uri in rel.location().inputFiles():
            p = _strip_file_uri(uri)
            if p is None or not os.path.exists(p):
                return None
            files.append(p)
        if not files or len(files) > 512:
            return None
    except Exception:
        return None  # introspection must never break a query

    # plan tasks from footers: ~one slice per core, never splitting a
    # slice across row groups (each task decodes only its own row
    # group's needed column chunks)
    import pyarrow.parquet as pq

    target = int(
        spark.conf.get(
            "pfutil.pyscan.targetTasks", str(spark.sparkContext.defaultParallelism)
        )
    )
    src_cols = {src for src, _ in columns.values()}
    # codecs pyarrow decodes without extra plugins; anything else (LZO,
    # custom) must fall back to the JVM scan
    _OK_CODECS = {
        "UNCOMPRESSED", "SNAPPY", "GZIP", "ZSTD", "LZ4", "LZ4_RAW", "BROTLI"
    }
    rg_rows: list[tuple[int, int, int]] = []  # (file_idx, rg, rows)
    total_rows = 0
    try:
        for fi, path in enumerate(files):
            pf = pq.ParquetFile(path)
            # schema-evolved directories: a file missing one of the
            # needed columns would KeyError on the worker where the JVM
            # scan null-fills — only the JVM scan handles that correctly
            names = set(pf.schema_arrow.names)
            if not src_cols <= names:
                return None
            md = pf.metadata
            for rg in range(md.num_row_groups):
                rgm = md.row_group(rg)
                if rg == 0:  # codec is per column chunk; files uniform
                    for j in range(rgm.num_columns):
                        col = rgm.column(j)
                        if (
                            col.path_in_schema.split(".")[0] in src_cols
                            and col.compression not in _OK_CODECS
                        ):
                            return None
                r = rgm.num_rows
                rg_rows.append((fi, rg, r))
                total_rows += r
    except Exception:
        return None  # unreadable footer: the JVM scan decides its fate
    # floor on rows/task: splitting a row group means every task decodes
    # the whole group's column chunks and slices — measured at 100k-row
    # events, a 32-way oversplit LOSES 0.2s to duplicated decode + task
    # overhead while 8 tasks match the JVM scan; 65536 keeps tiny files
    # at a handful of tasks and million-row groups at full fan-out
    min_rows = int(spark.conf.get("pfutil.pyscan.minRowsPerTask", "65536"))
    specs: list[tuple[int, int, int, int]] = []
    rows_per_task = max(min_rows, -(-total_rows // max(1, target)))
    for fi, rg, rows in rg_rows:
        if rows == 0:
            continue
        n_slices = max(1, -(-rows // rows_per_task))
        step = -(-rows // n_slices)
        for s in range(0, rows, step):
            specs.append((fi, rg, s, min(step, rows - s)))
    if not specs:
        specs.append((0, -1, 0, 0))  # empty relation: one no-op task
    return PyScanPlan(
        files=files,
        specs=specs,
        columns=columns,
        arrow_types=arrow_types,
        out_order=list(out_cols),
    )


def task_frame(spark, plan: PyScanPlan) -> DataFrame:
    """One int64 row per task spec, one spec per partition."""
    return spark.range(0, len(plan.specs), 1, len(plan.specs))


def read_spec_batches(plan: PyScanPlan, id_batches) -> Iterator:
    """Worker-side: turn this task's spec ids into record batches shaped
    exactly like the JVM scan's mapInArrow input (same column names,
    same Arrow types), so the downstream kernel code is byte-for-byte
    the same code path."""
    import pyarrow as pa
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    ids: list[int] = []
    for b in id_batches:
        ids.extend(b.column("id").to_pylist())
    src_cols = sorted({src for src, _ in plan.columns.values()})
    open_files: dict[int, "pq.ParquetFile"] = {}
    for i in ids:
        fi, rg, start, length = plan.specs[i]
        if rg < 0:
            continue  # empty-relation no-op task
        f = open_files.get(fi)
        if f is None:
            f = open_files[fi] = pq.ParquetFile(plan.files[fi])
        tbl = f.read_row_group(rg, columns=src_cols)
        tbl = tbl.slice(start, length)
        arrays = []
        for name in plan.out_order:
            src, cast = plan.columns[name]
            arr = tbl.column(src).combine_chunks()
            want = pa.type_for_alias(plan.arrow_types[name])
            if cast or not arr.type.equals(want):
                arr = pc.cast(arr, want)
            arrays.append(arr)
        yield pa.record_batch(arrays, names=plan.out_order)
