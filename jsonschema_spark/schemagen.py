"""schemagen CLI — generate JSON Schemas from typed Spark data sources.

Reference analogue: cmd/schemagen (main.go flag surface, generator.go) walks
Go packages and generates schemas from struct tags. The host type system
here is Spark SQL, so the CLI derives a draft 2020-12 schema from parquet
FOOTERS — file schema plus per-row-group null-count statistics — via
`struct_schema.schema_from_struct`. No data is scanned and no JVM is
started: footer metadata is enough for types, nullability, and observed
null counts, which is what makes the tool usable against warehouse-scale
tables (reading one footer per file, not 100 TB of pages).

Usage:
    python -m jsonschema_spark.schemagen [flags] INPUT [INPUT...]

Each INPUT is a parquet file or a directory of part files (one merged
schema per directory; part files must agree on the arrow schema).

Flags (mirroring cmd/schemagen where they translate):
    -o/--out PATH      explicit output file (single input only)
    --suffix S         output suffix, default ".schema.json"
    --id URI           stamp $id
    --dialect URI      stamp $schema (default draft 2020-12)
    --no-infer-required
                       required[] from arrow nullability only; by default a
                       field is also required when footer statistics prove
                       zero observed nulls in every row group
    --dry-run          print schemas to stdout, write nothing
    --force            overwrite existing outputs
    --verbose          progress to stderr
"""

from __future__ import annotations

import argparse
import json
import os
import sys
from typing import Any

DEFAULT_DIALECT = "https://json-schema.org/draft/2020-12/schema"


def _parquet_parts(path: str) -> list[str]:
    if os.path.isfile(path):
        return [path]
    parts = sorted(
        os.path.join(path, f)
        for f in os.listdir(path)
        if f.endswith(".parquet") and not f.startswith(("_", "."))
    )
    if not parts:
        raise FileNotFoundError(f"no parquet part files under {path}")
    return parts


def _observed_null_free(parts: list[str]) -> set[str]:
    """Top-level columns whose footer statistics prove zero nulls in every
    row group of every part file. Columns lacking statistics anywhere are
    excluded (absence of evidence is not evidence of absence)."""
    import pyarrow.parquet as pq

    null_free: set[str] | None = None
    for p in parts:
        md = pq.ParquetFile(p).metadata
        seen: set[str] = set()
        bad: set[str] = set()
        for rg in range(md.num_row_groups):
            row_group = md.row_group(rg)
            for i in range(row_group.num_columns):
                col = row_group.column(i)
                st = col.statistics
                name = col.path_in_schema.split(".", 1)[0]
                seen.add(name)
                if st is None or st.null_count is None or st.null_count > 0:
                    bad.add(name)
        ok = seen - bad
        null_free = ok if null_free is None else (null_free & ok)
    return null_free or set()


def generate_schema(
    path: str,
    *,
    dialect: str = DEFAULT_DIALECT,
    schema_id: str | None = None,
    infer_required: bool = True,
) -> dict[str, Any]:
    """JSON Schema for the rows of a parquet file/directory (footer-only)."""
    import pyarrow.parquet as pq

    from pyspark.sql.pandas.types import from_arrow_schema

    from jsonschema_spark.struct_schema import schema_from_struct

    parts = _parquet_parts(path)
    arrow = pq.ParquetFile(parts[0]).schema_arrow
    for p in parts[1:]:
        other = pq.ParquetFile(p).schema_arrow
        if not arrow.equals(other):
            raise ValueError(f"part schema mismatch: {parts[0]} vs {p}")
    schema = schema_from_struct(from_arrow_schema(arrow))
    if infer_required:
        required = set(schema.get("required", [])) | _observed_null_free(parts)
        ordered = [f for f in schema["properties"] if f in required]
        if ordered:
            schema["required"] = ordered
        else:
            schema.pop("required", None)
    out: dict[str, Any] = {"$schema": dialect}
    if schema_id:
        out["$id"] = schema_id
    out.update(schema)
    return out


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(
        prog="schemagen", description="Generate JSON Schemas from parquet footers"
    )
    ap.add_argument("inputs", nargs="+", help="parquet files or directories")
    ap.add_argument("-o", "--out", help="output file (single input only)")
    ap.add_argument("--suffix", default=".schema.json")
    ap.add_argument("--id", dest="schema_id")
    ap.add_argument("--dialect", default=DEFAULT_DIALECT)
    ap.add_argument("--no-infer-required", action="store_true")
    ap.add_argument("--dry-run", action="store_true")
    ap.add_argument("--force", action="store_true")
    ap.add_argument("--verbose", action="store_true")
    args = ap.parse_args(argv)

    if args.out and len(args.inputs) > 1:
        ap.error("--out is only valid with a single input")

    rc = 0
    for inp in args.inputs:
        try:
            schema = generate_schema(
                inp,
                dialect=args.dialect,
                schema_id=args.schema_id,
                infer_required=not args.no_infer_required,
            )
        except (OSError, ValueError) as exc:
            print(f"schemagen: {inp}: {exc}", file=sys.stderr)
            rc = 1
            continue
        text = json.dumps(schema, indent=2, ensure_ascii=False) + "\n"
        if args.dry_run:
            sys.stdout.write(text)
            continue
        dest = args.out or (inp.rstrip("/").removesuffix(".parquet") + args.suffix)
        if os.path.exists(dest) and not args.force:
            with open(dest, encoding="utf-8") as fh:
                if fh.read() == text:
                    if args.verbose:
                        print(f"schemagen: {dest} up to date", file=sys.stderr)
                    continue
            print(f"schemagen: {dest} exists (use --force)", file=sys.stderr)
            rc = 1
            continue
        with open(dest, "w", encoding="utf-8") as fh:
            fh.write(text)
        if args.verbose:
            print(f"schemagen: wrote {dest}", file=sys.stderr)
    return rc


if __name__ == "__main__":
    sys.exit(main())
