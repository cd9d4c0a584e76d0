"""CLI surface mirroring the reference (E1/E2/S3/S7, main.rs:18-137).

Usage:
    python -m tabular_to_parquet_spark.cli <file.csv>
    cat file.csv | python -m tabular_to_parquet_spark.cli -

Output path: ``<dir>/<stem>.parquet`` next to the input
(main.rs:122-137); stdin → ``stdin.parquet`` in the CWD (main.rs:51).
"""

from __future__ import annotations

import argparse
import pathlib
import sys
import tempfile


def derive_output_path(input_path: str) -> str:
    """construire_chemin_sortie_parquet (main.rs:122-137)."""
    p = pathlib.Path(input_path)
    return str((p.parent if p.parent != pathlib.Path("") else pathlib.Path(".")) / f"{p.stem}.parquet")


def spool_stdin_to_tempfile() -> str:
    """ecrire_stdin_dans_fichier_temporaire (main.rs:102-120):
    drain stdin to a kept temp file; empty stdin is an error."""
    data = sys.stdin.buffer.read()
    if not data:
        raise SystemExit("error: empty stdin")
    fh = tempfile.NamedTemporaryFile(prefix="tabular_stdin_", delete=False)
    fh.write(data)
    fh.close()
    return fh.name


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(
        prog="tabular_to_parquet_spark",
        description="Convert a delimited tabular file (CSV/TSV/…) to Parquet",
    )
    ap.add_argument("input", nargs="?", help="input file, or '-' for stdin")
    ap.add_argument(
        "--infer-full-schema",
        "--inferer-schema-complet",  # the reference's spelling (main.rs:25-26)
        action="store_true",
        help="infer types from the whole file instead of the first 1000 rows "
        "(reference --inferer-schema-complet, main.rs:25-26)",
    )
    ap.add_argument(
        "--single-file",
        action="store_true",
        help="write ONE parquet file (reference parity); default is a "
        "standard Spark parquet directory",
    )
    ap.add_argument(
        "--preserve-order",
        action="store_true",
        help="preserve input row order in the output (reference parity, "
        "conversion.rs:177-189)",
    )
    ap.add_argument(
        "--strict-drop",
        action="store_true",
        help="drop rows containing invalid UTF-8 instead of repairing "
        "them (reference parity, conversion.rs:208 / analyse.rs:42-61)",
    )
    ap.add_argument("--output", help="override the derived output path")
    ap.add_argument(
        "--format",
        choices=["delimited", "jsonl", "orc", "avro", "ipc", "fixed-width",
                 "logfmt", "xml", "warc", "tar", "xlsx"],
        default="delimited",
        help="input wire format (default: delimited text with sniffed "
        "delimiter); every format runs the same inference + lenient-cast "
        "pipeline",
    )
    ap.add_argument(
        "--fixed-width-spec",
        help="comma-separated name:width pairs for --format fixed-width, "
        "e.g. 'id:6,name:20,price:10'",
    )
    args = ap.parse_args(argv)

    if not args.input:
        ap.print_help()
        print("\nerror: no input provided", file=sys.stderr)
        return 1

    if args.input == "-":
        if sys.stdin.isatty():
            ap.print_help()
            print("\nerror: stdin requested ('-') but nothing is piped", file=sys.stderr)
            return 1
        input_path = spool_stdin_to_tempfile()
        output_path = args.output or "stdin.parquet"
    else:
        input_path = args.input
        output_path = args.output or derive_output_path(args.input)

    from tabular_to_parquet_spark.operators.convert import convert_delimited_to_parquet
    from tabular_to_parquet_spark.session import get_spark

    spark = get_spark("tabular_to_parquet_cli")
    if args.format != "delimited":
        return _convert_other_format(spark, args, input_path, output_path)
    res = convert_delimited_to_parquet(
        spark,
        input_path,
        output_path,
        infer_full=args.infer_full_schema,
        preserve_order=args.preserve_order,
        single_file=args.single_file,
        strict_drop=args.strict_drop,
    )
    schema_desc = ", ".join(
        f"{n}:{t.kind}{'[' + t.unit + ']' if t.unit else ''}"
        for n, t in zip(res.columns, res.types)
    )
    print(f"schema: {schema_desc}", file=sys.stderr)
    # exit banner (reference conversion.rs:101-117): rows, throughput,
    # and per-column parse-error accounting (O5)
    n_err = sum(res.parse_errors.values())
    if n_err:
        worst = {k: v for k, v in res.parse_errors.items() if v}
        print(f"parse errors (value → NULL): {n_err} across {worst}", file=sys.stderr)
    rate = res.rows / res.seconds if res.seconds > 0 else 0.0
    print(
        f"conversion done: {res.rows} rows in {res.seconds:.2f}s "
        f"({rate:,.0f} lines/s): {res.output_path}",
        file=sys.stderr,
    )
    return 0


def _convert_other_format(spark, args, input_path: str, output_path: str) -> int:
    """Non-delimited wire formats — same inference + casts, one flag."""
    if args.preserve_order:
        # the reference's input-order guarantee is defined over
        # delimited text lines (conversion.rs:177-189); pretending it
        # holds for container formats would be a silent lie — refuse
        # rather than ignore (r10: the flag used to be dropped here)
        print(
            "error: --preserve-order is only supported for delimited "
            "input; row order for container formats is not part of the "
            "reference contract",
            file=sys.stderr,
        )
        return 1
    if args.format == "jsonl":
        from tabular_to_parquet_spark.sources.json_lines import (
            convert_json_to_parquet,
        )

        names, types, _ = convert_json_to_parquet(
            spark, input_path, output_path, infer_full=args.infer_full_schema
        )
    elif args.format in ("orc", "avro", "ipc"):
        from tabular_to_parquet_spark.sources.columnar import (
            convert_columnar_to_parquet,
        )

        names, types, _rows = convert_columnar_to_parquet(
            spark, input_path, output_path, fmt=args.format
        )
    elif args.format == "fixed-width":
        if not args.fixed_width_spec:
            print("error: --format fixed-width requires --fixed-width-spec",
                  file=sys.stderr)
            return 1
        from tabular_to_parquet_spark.sources.fixed_width import (
            convert_fixed_width_to_parquet,
            fields_from_widths,
        )

        pairs = []
        for part in args.fixed_width_spec.split(","):
            name, _, width = part.partition(":")
            pairs.append((name.strip(), int(width)))
        names, types, _ = convert_fixed_width_to_parquet(
            spark, input_path, output_path, fields_from_widths(pairs),
            infer_full=args.infer_full_schema,
        )
    elif args.format == "xlsx":
        from tabular_to_parquet_spark.sources.xlsx_source import (
            convert_xlsx_to_parquet,
        )

        names, types, _ = convert_xlsx_to_parquet(
            spark, input_path, output_path,
            infer_full=args.infer_full_schema,
        )
    elif args.format == "tar":
        from tabular_to_parquet_spark.sources.tar_source import (
            convert_tar_csv_to_parquet,
        )

        names, types, _ = convert_tar_csv_to_parquet(
            spark, input_path, output_path,
            infer_full=args.infer_full_schema,
        )
    elif args.format == "warc":
        from tabular_to_parquet_spark.sources.warc import (
            convert_warc_to_parquet,
        )

        names, types, _rows = convert_warc_to_parquet(
            spark, input_path, output_path
        )
    elif args.format == "xml":
        from tabular_to_parquet_spark.sources.xml_source import (
            convert_xml_to_parquet,
        )

        names, types, _ = convert_xml_to_parquet(
            spark, input_path, output_path, infer_full=args.infer_full_schema
        )
    else:  # logfmt
        from tabular_to_parquet_spark.sources.logfmt import (
            convert_logfmt_to_parquet,
        )

        names, types, _ = convert_logfmt_to_parquet(
            spark, input_path, output_path, infer_full=args.infer_full_schema
        )
    if types is not None:
        schema_desc = ", ".join(
            f"{n}:{t.kind}{'[' + t.unit + ']' if t.unit else ''}"
            for n, t in zip(names, types)
        )
    else:
        schema_desc = ", ".join(names) + " (typed passthrough)"
    if args.single_file:
        # same one-file contract as the delimited path (S7): coalesce
        # the written directory into a single part and promote it to
        # output_path itself. A consolidation pass (read-back +
        # rewrite) keeps every converter untouched; --single-file is
        # inherently a small-output convenience — the one-part write
        # is single-threaded regardless of where the coalesce happens.
        from tabular_to_parquet_spark.operators.convert import (
            _promote_single_file,
        )

        tmp = output_path + "._spark_tmp"
        (
            spark.read.parquet(output_path)
            .coalesce(1)
            .write.mode("overwrite")
            .option("compression", "zstd")
            .parquet(tmp)
        )
        import shutil

        shutil.rmtree(output_path)
        _promote_single_file(tmp, output_path)
    print(f"schema: {schema_desc}", file=sys.stderr)
    print(f"conversion done: {output_path}", file=sys.stderr)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
