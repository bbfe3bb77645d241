"""spark-submit job entry (analog of the reference CLI, cli.py:115-241).

    spark-submit --py-files docproc_spark.zip docproc_spark/job.py \
        --input  /data/documents_spans.parquet \
        --output /data/extracted \
        --lineage /data/extracted_lineage \
        --n-parts 256

Arguments are tables/locations, not files — the per-document CLI of the
reference becomes a partition-parallel batch job with checkpoint/resume.
"""

from __future__ import annotations

import argparse
import json
import sys


# default engine config written by --init-config (reference cli.py:22-72
# writes ~/.config/docproc/docproc.yml; here the engine yaml)
DEFAULT_CONFIG_YAML = """\
# docproc_spark engine configuration
ingest:
  drop_exact_duplicates: true
  drop_boilerplate: true
  use_vision: false
  use_llm_refine: false
spark:
  arrow_batch: 32768
"""


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(prog="docproc-spark", description=__doc__)
    p.add_argument("--input", help="input span-table parquet path")
    p.add_argument("--output", help="output table path")
    p.add_argument("--lineage", default=None, help="lineage table path (enables resume)")
    p.add_argument("--n-parts", type=int, default=8, help="checkpoint buckets")
    p.add_argument("--config", default=None, help="engine config yaml")
    p.add_argument("--master", default=None, help="override spark master")
    p.add_argument(
        "--init-config",
        default=None,
        metavar="PATH",
        help="write a default engine config yaml to PATH and exit",
    )
    p.add_argument(
        "--completions",
        default=None,
        choices=("bash", "zsh"),
        help="print a shell completion script and exit",
    )
    return p


def render_completions(parser: argparse.ArgumentParser, shell: str) -> str:
    """Static completion script generated from the parser's own options
    (reference cli.py:94-112 does this through shtab, which is not in
    this environment — the flag surface is introspected the same way;
    path-valued flags complete filenames)."""
    opts = sorted(
        s for a in parser._actions for s in a.option_strings if s.startswith("--")
    )
    words = " ".join(opts)
    prog = parser.prog
    fn = f"_{prog.replace('-', '_')}_complete"
    if shell == "zsh":
        specs = " ".join(f"'{o}[{o.lstrip('-')}]:value:_files'" for o in opts)
        return (
            f"#compdef {prog}\n"
            f"{fn}() {{ _arguments -s {specs} }}\n"
            f"compdef {fn} {prog}\n"
        )
    return (
        f"{fn}() {{\n"
        f'  local cur="${{COMP_WORDS[COMP_CWORD]}}"\n'
        f'  if [[ "$cur" == -* ]]; then\n'
        f'    COMPREPLY=( $(compgen -W "{words}" -- "$cur") )\n'
        f"  else\n"
        f'    COMPREPLY=( $(compgen -f -- "$cur") )\n'
        f"  fi\n"
        f"}}\n"
        f"complete -F {fn} {prog}\n"
    )


def main(argv: list[str] | None = None) -> int:
    parser = build_parser()
    args = parser.parse_args(argv)
    if args.completions:
        print(render_completions(parser, args.completions))
        return 0
    if args.init_config:
        import os

        os.makedirs(os.path.dirname(os.path.abspath(args.init_config)), exist_ok=True)
        with open(args.init_config, "w") as fh:
            fh.write(DEFAULT_CONFIG_YAML)
        print(json.dumps({"mode": "init-config", "path": args.init_config}))
        return 0
    if not args.input or not args.output:
        parser.error("--input and --output are required (unless --init-config)")
    from docproc_spark.config import parse_config
    from docproc_spark.facade import DocprocSpark
    from docproc_spark.session import get_spark

    cfg = parse_config(args.config)
    if args.master:
        cfg.spark.master = args.master
    from pyspark.sql import SparkSession

    preexisting = SparkSession.getActiveSession() is not None
    spark = get_spark(
        master=cfg.spark.master,
        shuffle_partitions=cfg.spark.shuffle_partitions,
        arrow_batch=cfg.spark.arrow_batch,
    )
    eng = DocprocSpark(spark=spark, config=cfg)
    docs = spark.read.parquet(args.input)

    docs, quarantined = eng.split_supported(docs)
    # write unconditionally and count the WRITTEN table: a pre-write
    # count() forced a full input scan just to decide whether to write,
    # then the write scanned again; counting parquet output is a footer
    # read. An empty quarantine dir is also a more deterministic contract
    # than a sometimes-missing one.
    qpath = args.output + "_quarantine"
    quarantined.write.mode("overwrite").parquet(qpath)
    n_quarantined = spark.read.parquet(qpath).count()

    if args.lineage:
        processed = eng.extract_resumable(docs, args.output, args.lineage, args.n_parts)
        summary = {"mode": "resumable", "buckets_processed": processed}
    else:
        eng.extract_table(docs).write.mode("overwrite").parquet(args.output)
        summary = {"mode": "oneshot"}
    summary["quarantined"] = n_quarantined

    print(json.dumps(summary))
    if not preexisting:
        spark.stop()  # only stop a session this job created
    return 0


if __name__ == "__main__":
    # self-locate when run as a plain script (spark-submit ships the package
    # via --py-files; direct `python docproc_spark/job.py` needs the parent)
    import os

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    sys.exit(main())
