"""CLI / spark-submit entrypoint — the reference's ``check-datapackage
check <source>`` analog (ref cli.py:50-85, SURVEY §3.2).

    spark-submit --py-files engine.zip -m check_datapackage_spark.cli \
        --data /root/testdata/sf0.01 --table lineitem \
        --spec spec.json [--resource lineitem] \
        [--audit /path/ledger] [--strict] [--error] \
        [--exclude-type pattern] [--exclude-jsonpath '$.t[*].col']

Exit code = 1 when violations were found and --error is set
(ref check.py:288-289: error=True raises DataPackageError).
"""

from __future__ import annotations

import argparse
import os
import sys

from .issue import DataPackageError, explain, pretty_print
from .plans.validation import check_table
from .session import get_spark
from .sources.registry import load_table, parse_source, read_spec, write_violations
from .spec import (
    SEMVER_PATTERN,
    STRICT_NAME_PATTERN,
    CheckConfig,
    Exclusion,
    strict_spec_issues,
    validate_package,
)


def strictify(spec):
    """Strict profile — the full reference rule set
    (ref _set_should_fields_to_required, check.py:516-538):

    * every declared field promoted to required (SHOULD → REQUIRED)
    * ``name`` field: strict name pattern
    * ``version`` field: semver pattern (ref check.py:522-527)
    * ``contributors`` / ``sources`` fields: every item must have a
      ``title`` (ref check.py:533-534) — compiled via the jsonSchema
      ``items.required`` constraint, which routes on the physical type
      (array<struct> forall / JSON-string from_json)
    * the table name itself must match the strict name pattern (ref
      resources/items name pattern, check.py:535-537) — surfaced as a
      spec-level issue via :func:`~.spec.strict_spec_issues`, which
      check_table applies whenever ``config.strict`` is set.
    """
    from dataclasses import replace

    fields = []
    for f in spec.fields:
        c = f.constraints
        if f.name == "name" and c.pattern is None:
            c = replace(c, pattern=STRICT_NAME_PATTERN)
        if f.name == "version" and c.pattern is None:
            c = replace(c, pattern=SEMVER_PATTERN)
        if f.name in ("contributors", "sources"):
            js = dict(c.json_schema or {})
            items = dict(js.get("items") or {})
            req = list(items.get("required") or [])
            if "title" not in req:
                req.append("title")
            items["required"] = req
            js["items"] = items
            c = replace(c, json_schema=js)
        fields.append(replace(f, constraints=replace(c, required=True)))
    return replace(spec, fields=tuple(fields))




#: ref CUSTOM_CHECKS_CONFIG_ERROR (cli.py:20-23): CustomCheck requires a
#: Python callable and cannot come from TOML.
CUSTOM_CHECKS_CONFIG_ERROR = (
    "Custom checks cannot be configured in TOML because `check` must be "
    "a Python callable. Define CustomCheck extensions in Python instead."
)


def load_toml_config(path: str = ".cdp.toml") -> dict:
    """Bind run options from a ``.cdp.toml`` file (ref cli.py:40-47:
    ``setup_cli(config_name=".cdp.toml")``; tests/test_cli.py:60-120).

    Supported keys: ``strict`` (bool), ``[[exclusions]]`` tables
    (jsonpath/type), ``[extensions]`` with ``[[extensions.required_checks]]``
    tables; ``custom_checks`` in TOML is rejected exactly like the
    reference.
    """
    import tomllib

    if not os.path.exists(path):
        return {}
    with open(path, "rb") as f:
        doc = tomllib.load(f)
    out: dict = {}
    if "strict" in doc:
        out["strict"] = bool(doc["strict"])
    if "version" in doc:
        out["version"] = str(doc["version"])
    if "exclusions" in doc:
        out["exclusions"] = tuple(
            Exclusion(jsonpath=e.get("jsonpath"), type=e.get("type"))
            for e in doc["exclusions"]
        )
    ext = doc.get("extensions", {})
    if ext.get("custom_checks") is not None:
        raise ValueError(CUSTOM_CHECKS_CONFIG_ERROR)
    if ext.get("required_checks"):
        from .extensions import RequiredCheck

        out["extensions"] = tuple(
            RequiredCheck(
                column=rc.get("column"),
                jsonpath=rc.get("jsonpath"),
                message=rc.get("message"),
            )
            for rc in ext["required_checks"]
        )
    return out


def main(argv=None) -> int:
    p = argparse.ArgumentParser(prog="check-datapackage-spark")
    p.add_argument("--data", required=True, help="sf dir or iceberg:<catalog.db>")
    p.add_argument(
        "--table",
        default=None,
        help="resource to validate; omit to validate EVERY resource in "
        "the descriptor (package mode: cross-resource FK dims wired "
        "automatically, tables loaded once)",
    )
    p.add_argument("--spec", required=True, help="datapackage.json-shaped spec")
    p.add_argument("--resource", default=None)
    p.add_argument("--dims", nargs="*", default=[], help="dimension tables to load")
    p.add_argument("--audit", default=None, help="violations sink path")
    p.add_argument("--strict", action="store_true")
    p.add_argument(
        "--allow-remote",
        action="store_true",
        help="permit https:/github: spec sources (driver-side urllib fetch)",
    )
    p.add_argument(
        "--spec-version",
        choices=["v1", "v2"],
        default=None,  # None = not passed: fall back to TOML, then v2
        help="Data Package standard version to validate against "
        "(overrides the config file when passed explicitly)",
    )
    p.add_argument("--error", action="store_true")
    p.add_argument("--exclude-type", nargs="*", default=[])
    p.add_argument("--exclude-jsonpath", nargs="*", default=[])
    p.add_argument("--max-examples", type=int, default=None)
    p.add_argument("--cores", type=int, default=None)
    p.add_argument(
        "--resume-ledger",
        default=None,
        help="audit-ledger path: validate only (source,bucket) work units "
        "not yet recorded complete; append per-unit metrics on success",
    )
    p.add_argument("--n-buckets", type=int, default=64)
    p.add_argument("--bucket-key", default=None, help="key column for work-unit bucketing (default: first PK col)")
    p.add_argument(
        "--config",
        default=".cdp.toml",
        help="TOML config file (strict / [[exclusions]] / required checks)",
    )
    p.add_argument(
        "--tokens-structure",
        default=None,
        metavar="BOS,EOS,PAD,MAXID[,COLUMN]",
        help="append tokenized-sequence structure checks (BOS-first, "
        "EOS-last, no interior pad, in-vocab) on COLUMN "
        "(default: tokens)",
    )
    args = p.parse_args(argv)
    toml_cfg = load_toml_config(args.config)

    # only stop a session WE created: embedding main() in a host app
    # (or the test suite) must not kill the host's session
    from pyspark.sql import SparkSession

    pre_existing = SparkSession.getActiveSession() is not None
    spark = get_spark("cdp-cli", cores=args.cores)
    try:
        spec = read_spec(
            args.spec,
            resource=args.resource or args.table,
            allow_remote=args.allow_remote,
        )
        strict = args.strict or toml_cfg.get("strict", False)
        if strict:
            spec = strictify(spec)
        # explicit CLI flag wins over TOML (same precedence as --strict)
        version = args.spec_version or toml_cfg.get("version") or "v2"
        if version not in ("v1", "v2"):
            print(
                f"Invalid `version` in {args.config}: {version!r} "
                "(expected 'v1' or 'v2').",
                file=sys.stderr,
            )
            return 1
        config = CheckConfig(
            strict=strict,
            version=version,
            exclusions=tuple(
                [Exclusion(type=t) for t in args.exclude_type]
                + [Exclusion(jsonpath=j) for j in args.exclude_jsonpath]
            )
            + toml_cfg.get("exclusions", ()),
            extensions=toml_cfg.get("extensions", ()),
            max_examples_per_check=args.max_examples,
        )
        if args.table is None:
            # package mode: every resource, FK dims wired automatically
            import json as _json

            from .package import check_package

            with open(parse_source(args.spec)) as fh:
                _doc = _json.load(fh)
            pres = check_package(
                spark,
                _doc,
                config=config,
                loader=lambda s, n: load_table(s, args.data, n),
                spec_transform=strictify if strict else None,
            )
            all_issues = list(pres.descriptor_issues) + [
                i
                for r in pres.resources.values()
                for i in (r.spec_issues or [])
            ]
            if all_issues:
                pretty_print(
                    explain(all_issues, subject="datapackage.json"),
                    file=sys.stderr,
                )
            v = pres.violations()
            n = v.count() if v is not None else 0
            if args.audit and v is not None:
                write_violations(v, args.audit)
            for rname, r in pres.resources.items():
                print(f"== {rname}")
                r.summary.orderBy("check").show(100, truncate=False)
            if n == 0 and not all_issues:
                print("All checks passed!")  # ref cli.py:84
                return 0
            print(f"{n} violation row(s) found.", file=sys.stderr)
            if v is not None:
                v.show(20, truncate=False)
            return 1 if args.error else 0

        df = load_table(spark, args.data, args.table)
        extra = None
        if config.extensions:
            from .extensions import compile_extensions

            # schema-aware: jsonpath RequiredChecks expand their
            # wildcard/union/descent targets against the table schema
            extra = compile_extensions(config.extensions, schema=df.schema)
        if args.tokens_structure:
            from .operators.sequences import structure_checks

            parts = args.tokens_structure.split(",")
            if len(parts) not in (4, 5):
                raise SystemExit(
                    "--tokens-structure expects BOS,EOS,PAD,MAXID[,COLUMN]"
                )
            col = parts[4] if len(parts) == 5 else "tokens"
            extra = (extra or []) + structure_checks(
                col,
                bos=int(parts[0]),
                eos=int(parts[1]),
                pad=int(parts[2]),
                max_id=int(parts[3]),
            )
        dims = {d: load_table(spark, args.data, d) for d in args.dims}

        if args.resume_ledger:
            # checkpoint/resume: restrict to pending (source,bucket) units
            from .operators.audit import ResumableRun

            key = args.bucket_key or (spec.primary_key[0] if spec.primary_key else None)
            if key is None or "source" not in df.columns:
                raise SystemExit("--resume-ledger needs a bucket key and a 'source' column")
            run = ResumableRun(
                ledger_path=args.resume_ledger, n_buckets=args.n_buckets, key=key
            )
            holder = {}

            def _validate(pending):
                r = check_table(pending.drop("_bucket"), spec, config=config, dims=dims, extra_checks=extra)
                holder["res"] = r
                return r.violations, r

            violations, n_units = run.run(df, _validate)
            if n_units == 0:
                print("All work units already complete — nothing to do.")
                return 0
            res = holder["res"]
        else:
            res = check_table(df, spec, config=config, dims=dims, extra_checks=extra)

        # package-level G1/G2 adjudication (resource path/data oneOf,
        # path string-vs-array — ref check.py:616-680) on the raw
        # descriptor; only multi-resource descriptors have the package
        # shape (a bare resource doc is accepted as-is by read_spec)
        pkg_issues = []
        addr = parse_source(args.spec)
        if os.path.isfile(addr):
            import json as _json

            with open(addr) as fh:
                _doc = _json.load(fh)
            if "resources" in _doc:
                pkg_issues = validate_package(_doc)
        all_issues = pkg_issues + list(res.spec_issues or [])
        if all_issues:
            # pretty_print renders the [u]/[red] markup (rich when
            # available, stripped otherwise) instead of printing
            # literal tags (ADVICE r2)
            pretty_print(
                explain(all_issues, subject="datapackage.json"),
                file=sys.stderr,
            )
        n = res.violations.count()
        if args.audit:
            write_violations(res.violations, args.audit)
        res.summary.orderBy("check").show(100, truncate=False)
        if n == 0 and not all_issues:
            print("All checks passed!")  # ref cli.py:84
            return 0
        print(f"{n} violation row(s) found.", file=sys.stderr)
        res.violations.show(20, truncate=False)
        if args.error:
            raise DataPackageError(f"{n} violation row(s); see output above")
        return 0
    except DataPackageError:
        return 1
    finally:
        if not pre_existing:
            spark.stop()


if __name__ == "__main__":
    sys.exit(main())
