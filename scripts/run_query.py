"""Run any registered query by name against a testdata dir.

    python scripts/run_query.py <name> [sf_dir] [--explain] [--rows N]

Prints the result sample (and optionally the formatted physical plan).
`python scripts/run_query.py --list` enumerates all registered names.
"""

from __future__ import annotations

import sys

sys.path.insert(0, ".")

from falcon_metrics_etl_spark.plans.registry import all_queries
from falcon_metrics_etl_spark.session import get_spark


def main() -> None:
    args = [a for a in sys.argv[1:]]
    if not args or args[0] == "--list":
        for name, q in sorted(all_queries().items()):
            print(f"{name:36s} {', '.join(q.tags)}")
        return
    name = args[0]
    sf_dir = next(
        (a for a in args[1:] if not a.startswith("--")), "/root/testdata/sf0.01"
    )
    n_rows = 20
    if "--rows" in args:
        n_rows = int(args[args.index("--rows") + 1])

    registry = all_queries()
    if name not in registry:
        sys.exit(f"unknown query {name!r} — try --list")
    spark = get_spark("run_query")
    df = registry[name].spark(spark, sf_dir)
    if "--explain" in args:
        df.explain("formatted")
    print(f"# {name}: {registry[name].doc}\n")
    df.show(n_rows, truncate=60)
    spark.stop()


if __name__ == "__main__":
    main()
