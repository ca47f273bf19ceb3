"""spark-submit launcher (SURVEY §3.2 equivalent):

    spark-submit --master ... --py-files engine.zip tools/submit_main.py \
        --data <path|iceberg:ref> --table <name> --spec datapackage.json \
        [--resume-ledger <audit path>] [--error] ...

The package arrives on executors via --py-files; this shim only
dispatches into check_datapackage_spark.cli.main.
"""

import sys

from check_datapackage_spark.cli import main

if __name__ == "__main__":
    sys.exit(main())
