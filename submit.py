#!/usr/bin/env python3
"""spark-submit application file for the pulse_spark CLI.

spark-submit takes an application .py path (it has no `-m` module mode),
so cluster launches ship the library as a zip and this 4-line launcher
as the app:

    zip -r pulse_spark.zip pulse_spark
    spark-submit --py-files pulse_spark.zip \
        --conf spark.sql.adaptive.enabled=true \
        --conf spark.sql.shuffle.partitions=<2-3x total cores> \
        submit.py build --input <table-or-path> --output <index-dir>

The `--py-files` zip is distributed to every executor AND prepended to
the driver's sys.path, so `pulse_spark` resolves on both sides with no
install step (exercised end-to-end by tests/test_submit.py in a fresh
driver JVM).  In cluster deploy-mode, pass `--master none` semantics by
omitting the CLI's --master flag — the session builder then inherits
spark-submit's master instead of forcing local mode.
"""

import sys

from pulse_spark.cli import main

if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
