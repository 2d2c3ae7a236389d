"""spark-submit entrypoint for the CLI (north_rule: "launched via
spark-submit --py-files on multi-executor clusters").

Package the library and submit — the session factory detects the
launcher-configured master (yarn / k8s / standalone) and does NOT override
it with local mode; all other engine conf (AQE, Arrow, zstd, shuffle
sizing) still applies:

    zip -r /tmp/lash_spark.zip lash_spark
    spark-submit --master yarn --deploy-mode client \
        --py-files /tmp/lash_spark.zip \
        --conf spark.sql.shuffle.partitions=4096 \
        tools/submit_cli.py pipeline --input s3://.../documents --output ...

Cluster sizing (the N vs 4N executor criterion) is then
`--num-executors N` vs `--num-executors 4N` on the same input; in this
sandbox the stand-in evidence is `python bench.py --scaling`
(BENCH/BASELINE.md).
"""

import os
import sys

# direct `python tools/submit_cli.py` runs (no --py-files): repo root on path
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from lash_spark.cli import main  # noqa: E402

if __name__ == "__main__":
    main()
