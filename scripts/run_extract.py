#!/usr/bin/env python
"""spark-submit entry script (lives outside the package so the script dir on
sys.path never shadows anything):

    spark-submit --master <cluster> \\
        --py-files dist/docling_parse_spark.zip \\
        scripts/run_extract.py --input <docs parquet> --out <dir> [--resume]
"""

import sys

from docling_parse_spark.job import main

if __name__ == "__main__":
    sys.exit(main())
