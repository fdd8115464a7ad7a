"""``python -m probe_spark`` / spark-submit application file."""

import sys

from probe_spark.cli import main

if __name__ == "__main__":
    sys.exit(main())
