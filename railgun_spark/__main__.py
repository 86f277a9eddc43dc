"""`python -m railgun_spark` entry point."""

import sys

from railgun_spark.cli import main

sys.exit(main())
