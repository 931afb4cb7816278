"""``python -m etl_validator_github_spark`` → the CLI in cli.py."""

import sys

from etl_validator_github_spark.cli import main

sys.exit(main())
