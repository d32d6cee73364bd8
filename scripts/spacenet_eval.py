#!/usr/bin/env python
"""Console wrapper for solaris_spark.cli.spacenet_eval_main — run with
python or spark-submit (mirrors the reference 'spacenet_eval' entry point,
/root/reference/setup.py:116-124)."""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from solaris_spark.cli import spacenet_eval_main

if __name__ == "__main__":
    spacenet_eval_main()
