#!/usr/bin/env python
"""Console wrapper for solaris_spark.cli.geotransform_footprints_main — run with
python or spark-submit (mirrors the reference 'geotransform_footprints' entry point,
/root/reference/setup.py:116-124)."""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from solaris_spark.cli import geotransform_footprints_main

if __name__ == "__main__":
    geotransform_footprints_main()
