#!/usr/bin/env python
"""Serving-export entry point (no reference analogue): serialize a
trained model to a self-contained StableHLO artifact."""
from veloxseg_tpu.cli.export_main import main

if __name__ == "__main__":
    main()
