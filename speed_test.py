#!/usr/bin/env python
"""Throughput benchmark entry (reference ``speed_test.py`` compatible)."""
from veloxseg_tpu.cli.speed_main import main

if __name__ == "__main__":
    main()
