#!/usr/bin/env python
"""Inference entry point (reference ``run_test.py`` flag-compatible)."""
from veloxseg_tpu.cli.test_main import main

if __name__ == "__main__":
    main()
