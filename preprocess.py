#!/usr/bin/env python
"""Offline preprocessing entry (ports of reference ``preprocess/``)."""
from veloxseg_tpu.cli.preprocess_main import main

if __name__ == "__main__":
    main()
