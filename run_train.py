#!/usr/bin/env python
"""Training entry point (reference ``run_train.py`` flag-compatible)."""
from veloxseg_tpu.cli.train_main import main

if __name__ == "__main__":
    main()
