#!/usr/bin/env python
"""Cross-dataset generalization inference (reference inference_extern_mri)."""
from veloxseg_tpu.cli.extern_main import main

if __name__ == "__main__":
    main()
