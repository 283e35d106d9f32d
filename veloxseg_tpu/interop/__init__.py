"""Interop with reference (PyTorch) checkpoints.

- :mod:`torch_import` — map a reference ``.pth`` state dict onto this
  package's flax parameter tree (used by inference to load
  reference-trained weights, and by the numerical parity tests).
- :mod:`monai_stub` / :mod:`ref_model` — import the reference torch model
  for parity testing without a MONAI installation.
"""

from .torch_import import (convert_state_dict, import_torch_checkpoint,
                           load_torch_state_dict)

__all__ = ["convert_state_dict", "import_torch_checkpoint",
           "load_torch_state_dict"]
