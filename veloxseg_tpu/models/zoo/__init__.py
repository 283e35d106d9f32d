"""Baseline model zoo (TPU-native re-implementations).

Each module re-implements one reference baseline's architecture
(channels-last, flax) and registers it under the reference's registry key
(``utils/load_model.py:10-88``).
"""

from . import basic_unet    # noqa: F401  UNet
from . import vnet          # noqa: F401  VNet
from . import mednext       # noqa: F401  MedNeXt
from . import slim_unetr    # noqa: F401  SlimUNETR
from . import superlightnet  # noqa: F401  SuperLightNet
from . import segformer3d   # noqa: F401  SegFormer
from . import unetr         # noqa: F401  UNETR
from . import urwkv         # noqa: F401  U-RWKV
from . import hdense        # noqa: F401  HDense
from . import ukan          # noqa: F401  U-KAN
from . import unetrpp       # noqa: F401  UNETRpp
from . import swin_unetr    # noqa: F401  SwinUNETR
from . import a2fseg        # noqa: F401  A2FSeg
from . import nestedformer  # noqa: F401  NestedFormer
from . import vsmtrans      # noqa: F401  VSmTrans
from . import hcma          # noqa: F401  HCMA-UNet
