"""Import-layout parity alias for the reference's ``biomedkg.data_module``."""

from .data.modules import (DPIModule, PrimeKGModule,  # noqa: F401
                           get_node_encode_method)
